// Native multithreaded batch image decoder — the TPU-host data loader
// (reference: nerfstudio's ParallelDataManager worker pool + PIL decode,
// data/utils/dataloaders.py:405-592; here a C++ thread pool decoding
// JPEG (libjpeg) / PNG (libpng) straight into one preallocated uint8
// (N, H, W, C) numpy buffer, with optional integer box-downscale).
//
// CPython C API only (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <mutex>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Image {
  std::vector<uint8_t> data;
  int w = 0, h = 0, c = 0;
};

// -------- JPEG ------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *err = "jpeg decode error: " + path;
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// -------- PNG -------------------------------------------------------------

bool decode_png(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *err = "png decode error: " + path;
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  int c = png_get_channels(png, info);
  out->w = w;
  out->h = h;
  out->c = c;
  out->data.resize(size_t(w) * h * c);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out->data.data() + size_t(y) * w * c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// -------- downscale + write into the batch buffer ---------------------------

void box_downscale_into(const Image& img, uint8_t* dst, int dw, int dh, int dc, int factor) {
  // box filter over factor x factor blocks; channel pad/truncate to dc
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      for (int ch = 0; ch < dc; ++ch) {
        uint32_t acc = 0, cnt = 0;
        bool have = ch < img.c;
        for (int dy = 0; dy < factor; ++dy) {
          int sy = y * factor + dy;
          if (sy >= img.h) break;
          for (int dx = 0; dx < factor; ++dx) {
            int sx = x * factor + dx;
            if (sx >= img.w) break;
            acc += have ? img.data[(size_t(sy) * img.w + sx) * img.c + ch] : 255;
            ++cnt;
          }
        }
        dst[(size_t(y) * dw + x) * dc + ch] = cnt ? uint8_t(acc / cnt) : 0;
      }
    }
  }
}

// -------- python binding -----------------------------------------------------

// decode_batch(filenames: list[str], buffer: writable bytes-like of size
//              N*H*W*C, height, width, channels, downscale, num_threads) -> None
PyObject* decode_batch(PyObject*, PyObject* args) {
  PyObject* file_list;
  Py_buffer buf;
  int H, W, C, factor, num_threads;
  if (!PyArg_ParseTuple(args, "Ow*iiiii", &file_list, &buf, &H, &W, &C, &factor,
                        &num_threads))
    return nullptr;

  Py_ssize_t n = PySequence_Length(file_list);
  std::vector<std::string> paths(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_GetItem(file_list, i);
    PyObject* str = PyObject_Str(item);
    paths[i] = PyUnicode_AsUTF8(str);
    Py_DECREF(str);
    Py_DECREF(item);
  }
  if ((Py_ssize_t)buf.len < (Py_ssize_t)n * H * W * C) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "buffer too small");
    return nullptr;
  }
  uint8_t* out = static_cast<uint8_t*>(buf.buf);

  std::atomic<Py_ssize_t> next(0);
  std::atomic<bool> failed(false);
  std::string first_err;
  std::mutex err_mu;

  auto worker = [&]() {
    while (true) {
      Py_ssize_t i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      Image img;
      std::string err;
      const std::string& p = paths[i];
      bool ok;
      bool is_png = p.size() >= 4 && (p.compare(p.size() - 4, 4, ".png") == 0 ||
                                      p.compare(p.size() - 4, 4, ".PNG") == 0);
      ok = is_png ? decode_png(p, &img, &err) : decode_jpeg(p, &img, &err);
      if (!ok) {
        std::lock_guard<std::mutex> g(err_mu);
        if (!failed.exchange(true)) first_err = err;
        return;
      }
      uint8_t* dst = out + size_t(i) * H * W * C;
      if (factor == 1 && img.w == W && img.h == H && img.c == C) {
        std::memcpy(dst, img.data.data(), size_t(H) * W * C);
      } else if (factor == 1 && img.w == W && img.h == H) {
        for (size_t px = 0; px < size_t(H) * W; ++px)
          for (int ch = 0; ch < C; ++ch)
            dst[px * C + ch] = ch < img.c ? img.data[px * img.c + ch] : 255;
      } else {
        box_downscale_into(img, dst, W, H, C, factor);
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : (int)std::thread::hardware_concurrency();
  Py_BEGIN_ALLOW_THREADS;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&buf);
  if (failed.load()) {
    PyErr_SetString(PyExc_RuntimeError, first_err.c_str());
    return nullptr;
  }
  Py_RETURN_NONE;
}

// image_size(path) -> (h, w, c) without full decode (header only)
PyObject* image_size(PyObject*, PyObject* args) {
  const char* path_c;
  if (!PyArg_ParseTuple(args, "s", &path_c)) return nullptr;
  std::string p(path_c);
  bool is_png = p.size() >= 4 && (p.compare(p.size() - 4, 4, ".png") == 0 ||
                                  p.compare(p.size() - 4, 4, ".PNG") == 0);
  if (is_png) {
    FILE* f = fopen(p.c_str(), "rb");
    if (!f) {
      PyErr_SetString(PyExc_IOError, "cannot open");
      return nullptr;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      PyErr_SetString(PyExc_RuntimeError, "png header error");
      return nullptr;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    int c = png_get_channels(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return Py_BuildValue("(iii)", h, w, c);
  }
  Image img;
  std::string err;
  FILE* f = fopen(p.c_str(), "rb");
  if (!f) {
    PyErr_SetString(PyExc_IOError, "cannot open");
    return nullptr;
  }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    PyErr_SetString(PyExc_RuntimeError, "jpeg header error");
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  int h = cinfo.image_height, w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return Py_BuildValue("(iii)", h, w, 3);
}

PyMethodDef methods[] = {
    {"decode_batch", decode_batch, METH_VARARGS,
     "decode_batch(files, buffer, H, W, C, downscale, threads)"},
    {"image_size", image_size, METH_VARARGS, "image_size(path) -> (h, w, c)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native_loader",
                      "native batch image decoder", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_loader(void) { return PyModule_Create(&module); }
