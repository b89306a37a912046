"""``nst-download-data`` — dataset downloaders (reference
scripts/downloads/download_data.py:41-557).

TPU-host implementation without gdown/tyro: plain urllib with a Google-Drive
confirm-token flow and zip/tar extraction. Dataset IDs/URLs are the public
locations the reference publishes.

Usage:
    nst-download-data blender [--save-dir data]
    nst-download-data nerfstudio --capture-name dozer [--save-dir data]
    nst-download-data dnerf | phototourism --capture-name trevi-fountain
    nst-download-data sdfstudio --dataset-name sdfstudio-demo-data
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tarfile
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path
from typing import Dict, Optional

# public Google-Drive file ids of the nerfstudio captures (reference :106-131)
NERFSTUDIO_CAPTURES: Dict[str, str] = {
    "bww_entrance": "1ylkRHtfB3n3IRLf2wplpfxzPTq7nES9I",
    "campanile": "13aOfGJRRH05pOOk9ikYGTwqFc2L1xskU",
    "desolation": "14IzOOQm9KBJ3kPbunQbUTHPnXnmZus-f",
    "library": "1Hjbh_-BuaWETQExn2x2qGD74UwrFugHx",
    "poster": "1FceQ5DX7bbTbHeL26t0x6ku56cwsRs6t",
    "redwoods2": "1rg-4NoXT8p6vkmbWxMOY6PSG4j3rfcJ8",
    "storefront": "16b792AguPZWDA_YC4igKCwXJqW0Tb21o",
    "vegetation": "1wBhLQ2odycrtU39y2akVurXEAt9SsVI3",
    "Egypt": "1YktD85afw7uitC3nPamusk0vcBdAfjlF",
    "person": "1HsGMwkPu-R7oU7ySMdoo6Eppq8pKhHF3",
    "kitchen": "1IRmNyNZSNFidyj93Tt5DtaEU9h6eJdi1",
    "plane": "1tnv2NC2Iwz4XRYNtziUWvLJjObkZNo2D",
    "dozer": "1jQJPz5PhzTH--LOcCxvfzV_SDLEp1de3",
    "floating-tree": "1mVEHcO2ep13WPx92IPDvdQg66vLQwFSy",
    "aspen": "1X1PQcji_QpxGfMxbETKMeK8aOnWCkuSB",
    "stump": "1yZFAAEvtw2hs4MXrrkvhVAzEliLLXPB7",
    "sculpture": "1CUU_k0Et2gysuBn_R5qenDMfYXEhNsd1",
    "Giannini-Hall": "1UkjWXLN4qybq_a-j81FsTKghiXw39O8E",
}
BLENDER_FILE_ID = "18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG"
RECORD3D_CAPTURES = {"bear": "1WRZohWMRj0nNlYFIEBwkddDoGPvLTzkR"}
SITCOMS3D_FILE_ID = "1sgKr0ZO7BQC0FYinAnRSxobIWNucAST5"
DNERF_URL = "https://www.dropbox.com/s/raw/0bf6fl0ye2vz3vr/data.zip"
PHOTOTOURISM = {
    name: f"https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/{f}.tar.gz"
    for name, f in [
        ("brandenburg-gate", "brandenburg_gate"),
        ("buckingham-palace", "buckingham_palace"),
        ("colosseum-exterior", "colosseum_exterior"),
        ("grand-palace-brussels", "grand_place_brussels"),
        ("notre-dame-facade", "notre_dame_front_facade"),
        ("westminster-palace", "palace_of_westminster"),
        ("pantheon-exterior", "pantheon_exterior"),
        ("taj-mahal", "taj_mahal"),
        ("temple-nara", "temple_nara_japan"),
        ("trevi-fountain", "trevi_fountain"),
    ]
}
SDFSTUDIO = {
    name: f"https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/{f}"
    for name, f in [
        ("sdfstudio-demo-data", "sdfstudio-demo-data.tar"),
        ("dtu", "DTU.tar"),
        ("replica", "Replica.tar"),
        ("scannet", "scannet.tar"),
        ("tanks-and-temple", "tnt_advanced.tar"),
        ("tanks-and-temple-highres", "highresTNT.tar"),
    ]
}
MIPNERF360_URL = "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip"


def _fetch(url: str, dest: Path, desc: str = "") -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    print(f"downloading {desc or url} -> {dest}")

    def hook(n, bs, total):
        if total > 0 and n % 64 == 0:
            sys.stdout.write(f"\r  {n * bs / 1e6:.1f}/{total / 1e6:.1f} MB")
            sys.stdout.flush()

    urllib.request.urlretrieve(url, dest, reporthook=hook)
    print()


def _fetch_gdrive(file_id: str, dest: Path) -> None:
    """Google Drive fetch handling the large-file confirm token."""
    base = "https://drive.usercontent.google.com/download"
    url = f"{base}?{urllib.parse.urlencode({'id': file_id, 'export': 'download', 'confirm': 't'})}"
    _fetch(url, dest, desc=f"gdrive:{file_id}")


def _extract(archive: Path, target: Path) -> None:
    target.mkdir(parents=True, exist_ok=True)
    print(f"extracting {archive} -> {target}")
    if archive.suffix == ".zip" or zipfile.is_zipfile(archive):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(target)
    else:
        with tarfile.open(archive) as tf:
            tf.extractall(target)
    archive.unlink()


def download_blender(save_dir: Path, **_) -> None:
    tmp = save_dir / "blender_data.zip"
    _fetch_gdrive(BLENDER_FILE_ID, tmp)
    _extract(tmp, save_dir)
    src, dst = save_dir / "nerf_synthetic", save_dir / "blender"
    if src.exists():
        if dst.exists():
            shutil.rmtree(dst)
        src.rename(dst)


def download_nerfstudio(save_dir: Path, capture_name: str = "dozer", **_) -> None:
    names = list(NERFSTUDIO_CAPTURES) if capture_name == "all" else [capture_name]
    for name in names:
        fid = NERFSTUDIO_CAPTURES[name]
        tmp = save_dir / "nerfstudio" / f".temp_{name}.zip"
        _fetch_gdrive(fid, tmp)
        _extract(tmp, save_dir / "nerfstudio" / name)


def download_record3d(save_dir: Path, capture_name: str = "bear", **_) -> None:
    tmp = save_dir / "record3d" / f".temp_{capture_name}.zip"
    _fetch_gdrive(RECORD3D_CAPTURES[capture_name], tmp)
    _extract(tmp, save_dir / "record3d" / capture_name)


def download_sitcoms3d(save_dir: Path, **_) -> None:
    tmp = save_dir / "sitcoms3d.zip"
    _fetch_gdrive(SITCOMS3D_FILE_ID, tmp)
    _extract(tmp, save_dir)


def download_dnerf(save_dir: Path, **_) -> None:
    tmp = save_dir / "dnerf_data.zip"
    _fetch(DNERF_URL, tmp)
    _extract(tmp, save_dir / "dnerf")


def download_phototourism(save_dir: Path, capture_name: str = "trevi-fountain", **_) -> None:
    tmp = save_dir / "phototourism" / f"{capture_name}.tar.gz"
    _fetch(PHOTOTOURISM[capture_name], tmp)
    _extract(tmp, save_dir / "phototourism")


def download_sdfstudio(save_dir: Path, dataset_name: str = "sdfstudio-demo-data", **_) -> None:
    tmp = save_dir / "sdfstudio" / f"{dataset_name}.tar"
    _fetch(SDFSTUDIO[dataset_name], tmp)
    _extract(tmp, save_dir / "sdfstudio")


def download_mipnerf360(save_dir: Path, **_) -> None:
    tmp = save_dir / "360_v2.zip"
    _fetch(MIPNERF360_URL, tmp)
    _extract(tmp, save_dir / "mipnerf360")


DOWNLOADERS = {
    "blender": download_blender,
    "nerfstudio": download_nerfstudio,
    "record3d": download_record3d,
    "sitcoms3d": download_sitcoms3d,
    "dnerf": download_dnerf,
    "phototourism": download_phototourism,
    "sdfstudio": download_sdfstudio,
    "mipnerf360": download_mipnerf360,
}


def entrypoint(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser("nst-download-data", description=__doc__)
    ap.add_argument("dataset", choices=sorted(DOWNLOADERS))
    ap.add_argument("--save-dir", type=Path, default=Path("data"))
    ap.add_argument("--capture-name", type=str, default=None)
    ap.add_argument("--dataset-name", type=str, default=None)
    args = ap.parse_args(argv)
    kwargs = {}
    if args.capture_name:
        kwargs["capture_name"] = args.capture_name
    if args.dataset_name:
        kwargs["dataset_name"] = args.dataset_name
    DOWNLOADERS[args.dataset](args.save_dir, **kwargs)


if __name__ == "__main__":
    entrypoint()
