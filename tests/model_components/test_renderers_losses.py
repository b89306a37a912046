"""Renderer / loss / collider tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.data.scene_box import SceneBox
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    lossfun_distortion,
    mse_loss,
    orientation_loss,
    tv_loss,
)
from nerfstudio_tpu.model_components.ray_samplers import UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import (
    AABBBoxCollider,
    NearFarCollider,
    SphereCollider,
)


def _bundle(n=4):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3)),
        pixel_area=jnp.ones((n, 1)),
        nears=jnp.full((n, 1), 0.5),
        fars=jnp.full((n, 1), 4.0),
    )


def test_rgb_renderer_backgrounds():
    rgb = jnp.ones((4, 8, 3)) * 0.5
    w = jnp.zeros((4, 8, 1))  # fully transparent
    out_white = renderers.render_rgb(rgb, w, background_color="white")
    assert jnp.allclose(out_white, 1.0)
    out_black = renderers.render_rgb(rgb, w, background_color="black")
    assert jnp.allclose(out_black, 0.0)
    out_last = renderers.render_rgb(rgb, w, background_color="last_sample")
    assert jnp.allclose(out_last, 0.5)
    out_rand = renderers.render_rgb(rgb, w, background_color="random", key=jax.random.PRNGKey(0))
    assert out_rand.shape == (4, 3)


def test_background_override_context():
    rgb = jnp.ones((4, 8, 3)) * 0.5
    w = jnp.zeros((4, 8, 1))
    with renderers.background_color_override_context(jnp.array([1.0, 0.0, 0.0])):
        out = renderers.render_rgb(rgb, w, background_color="white")
    assert jnp.allclose(out, jnp.array([1.0, 0.0, 0.0]))


def test_depth_renderers():
    rb = _bundle()
    rs = UniformSampler(num_samples=16)(rb)
    # all weight on sample 8
    w = jnp.zeros((4, 16, 1)).at[:, 8].set(1.0)
    d_med = renderers.render_depth(w, rs, method="median")
    d_exp = renderers.render_depth(w, rs, method="expected")
    mid8 = float((rs.frustums.starts[0, 8, 0] + rs.frustums.ends[0, 8, 0]) / 2)
    assert jnp.allclose(d_med, mid8, atol=1e-5)
    assert jnp.allclose(d_exp, mid8, atol=1e-4)


def test_accumulation_and_normals():
    w = jnp.full((4, 8, 1), 0.05)
    acc = renderers.render_accumulation(w)
    assert jnp.allclose(acc, 0.4, atol=1e-5)
    normals = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (4, 8, 3))
    n = renderers.render_normals(normals, w)
    assert jnp.allclose(jnp.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_interlevel_and_distortion_losses():
    rb = _bundle(n=3)
    fine = UniformSampler(num_samples=16)(rb)
    coarse = UniformSampler(num_samples=8)(rb)
    w_fine = jnp.full((3, 16, 1), 1.0 / 16)
    w_coarse = jnp.full((3, 8, 1), 1.0 / 8)
    il = interlevel_loss([w_coarse, w_fine], [coarse, fine])
    assert jnp.isfinite(il)
    # uniform proposal exactly bounds uniform fine -> loss ~ 0
    assert float(il) < 1e-4
    dl = distortion_loss([w_coarse, w_fine], [coarse, fine])
    assert jnp.isfinite(dl) and float(dl) > 0
    # concentrated histogram has lower distortion than uniform
    t = jnp.linspace(0, 1, 17)[None].repeat(3, 0)
    w_conc = jnp.zeros((3, 16)).at[:, 8].set(1.0)
    w_unif = jnp.full((3, 16), 1.0 / 16)
    assert float(lossfun_distortion(t, w_conc).mean()) < float(lossfun_distortion(t, w_unif).mean())


def test_orientation_loss():
    w = jnp.ones((4, 8, 1))
    view_dirs = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (4, 3))
    # normals facing back toward camera (-z): no penalty
    n_good = jnp.broadcast_to(jnp.array([0.0, 0, -1.0]), (4, 8, 3))
    assert float(orientation_loss(w, n_good, view_dirs).sum()) < 1e-6
    # normals facing away: penalized
    n_bad = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (4, 8, 3))
    assert float(orientation_loss(w, n_bad, view_dirs).sum()) > 1.0


def test_colliders():
    rb = RayBundle(
        origins=jnp.array([[0.0, 0, -5]]),
        directions=jnp.array([[0.0, 0, 1.0]]),
        pixel_area=jnp.ones((1, 1)),
    )
    out = NearFarCollider(near_plane=1.0, far_plane=9.0)(rb)
    assert float(out.nears[0, 0]) == 1.0 and float(out.fars[0, 0]) == 9.0

    box = SceneBox(aabb=jnp.array([[-1.0, -1, -1], [1.0, 1, 1]]))
    out = AABBBoxCollider(scene_box=box)(rb)
    assert jnp.allclose(out.nears[0, 0], 4.0, atol=1e-4)
    assert jnp.allclose(out.fars[0, 0], 6.0, atol=1e-4)

    out = SphereCollider(center=jnp.zeros(3), radius=1.0)(rb)
    assert jnp.allclose(out.nears[0, 0], 4.0, atol=1e-4)
    assert jnp.allclose(out.fars[0, 0], 6.0, atol=1e-4)


def test_tv_and_mse():
    assert float(mse_loss(jnp.ones(4), jnp.zeros(4))) == 1.0
    g = jnp.zeros((2, 4, 4))
    assert float(tv_loss(g)) == 0.0
    g2 = jnp.arange(32, dtype=jnp.float32).reshape(2, 4, 4)
    assert float(tv_loss(g2)) > 0
