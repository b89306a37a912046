"""3DGS rasterizer + splatfacto tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.models.splatfacto import (
    SplatfactoModel,
    SplatfactoModelConfig,
    init_gaussian_params,
)
from nerfstudio_tpu.ops.gsplat.projection import (
    compute_cov3d,
    get_viewmat,
    project_gaussians,
    quat_to_rotmat,
)
from nerfstudio_tpu.ops.gsplat.rasterize import rasterize


def _dense_reference(means2d, conics, colors, opac, depths, valid, W, H):
    """O(N*P) reference rasterizer: per-pixel loop over all gaussians sorted
    by depth."""
    order = np.argsort(np.asarray(depths))
    img = np.zeros((H, W, 3))
    acc = np.zeros((H, W))
    T = np.ones((H, W))
    ys, xs = np.mgrid[0:H, 0:W]
    px = xs + 0.5
    py = ys + 0.5
    for g in order:
        if not valid[g]:
            continue
        dx = px - means2d[g, 0]
        dy = py - means2d[g, 1]
        a, b, c = conics[g]
        sigma = 0.5 * (a * dx**2 + c * dy**2) + b * dx * dy
        alpha = np.minimum(0.999, opac[g] * np.exp(-sigma))
        alpha = np.where((sigma >= 0) & (alpha > 1 / 255), alpha, 0.0)
        w = alpha * T
        img += w[..., None] * colors[g]
        acc += w
        T *= 1 - alpha
    return img, acc


def test_quat_to_rotmat():
    # identity quat
    R = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    assert jnp.allclose(R[0], jnp.eye(3), atol=1e-6)
    # 90 deg about z: w=cos(45), z=sin(45)
    s = float(np.sin(np.pi / 4))
    R = quat_to_rotmat(jnp.array([[s, 0, 0, s]]))
    assert jnp.allclose(R[0] @ jnp.array([1.0, 0, 0]), jnp.array([0.0, 1, 0]), atol=1e-5)


def test_cov3d():
    cov = compute_cov3d(jnp.array([[2.0, 1.0, 0.5]]), jnp.array([[1.0, 0, 0, 0]]))
    assert jnp.allclose(cov[0], jnp.diag(jnp.array([4.0, 1.0, 0.25])), atol=1e-5)


def test_projection_center():
    # gaussian at z=-5 on optical axis, identity OpenGL camera
    c2w = jnp.eye(4)[:3]
    viewmat = get_viewmat(c2w)
    means = jnp.array([[0.0, 0, -5.0]])
    means2d, depths, conics, radii, valid, comp = project_gaussians(
        means, jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]),
        viewmat, 100.0, 100.0, 32.0, 32.0, 64, 64,
    )
    assert bool(valid[0])
    assert jnp.allclose(means2d[0], jnp.array([32.0, 32.0]), atol=1e-4)
    assert jnp.allclose(depths[0], 5.0, atol=1e-5)
    assert float(radii[0]) > 0


def test_rasterize_matches_dense_reference():
    rng = np.random.default_rng(0)
    N, W, H = 40, 48, 32
    means2d = rng.uniform(0, [W, H], (N, 2)).astype(np.float32)
    # isotropic-ish conics
    inv_var = rng.uniform(0.05, 0.3, N).astype(np.float32)
    conics = np.stack([inv_var, np.zeros(N, np.float32), inv_var], -1)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, N).astype(np.float32)
    depths = rng.uniform(1, 10, N).astype(np.float32)
    radii = (3.0 / np.sqrt(inv_var)).astype(np.float32)
    valid = np.ones(N, bool)

    rgb, alpha, _ = rasterize(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opac), jnp.asarray(depths), jnp.asarray(radii), jnp.asarray(valid),
        width=W, height=H, tiles_per_gauss=36, max_per_tile=64, tile_chunk=2,
    )
    ref_img, ref_acc = _dense_reference(means2d, conics, colors, opac, depths, valid, W, H)
    assert np.allclose(np.asarray(rgb), ref_img, atol=2e-2), (
        np.abs(np.asarray(rgb) - ref_img).max()
    )
    assert np.allclose(np.asarray(alpha)[..., 0], ref_acc, atol=2e-2)


def test_rasterize_gradients():
    """Gradients flow to every input."""
    N, W, H = 8, 32, 32
    rng = np.random.default_rng(1)
    means2d = jnp.asarray(rng.uniform(4, 28, (N, 2)).astype(np.float32))
    conics = jnp.broadcast_to(jnp.array([0.1, 0.0, 0.1]), (N, 3))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.full((N,), 0.8)
    depths = jnp.asarray(rng.uniform(1, 5, N).astype(np.float32))
    radii = jnp.full((N,), 10.0)
    valid = jnp.ones((N,), bool)

    def loss(means2d, colors, opac):
        rgb, _, _ = rasterize(
            means2d, conics, colors, opac, depths, radii, valid,
            width=W, height=H, tiles_per_gauss=16, max_per_tile=16, tile_chunk=2,
        )
        return jnp.sum(rgb**2)

    g_m, g_c, g_o = jax.grad(loss, argnums=(0, 1, 2))(means2d, colors, opac)
    assert float(jnp.abs(g_m).sum()) > 0
    assert float(jnp.abs(g_c).sum()) > 0
    assert float(jnp.abs(g_o).sum()) > 0
    assert all(jnp.isfinite(g).all() for g in (g_m, g_c, g_o))


@pytest.fixture(scope="module")
def tiny_config():
    return SplatfactoModelConfig(
        max_gaussians=256,
        num_random=64,
        random_init=True,
        random_scale=2.0,
        sh_degree=1,
        warmup_length=4,
        refine_every=6,
        max_refine_new=32,
        tiles_per_gauss=16,
        max_per_tile=64,
        tile_chunk=2,
        num_downscales=0,
        background_color="black",
    )


def test_splatfacto_render_and_refine(tiny_config):
    model = SplatfactoModel(tiny_config)
    params, aux = init_gaussian_params(tiny_config)
    assert params["means"].shape == (256, 3)
    assert int(aux.alive.sum()) == 64
    c2w = jnp.eye(4)[:3].at[2, 3].set(4.0)
    out = model.render(
        params, aux.alive, c2w, (50.0, 50.0, 16.0, 16.0), 32, 32,
        sh_degree_active=0, key=jax.random.PRNGKey(0),
    )
    assert out["rgb"].shape == (32, 32, 3)
    assert bool(jnp.isfinite(out["rgb"]).all())

    # refine with fake grads: force clone of gaussian 0
    aux2 = aux.replace(
        grad_accum=aux.grad_accum.at[0].set(100.0),
        grad_count=aux.grad_count.at[0].set(1.0),
    )
    opt_state = jax.tree_util.tree_map(jnp.zeros_like, params)
    p2, o2, a2 = model.refine(
        params, opt_state, aux2, jax.random.PRNGKey(1),
        do_split=True, do_cull_scale=False, reset_alpha=False,
    )
    # gaussian 0 had tiny scale -> cloned into a free slot
    assert int(a2.alive.sum()) >= int(aux.alive.sum())
    assert p2["means"].shape == (256, 3)


def test_splatfacto_overfit_one_view(tiny_config):
    """A few steps of gradient descent reduce L1 against a constant image."""
    import optax

    from nerfstudio_tpu.pipelines.splat_pipeline import build_splat_optimizers

    model = SplatfactoModel(tiny_config)
    params, aux = init_gaussian_params(tiny_config)
    tx = build_splat_optimizers(tiny_config, max_steps=100)
    opt_state = tx.init(params)
    c2w = jnp.eye(4)[:3].at[2, 3].set(4.0)
    gt = jnp.full((32, 32, 3), 0.6)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.render(
                p, aux.alive, c2w, (50.0, 50.0, 16.0, 16.0), 32, 32,
                sh_degree_active=0, background=jnp.zeros(3),
            )
            loss, ld = model.get_loss(out, gt, p, aux.alive)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
