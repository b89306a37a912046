"""Fused hash+MLP first-layer path vs explicit encode->MLP composition.

The fused path (ops/hash_grid._row_gather_block_mm, selected by
MLPWithHashEncoding when block=True) folds the first MLP matmul into the
per-level gather; it must agree with the composed path on the SAME params to
bf16 rounding. Reference contract: tcnn NetworkWithInputEncoding
(reference field_components/mlp.py:252-269).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.field_components.encodings import HashEncoding
from nerfstudio_tpu.field_components.mlp import MLP, MLPWithHashEncoding

KW = dict(
    num_levels=4,
    min_res=4,
    max_res=32,
    log2_hashmap_size=12,
    features_per_level=4,
    num_layers=2,
    layer_width=32,
    out_dim=8,
)


class _Composed(nn.Module):
    @nn.compact
    def __call__(self, x):
        enc = HashEncoding(
            num_levels=KW["num_levels"],
            min_res=KW["min_res"],
            max_res=KW["max_res"],
            log2_hashmap_size=KW["log2_hashmap_size"],
            features_per_level=KW["features_per_level"],
            block=True,
            name="encoding",
        )
        mlp = MLP(
            in_dim=KW["num_levels"] * KW["features_per_level"],
            num_layers=KW["num_layers"],
            layer_width=KW["layer_width"],
            out_dim=KW["out_dim"],
            name="mlp",
        )
        return mlp(enc(x))


@pytest.fixture(scope="module")
def setup():
    fused = MLPWithHashEncoding(block=True, fused_first_layer=True, **KW)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (64, 3))
    params = fused.init(key, x)
    return fused, _Composed(), params, x


def test_fused_forward_matches_composed(setup):
    fused, comp, params, x = setup
    a = fused.apply(params, x)
    b = comp.apply(params, x)
    scale = float(jnp.max(jnp.abs(b))) + 1e-12
    assert float(jnp.max(jnp.abs(a - b))) / scale < 0.02  # bf16 rounding order


def test_fused_grads_match_composed(setup):
    fused, comp, params, x = setup
    g1 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(comp.apply(p, x) ** 2))(params)
    kv1 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    kv2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    assert kv1.keys() == kv2.keys()
    for k in kv1:
        d = float(jnp.max(jnp.abs(kv1[k] - kv2[k])))
        scale = float(jnp.max(jnp.abs(kv2[k]))) + 1e-12
        assert d / scale < 0.03, f"{k}: {d} vs scale {scale}"


def test_fused_pose_gradient_flows(setup):
    """d_out/d_positions must be nonzero through the trilerp weights."""
    fused, _, params, x = setup
    gx = jax.grad(lambda xx: jnp.sum(fused.apply(params, xx) ** 2))(x)
    assert float(jnp.max(jnp.abs(gx))) > 0.0
    assert np.all(np.isfinite(np.asarray(gx)))
