"""Per-group gradient accumulation (reference engine/trainer.py:87,494-509:
gradient_accumulation_steps per param group via selective zero_grad/step).
Here it's optax.MultiSteps inside the multi_transform — these tests pin the
semantics: the accumulated group updates every k-th step with the MEAN of
the k microbatch grads while other groups update every step."""

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.engine.optimizers import AdamOptimizerConfig, build_optimizers


def _params():
    return {
        "params": {
            "fields": jnp.ones((4,)),
            "camera_opt": jnp.ones((2,)),
        }
    }


def _grads(v=1.0):
    return {
        "params": {
            "fields": jnp.full((4,), v),
            "camera_opt": jnp.full((2,), v),
        }
    }


def _build(accum):
    cfgs = {
        "fields": {
            "optimizer": AdamOptimizerConfig(lr=0.1),
            "gradient_accumulation_steps": accum,
        },
        "camera_opt": {"optimizer": AdamOptimizerConfig(lr=0.1)},
    }
    p = _params()
    return build_optimizers(cfgs, p), p


def test_accumulated_group_holds_until_kth_step():
    tx, params = _build(accum=2)
    state = tx.init(params)
    up1, state = tx.update(_grads(1.0), state, params)
    # fields: no update on the first microbatch; camera_opt updates
    assert float(jnp.abs(up1["params"]["fields"]).max()) == 0.0
    assert float(jnp.abs(up1["params"]["camera_opt"]).max()) > 0.0
    up2, state = tx.update(_grads(1.0), state, params)
    assert float(jnp.abs(up2["params"]["fields"]).max()) > 0.0


def test_accumulated_update_equals_mean_grad_step():
    # two microbatches with grads g and 3g must equal ONE adam step on 2g
    tx, params = _build(accum=2)
    state = tx.init(params)
    _, state = tx.update(_grads(1.0), state, params)
    up_acc, _ = tx.update(_grads(3.0), state, params)

    tx1, params1 = _build(accum=1)
    state1 = tx1.init(params1)
    up_ref, _ = tx1.update(_grads(2.0), state1, params1)

    np.testing.assert_allclose(
        np.asarray(up_acc["params"]["fields"]),
        np.asarray(up_ref["params"]["fields"]),
        rtol=1e-5,
    )


def test_no_accum_group_updates_every_step():
    tx, params = _build(accum=3)
    state = tx.init(params)
    for _ in range(3):
        up, state = tx.update(_grads(1.0), state, params)
        assert float(jnp.abs(up["params"]["camera_opt"]).max()) > 0.0
