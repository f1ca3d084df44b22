"""STAGE with the fused Pallas attention path (interpret mode on CPU):
eval outputs must match the pure-JAX path bit-for-tolerance."""
import dataclasses

import numpy as np
import jax
import pytest

from tests.test_stage_model import init_and_run, tiny_batch, tiny_cfg


def test_pallas_path_matches_pure_jax_eval():
    batch = tiny_batch()
    cfg_plain = tiny_cfg(add_local=True)
    cfg_pallas = dataclasses.replace(cfg_plain, use_pallas=True)
    variables, out_plain = init_and_run(cfg_plain, batch, train=False)

    from tvqaplus_tpu.models.stage import STAGE
    model = STAGE(cfg_pallas)
    out_pallas = model.apply(variables, batch, train=False)

    np.testing.assert_allclose(
        np.array(out_pallas["answer_scores"]),
        np.array(out_plain["answer_scores"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.array(out_pallas["t_scores"]), np.array(out_plain["t_scores"]),
        rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.array(out_pallas["vid_raw_s"]), np.array(out_plain["vid_raw_s"]),
        rtol=2e-4, atol=2e-4)


def test_pallas_path_gradients_flow():
    """Training with dropout=0 uses the fused kernel + rematerialized
    backward; gradients must be finite and nonzero."""
    import jax.numpy as jnp
    from tvqaplus_tpu.models import losses
    from tvqaplus_tpu.models.stage import STAGE

    cfg = tiny_cfg(add_local=True, use_pallas=True, dropout=0.0)
    batch = tiny_batch()
    batch["att_labels"][0, 0, 0, 0] = 1.0
    batch = {k: jnp.array(v) for k, v in batch.items()}
    model = STAGE(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)

    def loss_fn(params):
        out = model.apply({"params": params}, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        loss, _ = losses.total_loss(out, batch, jax.random.PRNGKey(2),
                                    use_sup_att=True, train=True)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.array(g)).all() for g in leaves)
    assert sum(float((np.array(g) ** 2).sum()) for g in leaves) > 0
