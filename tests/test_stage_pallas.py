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


def test_with_raw_false_matches_full_kernel():
    """need_sub_raw/need_vid_raw=False (the production train/eval setting)
    skips the raw-score outputs but must not change anything else: same
    mixed-path outputs forward, same gradients backward (the raw gradient
    term is exactly zero when the loss never reads raw)."""
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

    out_full = model.apply(variables, batch, train=False)
    out_lean = model.apply(variables, batch, train=False,
                           need_sub_raw=False, need_vid_raw=False)
    assert "sub_raw_s" not in out_lean and "vid_raw_s" not in out_lean
    for k in ("answer_scores", "t_scores"):
        np.testing.assert_allclose(np.array(out_lean[k]),
                                   np.array(out_full[k]), rtol=1e-6)

    def loss_fn(need_sub_raw):
        def f(params):
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              need_sub_raw=need_sub_raw, need_vid_raw=True)
            loss, _ = losses.total_loss(out, batch, jax.random.PRNGKey(2),
                                        use_sup_att=True, train=True)
            return loss
        return f

    l_full, g_full = jax.value_and_grad(loss_fn(True))(variables["params"])
    l_lean, g_lean = jax.value_and_grad(loss_fn(False))(variables["params"])
    np.testing.assert_allclose(float(l_full), float(l_lean), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.array(a), np.array(b),
                                                rtol=1e-6, atol=1e-8),
        g_full, g_lean)


def test_vid_raw_target_mode_matches_full():
    """The Trainer's production setting (need_vid_raw="target": the kernel
    emits raw scores only at each example's target answer) must give the
    same training loss + gradients as the full raw output + loss-side
    gather."""
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

    def loss_fn(mode):
        def f(params):
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              need_sub_raw=False, need_vid_raw=mode)
            loss, _ = losses.total_loss(out, batch, jax.random.PRNGKey(2),
                                        use_sup_att=True, train=True)
            return loss
        return f

    l_full, g_full = jax.value_and_grad(loss_fn(True))(variables["params"])
    l_tgt, g_tgt = jax.value_and_grad(loss_fn("target"))(variables["params"])
    np.testing.assert_allclose(float(l_full), float(l_tgt), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.array(a), np.array(b),
                                                rtol=1e-5, atol=1e-7),
        g_full, g_tgt)
