"""Multi-step dispatch (lax.scan over K batches) must match K sequential
single-step dispatches exactly (same rng folding, same updates)."""
import numpy as np
import jax
import jax.numpy as jnp

from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.parallel.mesh import make_mesh
from tvqaplus_tpu.train.loop import Trainer
from tests.test_train import small_cfg


def test_scan_matches_sequential(tmp_path):
    cfg = small_cfg(tmp_path, use_sup_att=True, add_local=True, dropout=0.0)
    ds = SyntheticTVQADataset(cfg, 12, mode="train")
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    # sequential
    tr1 = Trainer(cfg, mesh=mesh)
    seq_losses = []
    for batch, _, _ in tr1._pipeline(ds, shuffle=False, batch_size=4):
        tr1.state, m = tr1._train_step(tr1.state, batch, tr1.rng,
                                       use_hard_negatives=False)
        seq_losses.append(float(m["loss"]))

    # scanned: 3 batches in one dispatch
    tr2 = Trainer(cfg, mesh=mesh)
    pipe = tr2._pipeline(ds, shuffle=False, batch_size=4, group=3)
    items = list(pipe)
    assert len(items) == 1
    stacked, meta, _ = items[0]
    assert stacked["ex_mask"].ndim == 2 and stacked["ex_mask"].shape[0] == 3
    assert len(meta["qid"]) == 12
    tr2.state, metrics = tr2._train_step_scan(
        tr2.state, stacked, tr2.rng, use_hard_negatives=False)
    scan_losses = [float(x) for x in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5, atol=1e-5)
    # final params identical
    p1 = jax.tree_util.tree_leaves(tr1.state.params)
    p2 = jax.tree_util.tree_leaves(tr2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_pipeline_flushes_leftovers(tmp_path):
    cfg = small_cfg(tmp_path)
    ds = SyntheticTVQADataset(cfg, 20, mode="train")  # 5 batches of 4
    pipe = __import__("tvqaplus_tpu.data.pipeline",
                      fromlist=["DataPipeline"]).DataPipeline(
        ds, cfg, mesh=None, batch_size=4, group=2)
    shapes = [b["ex_mask"].shape for b, _, _ in pipe]
    # 2 stacked pairs + 1 single leftover
    assert shapes.count((2, 4)) == 2
    assert shapes.count((4,)) == 1


def test_auto_steps_per_dispatch(tmp_path):
    from tvqaplus_tpu.train.loop import auto_steps_per_dispatch
    cfg = small_cfg(tmp_path)
    k = auto_steps_per_dispatch(cfg)
    assert 1 <= k <= 16
    # tiny test shapes -> tiny batch -> K hits the cap
    assert k == 16
    # a huge synthetic batch forces K down to 1
    k_small = auto_steps_per_dispatch(cfg, hbm_budget_bytes=1)
    assert k_small == 1
    # cfg.steps_per_dispatch == 0 engages auto sizing in the Trainer
    cfg2 = small_cfg(tmp_path, steps_per_dispatch=0)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    trainer = Trainer(cfg2, mesh=mesh)
    assert trainer.steps_per_dispatch == 16


def test_train_epoch_with_steps_per_dispatch(tmp_path):
    cfg = small_cfg(tmp_path, steps_per_dispatch=2, log_freq=10000)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticTVQADataset(cfg, 16, mode="train")
    acc = trainer.train_epoch(ds, epoch=0, valid_dataset=None)
    assert int(trainer.state.step) == 4  # 16/4 = 4 optimizer steps
