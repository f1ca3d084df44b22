"""Training-subsystem tests: optimizer semantics, plateau scheduler,
checkpoint round-trip, and an end-to-end convergence smoke on synthetic
data (the reference's --debug integration-test role, README.md:68-71)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import ATT_KEYS
from tvqaplus_tpu.data.pipeline import DataPipeline
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.parallel.mesh import make_mesh
from tvqaplus_tpu.train.loop import Trainer
from tvqaplus_tpu.train.state import (
    PlateauScheduler,
    create_train_state,
    load_checkpoint,
    save_checkpoint,
)


def small_cfg(tmp_path, **kw):
    cfg = Config(
        bsz=4, test_bsz=4, hsz=16, embedding_size=24, vfeat_size=12,
        max_qa_l=10, max_sub_l=8, max_num_img=6, num_region=5,
        img_buckets=[6], max_q_l=4, max_a_l=4,
        results_dir_base=str(tmp_path / "results"),
        synthetic_data=True, log_freq=10000,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.finalize(save=False)
    return cfg


class TestOptimizer:
    def test_adam_decreases_quadratic(self):
        params = {"w": jnp.array([1.0, -2.0, 3.0])}
        state, tx = create_train_state(params, lr=0.1, weight_decay=0.0,
                                       clip=10.0)
        for _ in range(100):
            grads = {"w": 2 * state.params["w"]}
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            state = state.replace(params=params, opt_state=opt_state)
        assert float(jnp.abs(state.params["w"]).max()) < 0.1

    def test_lr_injection(self):
        params = {"w": jnp.zeros(3)}
        state, tx = create_train_state(params, lr=1e-3)
        assert abs(state.lr() - 1e-3) < 1e-9
        state = state.with_lr(5e-4)
        assert abs(state.lr() - 5e-4) < 1e-9

    def test_grad_clip(self):
        params = {"w": jnp.zeros(4)}
        state, tx = create_train_state(params, lr=1.0, weight_decay=0.0,
                                       clip=1.0)
        grads = {"w": jnp.full(4, 100.0)}
        updates, _ = tx.update(grads, state.opt_state, state.params)
        # after clipping to norm 1, adam normalizes again; just check finite
        assert np.isfinite(np.array(updates["w"])).all()


class TestPlateauScheduler:
    def test_reduces_after_patience(self):
        s = PlateauScheduler(1.0, mode="max", factor=0.5, patience=2)
        s.step(0.5)  # best = 0.5
        assert s.step(0.5) == 1.0  # bad 1
        assert s.step(0.5) == 1.0  # bad 2
        assert s.step(0.5) == 0.5  # bad 3 > patience -> reduce
        # improvement resets
        assert s.step(0.9) == 0.5
        assert s.num_bad_epochs == 0

    def test_threshold_rel(self):
        s = PlateauScheduler(1.0, mode="max", factor=0.5, patience=0)
        s.step(0.5)
        # within rel threshold -> not an improvement -> reduce
        assert s.step(0.500001) == 0.5


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        state, _ = create_train_state(params, lr=1e-3)
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state, extra={"best_acc": 0.5, "epoch": 3})
        template, _ = create_train_state(
            {"a": jnp.zeros(4), "b": {"c": jnp.zeros((2, 2))}}, lr=1e-3)
        restored, extra = load_checkpoint(path, template)
        assert int(restored.step) == 7
        np.testing.assert_allclose(np.array(restored.params["a"]),
                                   np.arange(4.0))
        assert extra["best_acc"] == 0.5 and extra["epoch"] == 3


class TestPipeline:
    def test_static_shapes_and_buckets(self, tmp_path):
        cfg = small_cfg(tmp_path)
        ds = SyntheticTVQADataset(cfg, 10, mode="train")
        pipe = DataPipeline(ds, cfg, mesh=None, batch_size=4, shuffle=True)
        shapes = set()
        n_ex = 0
        for arrays, meta, bucket in pipe:
            shapes.add(arrays["vid"].shape)
            n_ex += int(np.asarray(arrays["ex_mask"]).sum())
            assert len(meta["qid"]) <= 4
        assert n_ex == 10
        assert len(shapes) == 1  # single bucket -> single shape

    def test_shuffle_changes_order(self, tmp_path):
        cfg = small_cfg(tmp_path)
        ds = SyntheticTVQADataset(cfg, 16, mode="train")
        pipe = DataPipeline(ds, cfg, mesh=None, batch_size=4, shuffle=True)
        order1 = [meta["qid"] for _, meta, _ in pipe]
        order2 = [meta["qid"] for _, meta, _ in pipe]  # epoch 2
        assert order1 != order2

    def test_bucket_batching(self, tmp_path):
        """Shuffle-mode bucket batching: every example appears exactly once,
        every batch's bucket is the smallest that fits ALL its members (no
        long example dragging short ones into the big bucket)."""
        from tvqaplus_tpu.data.batching import pick_bucket
        cfg = small_cfg(tmp_path, max_num_img=8, img_buckets=[4, 6, 8])
        ds = SyntheticTVQADataset(cfg, 32, mode="train")
        by_qid_bucket = {
            ds[i]["qid"]: pick_bucket(len(ds[i]["image_indices"]),
                                      [4, 6, 8], 8)
            for i in range(32)}
        assert len(set(by_qid_bucket.values())) > 1  # mixed dataset
        pipe = DataPipeline(ds, cfg, mesh=None, batch_size=4, shuffle=True)
        seen = []
        for arrays, meta, bucket in pipe:
            n = int(np.asarray(arrays["ex_mask"]).sum())
            for qid in meta["qid"][:n]:
                seen.append(qid)
                assert by_qid_bucket[qid] == bucket, \
                    f"example of bucket {by_qid_bucket[qid]} in a " \
                    f"bucket-{bucket} batch"
        assert sorted(seen) == sorted(by_qid_bucket)  # exactly once each

    def test_nonfinite_loss_halts_with_crash_checkpoint(self, tmp_path):
        """A NaN step inside a log window must halt training at the next
        log point and snapshot the diverged state (SURVEY §5 failure
        detection)."""
        cfg = small_cfg(tmp_path, log_freq=2, n_epoch=1)
        mesh = make_mesh((1, 1), devices=jax.devices()[:1])
        trainer = Trainer(cfg, mesh=mesh)
        real = trainer._train_step

        def poisoned(state, batch, rng, use_hard_negatives):
            state, metrics = real(state, batch, rng,
                                  use_hard_negatives=use_hard_negatives)
            metrics["loss"] = metrics["loss"] * jnp.nan
            return state, metrics

        trainer._train_step = poisoned
        ds = SyntheticTVQADataset(cfg, 16, mode="train")
        vds = SyntheticTVQADataset(cfg, 4, mode="valid")
        with pytest.raises(FloatingPointError, match="non-finite"):
            trainer.train_epoch(ds, epoch=0, valid_dataset=vds)
        assert os.path.exists(os.path.join(cfg.results_dir,
                                           "crash_state.ckpt"))

    def test_att_entry_cap_overflow_is_loud(self, tmp_path):
        """An example with more positive attention cells than att_entry_cap
        must raise (the att loss would silently drop positives —
        losses.py top-k)."""
        cfg = small_cfg(tmp_path, att_entry_cap=3)
        ds = SyntheticTVQADataset(cfg, 4, mode="train")
        base = ds[0]

        class Overflowing:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                ex = dict(base)
                labels = np.ones((2, 2, 2), np.float32)  # 8 positives > 3
                ex["att_labels_dense"] = (labels, np.ones_like(labels))
                return ex

        pipe = DataPipeline(Overflowing(), cfg, mesh=None, batch_size=4)
        with pytest.raises(ValueError, match="att_entry_cap"):
            list(pipe)
        # inference excludes att labels -> no guard
        pipe = DataPipeline(Overflowing(), cfg, mesh=None, batch_size=4,
                            exclude_keys=ATT_KEYS)
        assert len(list(pipe)) == 1


@pytest.mark.slow
class TestEndToEnd:
    def test_loss_decreases_on_planted_signal(self, tmp_path):
        cfg = small_cfg(tmp_path, use_sup_att=True, add_local=True, lr=3e-3)
        mesh = make_mesh((1, 1), devices=jax.devices()[:1])
        trainer = Trainer(cfg, mesh=mesh)
        train_ds = SyntheticTVQADataset(cfg, 32, mode="train")
        valid_ds = SyntheticTVQADataset(cfg, 16, mode="valid")

        first_losses, last_losses = [], []
        for epoch in range(8):
            pipe = trainer._pipeline(train_ds, shuffle=True,
                                     batch_size=cfg.bsz)
            for batch, meta, _ in pipe:
                trainer.state, metrics = trainer._train_step(
                    trainer.state, batch, trainer.rng,
                    use_hard_negatives=False)
                per_ex = float(metrics["loss"]) / float(metrics["n_examples"])
                if epoch == 0:
                    first_losses.append(per_ex)
                elif epoch == 7:
                    last_losses.append(per_ex)
        assert np.mean(last_losses) < 0.7 * np.mean(first_losses), (
            f"loss did not decrease: {np.mean(first_losses):.3f} -> "
            f"{np.mean(last_losses):.3f}")
        acc, loss, qid_corrects = trainer.validate(valid_ds)
        assert acc > 0.3  # planted signal should beat 0.2 chance
        assert len(qid_corrects) == 16

    def test_validate_loss_normalization(self, tmp_path):
        """validate() returns sum(per-batch summed losses) / n_examples —
        exactly the reference's ``sum(valid_loss)/len(valid_corrects)``
        (main.py:181-183, criterion reduction="sum", att loss gated off by
        model.eval() at stage.py:317)."""
        cfg = small_cfg(tmp_path, use_sup_att=True)
        mesh = make_mesh((1, 1), devices=jax.devices()[:1])
        trainer = Trainer(cfg, mesh=mesh)
        valid_ds = SyntheticTVQADataset(cfg, 10, mode="valid")  # ragged tail
        acc, loss, qid_corrects = trainer.validate(valid_ds)

        batch_losses, n_examples = [], 0
        pipe = trainer._pipeline(valid_ds, shuffle=False,
                                 batch_size=cfg.test_bsz)
        for batch, meta, _ in pipe:
            metrics, _ = trainer._eval_step(trainer.state, batch)
            batch_losses.append(float(metrics["loss"]))  # summed, not mean
            n_examples += int(np.asarray(batch["ex_mask"]).sum())
        assert n_examples == 10
        np.testing.assert_allclose(loss, sum(batch_losses) / n_examples,
                                   rtol=1e-6)
        assert len(qid_corrects) == 10

    def test_hard_negative_step(self, tmp_path):
        """Hard-negative sampling engages after hard_negative_start
        (reference main.py:227); the jitted step must stay finite."""
        cfg = small_cfg(tmp_path, use_sup_att=True)
        mesh = make_mesh((1, 1), devices=jax.devices()[:1])
        trainer = Trainer(cfg, mesh=mesh)
        ds = SyntheticTVQADataset(cfg, 8, mode="train")
        pipe = trainer._pipeline(ds, shuffle=False, batch_size=4)
        for batch, _, _ in pipe:
            trainer.state, metrics = trainer._train_step(
                trainer.state, batch, trainer.rng, use_hard_negatives=True)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["att_n_pairs"]) > 0

    def test_data_parallel_2dev(self, tmp_path):
        cfg = small_cfg(tmp_path, bsz=8, test_bsz=8)
        mesh = make_mesh((2, 1), devices=jax.devices()[:2])
        trainer = Trainer(cfg, mesh=mesh)
        ds = SyntheticTVQADataset(cfg, 16, mode="train")
        pipe = trainer._pipeline(ds, shuffle=False, batch_size=8)
        for batch, _, _ in pipe:
            trainer.state, metrics = trainer._train_step(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
        assert np.isfinite(float(metrics["loss"]))

    def test_context_parallel_mesh(self, tmp_path):
        cfg = small_cfg(tmp_path, bsz=4, max_num_img=6, img_buckets=[6],
                        mesh_shape=[2, 2])
        mesh = make_mesh((2, 2), devices=jax.devices()[:4])
        trainer = Trainer(cfg, mesh=mesh)
        ds = SyntheticTVQADataset(cfg, 8, mode="train")
        pipe = trainer._pipeline(ds, shuffle=False, batch_size=4)
        for batch, _, _ in pipe:
            trainer.state, metrics = trainer._train_step(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
        assert np.isfinite(float(metrics["loss"]))

    def test_dp_matches_single_device(self, tmp_path):
        """The same global batch must give the same loss on a 1-device and a
        4-device data-parallel mesh (SPMD correctness)."""
        cfg = small_cfg(tmp_path, bsz=4)
        ds = SyntheticTVQADataset(cfg, 8, mode="train")
        results = []
        for ndev in (1, 4):
            mesh = make_mesh((ndev, 1), devices=jax.devices()[:ndev])
            trainer = Trainer(cfg, mesh=mesh)
            pipe = trainer._pipeline(ds, shuffle=False, batch_size=4)
            batch, _, _ = next(iter(pipe))
            _, metrics = trainer._train_step(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
            results.append(float(metrics["loss"]))
        assert abs(results[0] - results[1]) / abs(results[0]) < 1e-4

    def test_cp_matches_single_device(self, tmp_path):
        """Context parallelism over Li must not change the loss (per-frame
        attention is communication-free; only Li softmax/max reduce)."""
        cfg = small_cfg(tmp_path, bsz=4, max_num_img=8, img_buckets=[8],
                        use_sup_att=True, add_local=True)
        ds = SyntheticTVQADataset(cfg, 4, mode="train")
        results = []
        for mesh_shape in ((1, 1), (1, 4)):
            ndev = mesh_shape[0] * mesh_shape[1]
            mesh = make_mesh(mesh_shape, devices=jax.devices()[:ndev])
            trainer = Trainer(cfg, mesh=mesh)
            pipe = trainer._pipeline(ds, shuffle=False, batch_size=4)
            batch, _, _ = next(iter(pipe))
            _, metrics = trainer._train_step(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
            results.append(float(metrics["loss"]))
        assert abs(results[0] - results[1]) / abs(results[0]) < 1e-4

    def test_tp_matches_single_device(self, tmp_path):
        """Tensor parallelism over the optional "model" mesh axis must not
        change loss or updated params.  embedding_size=256 puts the
        256x300 BERT bridge over mesh.state_shardings' _TP_MIN_PARAMS
        threshold, so it genuinely shards (asserted below); GSPMD
        partitions its matmul and all-gathers at the consumers."""
        from tvqaplus_tpu.parallel.mesh import state_shardings

        cfg = small_cfg(tmp_path, bsz=4, embedding_size=256,
                        use_sup_att=True, mesh_shape=[2, 1, 2])
        ds = SyntheticTVQADataset(cfg, 4, mode="train")
        results = []
        for mesh_shape in ((1, 1), (2, 1, 2)):
            ndev = int(np.prod(mesh_shape))
            mesh = make_mesh(mesh_shape, devices=jax.devices()[:ndev])
            trainer = Trainer(cfg, mesh=mesh)
            if len(mesh_shape) == 3:
                sh = state_shardings(mesh, trainer.state)
                specs = {s.spec for s in jax.tree_util.tree_leaves(
                    sh.params, is_leaf=lambda x: hasattr(x, "spec"))}
                assert any(s for s in specs if s), \
                    "no parameter actually sharded over the model axis"
            pipe = trainer._pipeline(ds, shuffle=False, batch_size=4)
            batch, _, _ = next(iter(pipe))
            losses_2step = []
            for _ in range(2):  # step 2 trains on the TP-updated params
                trainer.state, metrics = trainer._train_step(
                    trainer.state, batch, trainer.rng,
                    use_hard_negatives=False)
                losses_2step.append(float(metrics["loss"]))
            results.append(losses_2step)
        # step-1 losses are sharding-exact; step-2 losses run on post-Adam
        # params, where reduction-order noise is amplified by g/(sqrt(nu)+eps)
        # (see test_training_parity.py) — compare with a looser bound
        assert abs(results[0][0] - results[1][0]) / abs(results[0][0]) < 1e-4
        assert abs(results[0][1] - results[1][1]) / abs(results[0][1]) < 5e-3
