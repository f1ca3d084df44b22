"""End-to-end STAGE module tests: shapes, stream configs, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.models.stage import STAGE, ModelConfig
from tvqaplus_tpu.models import losses

B, A, LQA, LI, LS, LR = 2, 5, 8, 4, 6, 5
DE, DV = 32, 16


def tiny_cfg(**kw):
    base = dict(hsz=16, bridge_hsz=12, embedding_size=DE, vfeat_size=DV,
                input_encoder_kernel_size=7, cls_encoder_kernel_size=5)
    base.update(kw)
    return ModelConfig(**base)


def tiny_batch(rng=None):
    rng = rng or np.random.default_rng(0)
    f32 = np.float32
    return {
        "qas": rng.integers(0, 50, (B, A, LQA)).astype(np.int32),
        "qas_mask": np.ones((B, A, LQA), f32),
        "qas_bert": rng.standard_normal((B, A, LQA, DE)).astype(f32),
        "q_l": np.full((B,), 3, np.int32),
        "sub_bert": rng.standard_normal((B, LI, LS, DE)).astype(f32),
        "sub_mask": np.ones((B, LI, LS), f32),
        "vid": rng.standard_normal((B, LI, LR, DV)).astype(f32),
        "vid_mask": np.ones((B, LI, LR), f32),
        "target": np.array([1, 3], np.int32),
        "ts_st": np.array([0, 1], np.int32),
        "ts_ed": np.array([1, 2], np.int32),
        "ts_mask": np.ones((B, LI), f32),
        "att_labels": np.zeros((B, LI, LQA, LR), f32),
        "att_defined": np.ones((B, LI, LQA, LR), f32),
        "anno_st": np.zeros((B,), np.int32),
        "ex_mask": np.ones((B,), f32),
    }


def init_and_run(cfg, batch, train):
    model = STAGE(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=False)
    out = model.apply(variables, batch, train=train,
                      rngs={"dropout": jax.random.PRNGKey(2)} if train else {})
    return variables, out


class TestForwardShapes:
    def test_eval_both_streams(self):
        batch = tiny_batch()
        batch["att_labels"][0, 0, 0, 0] = 1.0
        _, out = init_and_run(tiny_cfg(), batch, train=False)
        assert out["answer_scores"].shape == (B, A)
        assert out["t_scores"].shape == (B, A, LI, 2)
        assert out["vid_raw_s"].shape == (B, A, LI, LQA, LR)
        assert out["sub_raw_s"].shape == (B, A, LI, LQA, LS)
        assert np.isfinite(np.array(out["answer_scores"])).all()

    def test_train_add_local_proposal_axis(self):
        _, out = init_and_run(tiny_cfg(add_local=True), tiny_batch(),
                              train=True)
        assert out["answer_scores"].shape == (B, 2, A)  # P = 1 + 1
        assert out["proposal_weights"].shape == (B, 2)
        w = np.array(out["proposal_weights"])
        assert (w[:, 0] == 1).all()  # GT slot always on

    def test_eval_add_local(self):
        _, out = init_and_run(tiny_cfg(add_local=True), tiny_batch(),
                              train=False)
        assert out["answer_scores"].shape == (B, A)

    def test_sub_only(self):
        _, out = init_and_run(tiny_cfg(vfeat_flag=False), tiny_batch(),
                              train=False)
        assert out["answer_scores"].shape == (B, A)
        assert "vid_raw_s" not in out

    def test_vid_only(self):
        _, out = init_and_run(tiny_cfg(sub_flag=False), tiny_batch(),
                              train=False)
        assert out["answer_scores"].shape == (B, A)
        assert "sub_raw_s" not in out

    def test_t_iter_refinement_chain(self):
        _, out = init_and_run(tiny_cfg(t_iter=2), tiny_batch(), train=False)
        assert out["t_scores"].shape == (B, A, LI, 2)

    def test_non_visual_vectors(self):
        cfg = tiny_cfg(non_visual=2, add_non_visual=True)
        _, out = init_and_run(cfg, tiny_batch(), train=False)
        assert out["vid_raw_s"].shape == (B, A, LI, LQA, LR)

    def test_masked_images_excluded_from_t_scores(self):
        batch = tiny_batch()
        batch["ts_mask"][:, 2:] = 0.0
        _, out = init_and_run(tiny_cfg(), batch, train=False)
        t = np.array(out["t_scores"])
        assert (t[:, :, 2:] <= -1e9).all()
        assert (t[:, :, :2] > -1e9).all()


class TestGradients:
    def test_train_step_gradients_flow(self):
        cfg = tiny_cfg(add_local=True)
        batch = tiny_batch()
        batch["att_labels"][0, 0, 0, 0] = 1.0
        batch = {k: jnp.array(v) for k, v in batch.items()}
        model = STAGE(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, batch, train=False)

        def loss_fn(params):
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            loss, _ = losses.total_loss(out, batch, jax.random.PRNGKey(3),
                                        use_sup_att=True, train=True)
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.array(g)).all() for g in leaves)
        total_norm = sum(float(jnp.sum(g ** 2)) for g in leaves) ** 0.5
        assert total_norm > 0

    def test_jit_forward_compiles_once(self):
        cfg = tiny_cfg()
        batch = {k: jnp.array(v) for k, v in tiny_batch().items()}
        model = STAGE(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False)
        n_calls = 0

        @jax.jit
        def fwd(params, batch):
            nonlocal n_calls
            n_calls += 1
            return model.apply({"params": params}, batch, train=False)

        fwd(variables["params"], batch)
        fwd(variables["params"], batch)
        assert n_calls == 1  # traced once


def test_param_count_reasonable():
    """Full-size config: the reference STAGE is ~0.55M params (hsz 128,
    768->300 bridge dominates); the rebuild must land in the same range."""
    cfg = ModelConfig(add_local=True)
    model = STAGE(cfg)
    batch = {
        "qas_bert": np.zeros((1, 5, 8, 768), np.float32),
        "qas_mask": np.ones((1, 5, 8), np.float32),
        "sub_bert": np.zeros((1, 2, 4, 768), np.float32),
        "sub_mask": np.ones((1, 2, 4), np.float32),
        "vid": np.zeros((1, 2, 3, 300), np.float32),
        "vid_mask": np.ones((1, 2, 3), np.float32),
        "target": np.zeros((1,), np.int32),
        "ts_st": np.zeros((1,), np.int32),
        "ts_ed": np.zeros((1,), np.int32),
        "ts_mask": np.ones((1, 2), np.float32),
        "ex_mask": np.ones((1,), np.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 400_000 < n < 800_000


class TestNounMask:
    """qa_noun_masks batch key -> structured_attention noun_mask
    (reference qa_ctx_attention's dormant arg, stage.py:365-380)."""

    def test_all_ones_mask_is_identity(self):
        batch = tiny_batch()
        _, base = init_and_run(tiny_cfg(), batch, train=False)
        batch2 = dict(batch)
        batch2["qa_noun_masks"] = np.ones((B, A, LQA), np.float32)
        _, got = init_and_run(tiny_cfg(), batch2, train=False)
        np.testing.assert_allclose(np.array(got["answer_scores"]),
                                   np.array(base["answer_scores"]),
                                   rtol=1e-6)

    def test_zero_mask_changes_attention(self):
        batch = dict(tiny_batch())
        batch["qa_noun_masks"] = np.zeros((B, A, LQA), np.float32)
        _, base = init_and_run(tiny_cfg(), tiny_batch(), train=False)
        _, got = init_and_run(tiny_cfg(), batch, train=False)
        assert not np.allclose(np.array(got["answer_scores"]),
                               np.array(base["answer_scores"]))

    def test_vcpt_keys_ride_along(self):
        """the dormant vcpt/vcpt_mask batch keys must not disturb the
        forward (reference ships-but-never-reads them,
        tvqa_dataset.py:600-605)."""
        batch = dict(tiny_batch())
        batch["vcpt"] = np.ones((B, LI, LR), np.int32)
        batch["vcpt_mask"] = np.ones((B, LI, LR), np.float32)
        _, base = init_and_run(tiny_cfg(), tiny_batch(), train=False)
        _, got = init_and_run(tiny_cfg(), batch, train=False)
        np.testing.assert_allclose(np.array(got["answer_scores"]),
                                   np.array(base["answer_scores"]))
