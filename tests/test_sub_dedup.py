"""Subtitle token-dedup contract (config.py sub_dedup).

The reference h5 stores one token stream per video and the pipeline expands
per-frame aligned windows from it (tvqa_dataset.py:164-185).  The dedup
batch contract uploads the stream once (sub_tokens + sub_win_idx) and the
model gathers windows on device after the token-pointwise bridge +
input_embedding (stage.py).  These tests pin the invariant that makes that
an *optimization* rather than a model change: identical numerics to the
expanded contract at eval, including the zero-token trick for padded slots
(expanded zero padding rows pass through the bridge too, producing
bridge(0) != 0 — the dedup path must reproduce exactly that).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import (
    StaticShapeSpec,
    collate_static,
    expand_sub_windows,
)
from tvqaplus_tpu.data.pipeline import DataPipeline
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.models.stage import STAGE, ModelConfig
from tvqaplus_tpu.models import losses


def small_cfg(tmp_path, **kw):
    kw.setdefault("max_sub_tokens", 64)
    kw.setdefault("add_local", True)
    cfg = Config(bsz=4, test_bsz=4, hsz=16, embedding_size=24, vfeat_size=12,
                 max_qa_l=10, max_sub_l=8, max_num_img=6, num_region=5,
                 img_buckets=[6], max_q_l=4, max_a_l=4, use_sup_att=True,
                 synthetic_data=True,
                 results_dir_base=str(tmp_path / "results"), **kw)
    cfg.finalize(save=False)
    return cfg


def _both_batches(cfg, n=4):
    """Collate the same examples under both contracts."""
    ds = SyntheticTVQADataset(cfg, n, mode="train")
    examples = [ds[i] for i in range(n)]
    spec_d = StaticShapeSpec.from_config(cfg, batch=n, max_img=6)
    assert spec_d.max_sub_tokens > 0
    spec_e = dataclasses.replace(spec_d, max_sub_tokens=0)
    dedup, meta_d = collate_static(examples, spec_d)
    expanded, meta_e = collate_static(examples, spec_e)
    return dedup, expanded, meta_d, meta_e


class TestCollate:
    def test_window_reconstruction_is_exact(self, tmp_path):
        dedup, expanded, meta_d, _ = _both_batches(small_cfg(tmp_path))
        assert max(meta_d["sub_tok_overflow"]) == 0
        np.testing.assert_array_equal(dedup["sub_mask"],
                                      expanded["sub_mask"])
        np.testing.assert_array_equal(expand_sub_windows(dedup),
                                      expanded["sub_bert"])

    def test_fallback_synthesizes_stream_from_windows(self, tmp_path):
        """Examples without a stream (only expanded windows) still collate
        under the dedup contract, bit-identically."""
        cfg = small_cfg(tmp_path, max_sub_tokens=256)
        ds = SyntheticTVQADataset(cfg, 2, mode="train")
        examples = []
        for i in range(2):
            ex = dict(ds[i])
            ex.pop("sub_tokens")
            ex.pop("sub_win_spans")
            examples.append(ex)
        spec = StaticShapeSpec.from_config(cfg, batch=2, max_img=6)
        dedup, meta = collate_static(examples, spec)
        spec_e = dataclasses.replace(spec, max_sub_tokens=0)
        expanded, _ = collate_static(examples, spec_e)
        assert max(meta["sub_tok_overflow"]) == 0
        np.testing.assert_array_equal(expand_sub_windows(dedup),
                                      expanded["sub_bert"])

    def test_overflow_is_loud(self, tmp_path):
        cfg = small_cfg(tmp_path, max_sub_tokens=8)  # 7 usable slots
        ds = SyntheticTVQADataset(cfg, 4, mode="train")
        pipe = DataPipeline(ds, cfg, mesh=None, batch_size=4)
        with pytest.raises(ValueError, match="max_sub_tokens"):
            list(pipe)


class TestSubTokenBuckets:
    def test_bucketed_batch_is_prefix_of_fixed(self, tmp_path):
        """sub_token_buckets ships a smaller St axis whose content is
        bit-identical to the fixed-cap batch's first St slots."""
        cfg = small_cfg(tmp_path, max_sub_tokens=64)
        ds = SyntheticTVQADataset(cfg, 8, mode="train")
        fixed = DataPipeline(ds, cfg, mesh=None, batch_size=4)
        cfg_b = small_cfg(tmp_path, max_sub_tokens=64,
                          sub_token_buckets=[16, 32, 48])
        bucketed = DataPipeline(ds, cfg_b, mesh=None, batch_size=4)
        got_smaller = False
        for (af, _, _), (ab, _, _) in zip(fixed, bucketed):
            af = {k: np.asarray(v) for k, v in af.items()}
            ab = {k: np.asarray(v) for k, v in ab.items()}
            st = ab["sub_tokens"].shape[1]
            assert st <= af["sub_tokens"].shape[1]
            got_smaller |= st < af["sub_tokens"].shape[1]
            np.testing.assert_array_equal(ab["sub_tokens"],
                                          af["sub_tokens"][:, :st])
            np.testing.assert_array_equal(ab["sub_win_idx"],
                                          af["sub_win_idx"])
            np.testing.assert_array_equal(ab["sub_mask"], af["sub_mask"])
        assert got_smaller, "no batch picked a smaller St bucket"

    def test_grouped_stacks_key_on_st(self, tmp_path):
        """Same-Li batches with different St buckets must not stack into
        one dispatch (shapes differ)."""
        cfg = small_cfg(tmp_path, max_sub_tokens=64,
                        sub_token_buckets=[16, 32, 48])

        class TwoSizes:
            """First 4 examples tiny streams, next 4 large ones."""
            def __init__(self, ds):
                self.ex = [ds[i] for i in range(8)]
                for i in range(4):
                    e = dict(self.ex[i])
                    e["sub_tokens"] = e["sub_tokens"][:4]
                    e["sub_win_spans"] = [(0, min(2, len(e["sub_tokens"])))
                                          for _ in e["sub_win_spans"]]
                    self.ex[i] = e

            def __len__(self):
                return 8

            def __getitem__(self, i):
                return self.ex[i]

        ds = TwoSizes(SyntheticTVQADataset(cfg, 8, mode="train"))
        pipe = DataPipeline(ds, cfg, mesh=None, batch_size=4, group=2)
        sts = set()
        for arrays, meta, bucket in pipe:
            a = np.asarray(arrays["sub_tokens"])
            # mixed-St stacking would have raised in np.stack; record shapes
            sts.add(a.shape[-2])
        assert len(sts) == 2, f"expected two distinct St buckets, got {sts}"


class TestModelEquivalence:
    @pytest.mark.parametrize("add_local", [False, True])
    def test_forward_and_grads_match_expanded(self, tmp_path, add_local):
        """Full training loss + gradients agree between contracts at
        dropout=0 (same params; the dedup path is a pure re-factoring of
        the compute graph)."""
        cfg = small_cfg(tmp_path, add_local=add_local)
        dedup, expanded, _, _ = _both_batches(cfg)
        model = STAGE(ModelConfig.from_config(cfg))
        params = model.init({"params": jax.random.PRNGKey(0)}, expanded,
                            train=False)["params"]

        def loss_fn(p, batch):
            out = model.apply({"params": p}, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            loss, metrics = losses.total_loss(
                out, batch, jax.random.PRNGKey(2), use_sup_att=True,
                entry_cap=cfg.att_entry_cap, train=True)
            return loss

        # dropout must be off for bitwise-style agreement
        model_eval = STAGE(dataclasses.replace(ModelConfig.from_config(cfg),
                                               dropout=0.0))

        def loss_eval(p, batch):
            out = model_eval.apply({"params": p}, batch, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)})
            loss, _ = losses.total_loss(
                out, batch, jax.random.PRNGKey(2), use_sup_att=True,
                entry_cap=cfg.att_entry_cap, train=True)
            return loss

        l_d, g_d = jax.value_and_grad(loss_eval)(params, dedup)
        l_e, g_e = jax.value_and_grad(loss_eval)(params, expanded)
        np.testing.assert_allclose(float(l_d), float(l_e), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            g_d, g_e)

    def test_merged_input_encoder_equals_separate(self, tmp_path):
        """merge_input_streams (one input_encoder call over qa+sub+vid,
        stage.py _merged_input_encode) is exact: the zero-masked conv
        inputs make every tap read what per-stream SAME padding would.
        Same params, dropout=0 -> losses and gradients agree to float
        noise.  The small config's unequal lengths (Lqa=10, Ls=8, Lr=5)
        exercise the padded-tail re-zeroing on both shorter streams."""
        cfg = small_cfg(tmp_path)
        dedup, _, _, _ = _both_batches(cfg)
        mc = dataclasses.replace(ModelConfig.from_config(cfg), dropout=0.0)
        m_on = STAGE(dataclasses.replace(mc, merge_input_streams=True))
        m_off = STAGE(dataclasses.replace(mc, merge_input_streams=False))
        params = m_on.init({"params": jax.random.PRNGKey(0)}, dedup,
                           train=False)["params"]

        def loss_fn(model):
            def f(p):
                out = model.apply({"params": p}, dedup, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(1)})
                loss, _ = losses.total_loss(
                    out, dedup, jax.random.PRNGKey(2), use_sup_att=True,
                    entry_cap=cfg.att_entry_cap, train=True)
                return loss
            return f

        l_on, g_on = jax.value_and_grad(loss_fn(m_on))(params)
        l_off, g_off = jax.value_and_grad(loss_fn(m_off))(params)
        np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            g_on, g_off)

        out_on = m_on.apply({"params": params}, dedup, train=False)
        out_off = m_off.apply({"params": params}, dedup, train=False)
        for k in ("answer_scores", "t_scores", "sub_raw_s", "vid_raw_s"):
            np.testing.assert_allclose(np.asarray(out_on[k]),
                                       np.asarray(out_off[k]),
                                       rtol=1e-6, atol=1e-6)

    def test_eval_outputs_match_expanded(self, tmp_path):
        cfg = small_cfg(tmp_path)
        dedup, expanded, _, _ = _both_batches(cfg)
        model = STAGE(ModelConfig.from_config(cfg))
        params = model.init({"params": jax.random.PRNGKey(0)}, expanded,
                            train=False)["params"]
        out_d = model.apply({"params": params}, dedup, train=False)
        out_e = model.apply({"params": params}, expanded, train=False)
        for k in ("answer_scores", "t_scores", "sub_raw_s", "vid_raw_s"):
            np.testing.assert_allclose(np.asarray(out_d[k]),
                                       np.asarray(out_e[k]),
                                       rtol=1e-6, atol=1e-6)


class TestMergedFusedKernel:
    def test_merged_fused_equals_separate_xla(self, tmp_path):
        """merge_input_streams + use_pallas (the merged site on the fused
        encoder kernel, zero_mask in-kernel; interpret mode on CPU) ==
        the separate-stream XLA path, eval outputs + train gradients."""
        cfg = small_cfg(tmp_path)
        dedup, _, _, _ = _both_batches(cfg)
        mc = dataclasses.replace(ModelConfig.from_config(cfg), dropout=0.0)
        m_fused = STAGE(dataclasses.replace(mc, merge_input_streams=True,
                                            use_pallas=True))
        m_off = STAGE(dataclasses.replace(mc, merge_input_streams=False,
                                          use_pallas=False))
        params = m_off.init({"params": jax.random.PRNGKey(0)}, dedup,
                            train=False)["params"]
        out_f = m_fused.apply({"params": params}, dedup, train=False)
        out_o = m_off.apply({"params": params}, dedup, train=False)
        for k in ("answer_scores", "t_scores", "sub_raw_s", "vid_raw_s"):
            np.testing.assert_allclose(np.asarray(out_f[k]),
                                       np.asarray(out_o[k]),
                                       rtol=5e-4, atol=5e-4, err_msg=k)

        def loss_fn(model):
            def f(p):
                out = model.apply({"params": p}, dedup, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(1)})
                loss, _ = losses.total_loss(
                    out, dedup, jax.random.PRNGKey(2), use_sup_att=True,
                    entry_cap=cfg.att_entry_cap, train=True)
                return loss
            return f

        l_f, g_f = jax.value_and_grad(loss_fn(m_fused))(params)
        l_o, g_o = jax.value_and_grad(loss_fn(m_off))(params)
        np.testing.assert_allclose(float(l_f), float(l_o), rtol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            g_f, g_o)
