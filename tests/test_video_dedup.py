"""Batch-level video dedup (config.video_dedup).

TVQA+ has ~7 QAs per clip and inference iterates in clip order, so a test
batch holds a few distinct videos: the pipeline ships each unique video's
``vid``/``sub_tokens`` ONCE (vid_u/sub_tokens_u + ex_vid gather index) and
the inference step expands them on device — cutting the dominant
host->device upload (docs/BENCH.md) without changing any prediction.
These tests pin that invariant: expansion reconstructs the non-dedup batch
bit-exactly, and the InferenceRunner's output is unchanged.
"""
import numpy as np
import pytest

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
from tvqaplus_tpu.data.pipeline import DataPipeline
from tvqaplus_tpu.data.synthetic import (
    CachedDataset,
    SharedVideoDataset,
    SyntheticTVQADataset,
)


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


def shared_ds(cfg, n=10, qas_per_video=3):
    return CachedDataset(SharedVideoDataset(
        SyntheticTVQADataset(cfg, n, mode="valid"), qas_per_video))


class TestPipelineDedup:
    def test_expansion_reconstructs_exactly(self, tmp_path):
        """vid_u[ex_vid] / sub_tokens_u[ex_vid] == the non-dedup batch,
        including the partial last batch (padding rows hit the zero slot,
        matching the baseline's zero rows)."""
        cfg = small_cfg(tmp_path, video_dedup=True, video_buckets=[2, 3])
        ds = shared_ds(cfg, n=10, qas_per_video=3)   # last batch: 2 real
        base = DataPipeline(ds, cfg, mesh=None, batch_size=4)
        dedup = DataPipeline(ds, cfg, mesh=None, batch_size=4,
                             video_dedup=True)
        saw_small_u = False
        for (ab, _, _), (ad, meta, _) in zip(base, dedup):
            ab = {k: np.asarray(v) for k, v in ab.items()}
            ad = {k: np.asarray(v) for k, v in ad.items()}
            assert "vid" not in ad and "sub_tokens" not in ad
            gi = ad["ex_vid"]
            u = ad["vid_u"].shape[0]
            saw_small_u |= u < 4
            # distinct keys got distinct slots (no false merges)
            names = list(zip(meta["vid_name"],
                             map(tuple, meta["image_indices"])))
            assert len(set(names)) == len(set(gi[: len(names)].tolist()))
            np.testing.assert_array_equal(ad["vid_u"][gi], ab["vid"])
            np.testing.assert_array_equal(ad["sub_tokens_u"][gi],
                                          ab["sub_tokens"])
            for k in ab:
                if k not in ("vid", "sub_tokens"):
                    np.testing.assert_array_equal(ad[k], ab[k], err_msg=k)
        assert saw_small_u, "no batch used a smaller U bucket"

    def test_unique_videos_fall_back_to_full_bucket(self, tmp_path):
        """All-distinct clips: U = batch size, reconstruction still exact."""
        cfg = small_cfg(tmp_path, video_buckets=[2])
        ds = CachedDataset(SyntheticTVQADataset(cfg, 4, mode="valid"))
        base = DataPipeline(ds, cfg, mesh=None, batch_size=4)
        dedup = DataPipeline(ds, cfg, mesh=None, batch_size=4,
                             video_dedup=True)
        for (ab, _, _), (ad, _, _) in zip(base, dedup):
            ad = {k: np.asarray(v) for k, v in ad.items()}
            assert ad["vid_u"].shape[0] == 4
            np.testing.assert_array_equal(ad["vid_u"][ad["ex_vid"]],
                                          np.asarray(ab["vid"]))

    def test_grouped_stacks_key_on_u(self, tmp_path):
        """Batches with different U buckets must not stack into one
        dispatch (shapes differ)."""
        cfg = small_cfg(tmp_path, video_buckets=[1, 4])
        base = SyntheticTVQADataset(cfg, 8, mode="valid")
        # first batch: one shared clip (U bucket 1); second: all distinct
        ex = [dict(base[i]) for i in range(8)]
        for i in range(4):
            for k in SharedVideoDataset._VIDEO_FIELDS:
                ex[i][k] = ex[0][k]

        class L:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return ex[i]

        pipe = DataPipeline(L(), cfg, mesh=None, batch_size=4, group=2,
                            video_dedup=True)
        us = sorted(np.asarray(a["vid_u"]).shape[-4] for a, _, _ in pipe)
        assert us == [1, 4], us


class TestInferenceUnchanged:
    @pytest.mark.slow
    def test_predictions_identical(self, tmp_path):
        """Full InferenceRunner (grounding on, scan-stacked dispatch):
        video dedup changes bytes shipped, not predictions."""
        from tvqaplus_tpu.infer.predict import InferenceRunner
        from tvqaplus_tpu.models.stage import STAGE, ModelConfig
        import jax

        cfg = small_cfg(tmp_path, eval_steps_per_dispatch=2,
                        video_buckets=[2, 3])
        ds = shared_ds(cfg, n=12, qas_per_video=3)
        model = STAGE(ModelConfig.from_config(cfg))
        spec = StaticShapeSpec.from_config(cfg, batch=4, max_img=6)
        arrays, _ = collate_static([ds[i] for i in range(4)], spec)
        params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                            train=False)["params"]
        obj_ids = list(range(3, 1000, 7))
        base = InferenceRunner(cfg, model, params).run(
            ds, mode="valid", object_word_ids=obj_ids)
        cfg.video_dedup = True
        got = InferenceRunner(cfg, model, params).run(
            ds, mode="valid", object_word_ids=obj_ids)
        assert got["ts_answer"] == base["ts_answer"]
        assert len(got["raw_bbox"]) == len(base["raw_bbox"])
        for gb, bb in zip(got["raw_bbox"], base["raw_bbox"]):
            assert gb.keys() == bb.keys()
            for a in gb:
                assert len(gb[a]) == len(bb[a])
                for gr, br in zip(gb[a], bb[a]):
                    assert {k: v for k, v in gr.items() if k != "pred"} \
                        == {k: v for k, v in br.items() if k != "pred"}
                    np.testing.assert_allclose(gr["pred"], br["pred"],
                                               rtol=1e-5, atol=1e-6)
