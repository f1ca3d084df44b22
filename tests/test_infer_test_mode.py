"""Test-split inference (the codalab submission flow, reference
README.md:85: `--mode test` -> test_inference_predictions.json with no
ground-truth answers available)."""
import numpy as np

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.infer.predict import InferenceRunner
from tvqaplus_tpu.models.stage import STAGE, ModelConfig


def test_test_mode_inference_produces_predictions(tmp_path):
    import jax
    cfg = Config(bsz=4, test_bsz=4, hsz=16, embedding_size=24, vfeat_size=12,
                 max_qa_l=10, max_sub_l=8, max_num_img=6, num_region=5,
                 img_buckets=[6], max_q_l=4, max_a_l=4, synthetic_data=True,
                 results_dir_base=str(tmp_path))
    cfg.finalize(save=False)
    ds = SyntheticTVQADataset(cfg, 10, mode="test")
    model = STAGE(ModelConfig.from_config(cfg))
    from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
    spec = StaticShapeSpec.from_config(cfg, batch=4, max_img=6)
    arrays, _ = collate_static([ds[i] for i in range(4)], spec)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        train=False)["params"]

    runner = InferenceRunner(cfg, model, params)
    preds = runner.run(ds, mode="test",
                       object_word_ids=list(range(3, 900, 11)))
    assert len(preds["ts_answer"]) == 10        # every qid answered
    for ts, a in preds["ts_answer"].values():
        assert 0 <= a <= 4                      # argmax answer, not GT(999)
        assert len(ts) == 2 and ts[0] <= ts[1] + 1e-6
    assert len(preds["raw_bbox"]) > 0           # grounding records emitted


def test_grounding_pass_compiles_once_per_bucket(tmp_path):
    """The dataset-level max_annotated_frames precompute fixes f_max per Li
    bucket, so a full-split grounding pass triggers exactly ONE infer_step
    jit variant per bucket (each compile is ~60 s through the axon
    remote-compile tunnel)."""
    import jax
    cfg = Config(bsz=4, test_bsz=4, hsz=16, embedding_size=24, vfeat_size=12,
                 max_qa_l=10, max_sub_l=8, max_num_img=6, num_region=5,
                 img_buckets=[6], max_q_l=4, max_a_l=4, synthetic_data=True,
                 results_dir_base=str(tmp_path))
    cfg.finalize(save=False)
    ds = SyntheticTVQADataset(cfg, 12, mode="test")
    assert ds.max_annotated_frames() == 6
    model = STAGE(ModelConfig.from_config(cfg))
    from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
    spec = StaticShapeSpec.from_config(cfg, batch=4, max_img=6)
    arrays, _ = collate_static([ds[i] for i in range(4)], spec)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        train=False)["params"]

    runner = InferenceRunner(cfg, model, params)
    runner.run(ds, mode="test", object_word_ids=list(range(3, 900, 11)))
    n_buckets = 1                                # img_buckets=[6]
    variants = (runner._infer_step._cache_size()
                + runner._infer_scan._cache_size())
    assert variants == n_buckets, (
        f"expected one jit variant per Li bucket, got {variants}")
