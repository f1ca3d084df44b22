"""Byte-level prediction-JSON equivalence against the reference inference
machinery (VERDICT r1 missing #4 / next #6; SURVEY §6 north star).

Transplants our flax weights into the actual reference PyTorch STAGE, runs

* OUR path:  InferenceRunner.run -> predictions dict
  (tvqaplus_tpu/infer/predict.py)
* REF path:  the reference ``inference()`` loop (inference.py:38-75) over the
  same batches — reference model forward in inference_mode (which calls its
  own ``get_att_prediction``, stage.py:748-806), the reference's host
  ``find_max_pair`` (inference.py:13-35), and the reference's exact
  time-offset math (inference.py:68-72)

and asserts the two serialized JSON payloads are IDENTICAL bytes after
float canonicalization (scores pass through torch f32 on one side and jax
f32 on the other; ~1e-6 relative wobble in cosine scores is numerical, not
semantic — span indices, box lists, record order, key order and structure
must match exactly).
"""
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference checkout not available")


def _cfg(tmp_path):
    from tvqaplus_tpu.config import Config
    cfg = Config(bsz=4, test_bsz=4, hsz=16, embedding_size=24, vfeat_size=12,
                 max_qa_l=10, max_sub_l=8, max_num_img=6, num_region=5,
                 img_buckets=[6], max_q_l=4, max_a_l=4, use_sup_att=True,
                 add_local=True, synthetic_data=True,
                 results_dir_base=str(tmp_path / "results"))
    cfg.finalize(save=False)
    return cfg


def _ref_model(cfg, flax_params, model_cfg):
    import torch
    from types import SimpleNamespace
    sys.path.insert(0, os.path.join(REF, "model"))
    sys.path.insert(0, REF)
    import importlib
    stage_mod = importlib.import_module("stage")
    opt = SimpleNamespace(
        sub_flag=True, vfeat_flag=True, vfeat_size=cfg.vfeat_size, t_iter=0,
        extra_span_length=3, add_local=cfg.add_local, use_sup_att=False,
        num_negatives=2, negative_pool_size=0, num_hard=2, drop_topk=0,
        margin=0.1, att_loss_type="lse", scale=10.0, alpha=20.0,
        dropout=0.1, hsz=cfg.hsz, embedding_size=cfg.embedding_size,
        input_encoder_n_blocks=1, input_encoder_n_conv=2,
        input_encoder_kernel_size=7, input_encoder_n_heads=0,
        cls_encoder_n_blocks=1, cls_encoder_n_conv=2,
        cls_encoder_kernel_size=5, cls_encoder_n_heads=0,
        add_non_visual=False,
    )
    tmodel = stage_mod.STAGE(opt)
    tmodel.eval()
    tmodel.inference_mode = True
    from tvqaplus_tpu.interop.torch_weights import flax_to_torch_state_dict
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(flax_params, model_cfg).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert all("position_encoding.pe" in k for k in missing), missing
    assert not unexpected, unexpected
    return tmodel


class _EDict(dict):
    """Attribute + item access, like the reference's easydict batches."""
    __getattr__ = dict.__getitem__


def _torch_batch(arrays, meta, object_word_ids):
    import torch
    a = {k: np.ascontiguousarray(v) for k, v in arrays.items()}
    if "sub_bert" not in a:  # dedup contract -> reference's expanded layout
        from tvqaplus_tpu.data.batching import expand_sub_windows
        a["sub_bert"] = np.ascontiguousarray(expand_sub_windows(a))
    return _EDict(
        qid=list(meta["qid"]),
        vid_name=list(meta["vid_name"]),
        qas=torch.from_numpy(a["qas"].astype(np.int64)),
        qas_mask=torch.from_numpy(a["qas_mask"]),
        qas_bert=torch.from_numpy(a["qas_bert"]),
        sub_bert=torch.from_numpy(a["sub_bert"]),
        sub_mask=torch.from_numpy(a["sub_mask"]),
        vid=torch.from_numpy(a["vid"]),
        vid_mask=torch.from_numpy(a["vid_mask"]),
        target=torch.from_numpy(a["target"].astype(np.int64)),
        ts_label={"st": torch.from_numpy(a["ts_st"].astype(np.int64)),
                  "ed": torch.from_numpy(a["ts_ed"].astype(np.int64))},
        ts_label_mask=torch.from_numpy(a["ts_mask"]),
        q_l=[int(x) for x in a["q_l"]],
        anno_st_idx=[int(x) for x in a["anno_st"]],
        image_indices=list(meta["image_indices"]),
        boxes=list(meta["boxes"]),
        use_hard_negatives=False,
        eval_object_word_ids=object_word_ids,
    )


def _reference_inference(cfg, tmodel, pipeline, object_word_ids):
    """The reference ``inference()`` loop (inference.py:38-75) verbatim,
    minus the DataLoader plumbing: reference model forward (inference_mode),
    reference find_max_pair, reference offset math."""
    import jax
    import types
    sys.path.insert(0, REF)
    if "easydict" not in sys.modules:  # stub the py2-era dep of the
        ed = types.ModuleType("easydict")  # reference's dataset import chain

        class EasyDict(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    # Load the reference's inference.py under a unique module name:
    # test_cli_e2e.py imports OUR repo-root inference.py as "inference",
    # so a plain `from inference import ...` here would hit the wrong
    # module when the full suite runs in one process.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ref_inference", os.path.join(REF, "inference.py"))
    ref_inference = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_inference)
    find_max_pair = ref_inference.find_max_pair  # the ref's own host scan

    predictions = dict(ts_answer={}, raw_bbox=[])
    for arrays, meta, _ in pipeline:
        arrays = {k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
        n = int(arrays["ex_mask"].sum())
        arrays = {k: v[:n] for k, v in arrays.items()}
        meta = {k: v[:n] for k, v in meta.items()}
        model_inputs = _torch_batch(arrays, meta, object_word_ids)
        inference_outputs = tmodel(model_inputs)
        pred_ids = inference_outputs["answer"].data.max(1)[1]
        if inference_outputs["att_predictions"]:
            predictions["raw_bbox"] += inference_outputs["att_predictions"]
        temporal_predictions = inference_outputs["t_scores"]
        for qid, pred_a_idx, t_st, t_ed, img_indices in zip(
                model_inputs["qid"], pred_ids.tolist(),
                temporal_predictions[:, :, :, 0],
                temporal_predictions[:, :, :, 1],
                model_inputs["image_indices"]):
            offset = (img_indices[0] % 6) / 3
            (st, ed), _ = find_max_pair(
                t_st[pred_a_idx].cpu().numpy().tolist(),
                t_ed[pred_a_idx].cpu().numpy().tolist())
            predictions["ts_answer"][str(qid)] = [
                [st * 2 + offset, (ed + 1) * 2 + offset], int(pred_a_idx)]
    return predictions


def _adopt_ref_floats(ours, ref, tol=1e-4):
    """Return `ours` with every float leaf replaced by the structurally
    corresponding `ref` float IFF within `tol` (f32 noise between the torch
    and jax pipelines); mismatching floats, and every non-float leaf, are
    kept as-is so the final byte comparison fails loudly on any structural,
    ordering, integer or out-of-tolerance difference."""
    if isinstance(ours, float) and isinstance(ref, (int, float)):
        return float(ref) if abs(ours - ref) <= tol else ours
    if isinstance(ours, list) and isinstance(ref, list):
        return [_adopt_ref_floats(o, r, tol)
                for o, r in zip(ours, ref)] + ours[len(ref):]
    if isinstance(ours, dict) and isinstance(ref, dict):
        return {k: _adopt_ref_floats(v, ref[k], tol) if k in ref else v
                for k, v in ours.items()}
    return ours


@pytest.mark.slow
def test_prediction_json_bytes_match_reference(tmp_path):
    import torch
    import jax
    from tvqaplus_tpu.data.batching import ATT_KEYS
    from tvqaplus_tpu.data.pipeline import DataPipeline
    from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
    from tvqaplus_tpu.infer.predict import InferenceRunner
    from tvqaplus_tpu.models.stage import STAGE, ModelConfig

    cfg = _cfg(tmp_path)
    ds = SyntheticTVQADataset(cfg, 10, mode="valid")  # 3 batches, ragged tail
    model = STAGE(ModelConfig.from_config(cfg))

    # init on one real batch
    pipe0 = DataPipeline(ds, cfg, mesh=None, batch_size=cfg.test_bsz)
    batch0, _, _ = next(iter(pipe0))
    params = model.init({"params": jax.random.PRNGKey(0)}, batch0,
                        train=False)["params"]

    object_word_ids = list(range(3, 1000, 7))  # plenty of qas ids match
    runner = InferenceRunner(cfg, model, params)
    ours = runner.run(ds, mode="valid", object_word_ids=object_word_ids)

    tmodel = _ref_model(cfg, params, model.cfg)
    ref_pipe = DataPipeline(ds, cfg, mesh=None, batch_size=cfg.test_bsz,
                            exclude_keys=ATT_KEYS)
    with torch.no_grad():
        ref = _reference_inference(cfg, tmodel, ref_pipe,
                                   set(object_word_ids))

    # some grounding records must actually exist for this to mean anything
    assert ref["raw_bbox"] and any(
        rec["pred"] for d in ref["raw_bbox"] for rec in d[0] + d[1] + d[2]
        + d[3] + d[4])
    assert set(ours["ts_answer"]) == set(ref["ts_answer"])

    ours_s = json.dumps(_adopt_ref_floats(ours, ref), sort_keys=True)
    ref_s = json.dumps(ref, sort_keys=True)
    assert ours_s == ref_s
