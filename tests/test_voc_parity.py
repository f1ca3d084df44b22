"""Detection-AP parity against the reference's own evaluator code.

Runs random prediction/GT sets through BOTH our numpy VOC implementation and
the reference's calc_detection_voc_prec_rec / calc_detection_voc_ap (called
directly — the py2-only bits live in the wrappers) and asserts identical
per-class APs.  Skipped without the reference checkout."""
import os
import sys

import numpy as np
import pytest

REF_VOC = "/root/reference/eval/maskrcnn_voc"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_VOC),
                                reason="reference checkout not available")

from tvqaplus_tpu.evaluation.voc import eval_detection_voc  # noqa: E402


def _ref_eval(pred_records, gt_records, iou_thresh=0.5):
    sys.path.insert(0, REF_VOC)
    import voc_eval
    from bounding_box import BoxList

    def to_boxlist(rec, is_gt):
        bl = BoxList(np.asarray(rec["boxes"], np.float64).reshape(-1, 4),
                     (640, 360))
        bl.add_field("labels", np.asarray(rec["labels"]))
        if is_gt:
            bl.add_field("difficult",
                         np.asarray(rec.get("difficult",
                                            np.zeros(len(rec["labels"]),
                                                     bool))))
        else:
            bl.add_field("scores", np.asarray(rec["scores"]))
        return bl

    preds = [to_boxlist(r, False) for r in pred_records]
    gts = [to_boxlist(r, True) for r in gt_records]
    prec, rec, n_tp, n_fp, n_pos = voc_eval.calc_detection_voc_prec_rec(
        gt_boxlists=gts, pred_boxlists=preds, iou_thresh=iou_thresh)
    ap = voc_eval.calc_detection_voc_ap(prec, rec, use_07_metric=False)
    return ap, n_tp, n_fp, n_pos


def _random_records(seed, n_images=8, n_classes=4):
    rng = np.random.default_rng(seed)
    gt_records, pred_records = [], []
    for _ in range(n_images):
        n_gt = int(rng.integers(1, 5))
        gt_boxes = rng.uniform(0, 300, (n_gt, 2))
        gt_boxes = np.concatenate([gt_boxes, gt_boxes + rng.uniform(
            10, 100, (n_gt, 2))], axis=1)
        gt_records.append({
            "boxes": gt_boxes,
            "labels": rng.integers(1, n_classes + 1, n_gt),
            "difficult": np.zeros(n_gt, bool)})
        n_pred = int(rng.integers(1, 7))
        # mix: some jittered GT copies, some random
        pred_boxes = []
        for j in range(n_pred):
            if j < n_gt and rng.random() < 0.6:
                pred_boxes.append(gt_boxes[j] + rng.uniform(-8, 8, 4))
            else:
                b = rng.uniform(0, 300, 2)
                pred_boxes.append(np.concatenate(
                    [b, b + rng.uniform(10, 100, 2)]))
        pred_records.append({
            "boxes": np.asarray(pred_boxes),
            "labels": rng.integers(1, n_classes + 1, n_pred),
            "scores": rng.random(n_pred)})
    return pred_records, gt_records


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_ap_matches_reference_evaluator(seed):
    pred_records, gt_records = _random_records(seed)
    per_class, m_ap = eval_detection_voc(pred_records, gt_records)
    ref_ap, ref_tp, ref_fp, ref_pos = _ref_eval(pred_records, gt_records)
    ours = {m["class_id"]: m for m in per_class}
    assert set(ours.keys()) == set(int(k) for k in ref_ap.keys())
    for cls, ref_val in ref_ap.items():
        m = ours[int(cls)]
        if np.isnan(ref_val):
            assert np.isnan(m["ap"])
        else:
            np.testing.assert_allclose(m["ap"], ref_val, rtol=1e-12,
                                       err_msg=f"class {cls}")
        assert m["n_tp"] == int(ref_tp[cls])
        assert m["n_fp"] == int(ref_fp[cls])
        assert m["n_positives"] == int(ref_pos[cls])
