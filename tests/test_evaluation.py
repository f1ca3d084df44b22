"""Evaluator tests: unit oracles + the reference's GT-self-check golden test
(feeding the ground truth as a prediction must score ~1.0 everywhere,
reference eval/readme.txt:13-17)."""
import os

import numpy as np
import pytest

from tvqaplus_tpu.evaluation.boxes import Boxes, pairwise_iou
from tvqaplus_tpu.evaluation.tvqa_metrics import (
    clean_label,
    compute_att_metrics,
    compute_temporal_iou,
    compute_temporal_metrics,
    load_tvqa_plus_annotation,
)
from tvqaplus_tpu.evaluation.voc import eval_detection_voc

EVAL_DATA = os.path.join(os.path.dirname(__file__), "..", "eval_data")
VAL_JSON = os.path.join(EVAL_DATA, "tvqa_plus_val.json")
W2I_JSON = os.path.join(EVAL_DATA, "word2idx.json")


def test_pairwise_iou_plus_one():
    a = Boxes([[0, 0, 9, 9]], (640, 360))
    b = Boxes([[0, 0, 9, 9], [100, 100, 109, 109]], (640, 360))
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 0.0)
    # half overlap: boxes [0,0,9,9] vs [5,0,14,9]: inter 5x10, areas 100 each
    c = Boxes([[5, 0, 14, 9]], (640, 360))
    np.testing.assert_allclose(pairwise_iou(a, c)[0, 0], 50.0 / 150.0)


def test_boxes_convert_roundtrip():
    b = Boxes([[10, 20, 19, 39]], (640, 360), mode="xyxy")
    xywh = b.convert("xywh")
    np.testing.assert_allclose(xywh.bbox[0], [10, 20, 10, 20])
    back = xywh.convert("xyxy")
    np.testing.assert_allclose(back.bbox, b.bbox)


def test_boxes_resize_and_area():
    b = Boxes([[0, 0, 9, 9]], (100, 100))
    assert float(b.area()[0]) == 100.0
    r = b.resize((200, 200))
    np.testing.assert_allclose(r.bbox[0], [0, 0, 18, 18])


def test_boxes_transpose_flips():
    from tvqaplus_tpu.evaluation.boxes import FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM
    b = Boxes([[10, 20, 29, 49]], (640, 360), mode="xyxy")
    b.add_field("labels", [3])
    lr = b.transpose(FLIP_LEFT_RIGHT)
    np.testing.assert_allclose(lr.bbox[0], [640 - 29 - 1, 20,
                                            640 - 10 - 1, 49])
    tb = b.transpose(FLIP_TOP_BOTTOM)
    np.testing.assert_allclose(tb.bbox[0], [10, 360 - 49, 29, 360 - 20])
    assert lr.get_field("labels")[0] == 3
    # involution: flipping twice is identity (up to the +1 convention)
    np.testing.assert_allclose(lr.transpose(FLIP_LEFT_RIGHT).bbox, b.bbox)
    with pytest.raises(NotImplementedError):
        b.transpose(2)  # rotations unsupported, like the reference
    # mode is preserved through the flip
    xywh = b.convert("xywh").transpose(FLIP_LEFT_RIGHT)
    assert xywh.mode == "xywh"
    np.testing.assert_allclose(xywh.convert("xyxy").bbox, lr.bbox)


def test_boxes_crop_window():
    b = Boxes([[10, 20, 29, 49], [100, 200, 129, 249]], (640, 360))
    b.add_field("labels", [1, 2])
    c = b.crop((5, 15, 50, 60))  # 45x45 window
    assert c.size == (45, 45)
    np.testing.assert_allclose(c.bbox[0], [5, 5, 24, 34])
    np.testing.assert_allclose(c.bbox[1], [45, 45, 45, 45])  # clamped out
    assert list(c.get_field("labels")) == [1, 2]


@pytest.mark.skipif(not os.path.isdir("/root/reference/eval/maskrcnn_voc"),
                    reason="reference checkout not available")
def test_boxes_transpose_crop_parity_vs_reference():
    """transpose/crop match the reference BoxList bit-for-bit
    (bounding_box.py:150-229) on random boxes in both modes."""
    import sys
    sys.path.insert(0, "/root/reference/eval/maskrcnn_voc")
    from bounding_box import BoxList, FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM
    from tvqaplus_tpu.evaluation import boxes as ours
    rng = np.random.default_rng(0)
    for mode in ("xyxy", "xywh"):
        raw = np.sort(rng.uniform(0, 300, size=(8, 4)), axis=1)
        if mode == "xywh":
            raw[:, 2:] = rng.uniform(1, 50, size=(8, 2))
        ref = BoxList(raw.copy(), (640, 360), mode=mode)
        got = ours.Boxes(raw.copy(), (640, 360), mode=mode)
        for method in (FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM):
            np.testing.assert_allclose(got.transpose(method).bbox,
                                       ref.transpose(method).bbox,
                                       rtol=1e-6, atol=1e-4)
        window = (20, 30, 200, 150)
        np.testing.assert_allclose(got.crop(window).bbox,
                                   ref.crop(window).bbox,
                                   rtol=1e-6, atol=1e-4)
        assert got.crop(window).size == tuple(ref.crop(window).size)


def test_voc_eval_perfect_predictions():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
           "labels": np.array([1, 2]),
           "difficult": np.zeros(2, bool)}]
    pred = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
             "labels": np.array([1, 2]),
             "scores": np.array([0.9, 0.8])}]
    per_class, m_ap = eval_detection_voc(pred, gt)
    assert m_ap == 1.0


def test_voc_eval_greedy_double_match_is_fp():
    gt = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1]),
           "difficult": np.zeros(1, bool)}]
    pred = [{"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]]),
             "labels": np.array([1, 1]), "scores": np.array([0.9, 0.8])}]
    per_class, m_ap = eval_detection_voc(pred, gt)
    rec = per_class[0]
    assert rec["n_tp"] == 1 and rec["n_fp"] == 1
    assert rec["ap"] == 1.0  # recall 1 reached at precision 1


def test_voc_eval_miss_is_fp():
    gt = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1]),
           "difficult": np.zeros(1, bool)}]
    pred = [{"boxes": np.array([[100, 100, 110, 110]]),
             "labels": np.array([1]), "scores": np.array([0.9])}]
    per_class, m_ap = eval_detection_voc(pred, gt)
    assert per_class[0]["n_tp"] == 0 and m_ap == 0.0


def test_temporal_metrics_basics():
    pred = {"1": [[0.0, 2.0], 0], "2": [[5.0, 10.0], 1]}
    gt = {1: [[0.0, 2.0], 0], 2: [[0.0, 10.0], 0]}
    res = compute_temporal_metrics(pred, gt)
    assert res["qa_acc"] == 0.5
    assert abs(res["miou"] - (1.0 + 0.5) / 2) < 1e-9
    assert res["R@0.50"] == 1.0
    assert res["R@0.90"] == 0.5
    assert res["ans_span_joint_acc@.5"] == 0.5


def test_clean_label():
    assert clean_label("Sheldon’s") == "sheldon's"
    assert clean_label("CUP") == "cup"


@pytest.mark.slow
def test_gt_self_check_on_real_val_set():
    """The reference documents that scoring the GT against itself gives
    QA Acc 1.0 / mAP ~0.999 / mIoU ~0.999 / ASA ~0.999
    (eval/readme.txt:13-17).  Run the full protocol on the real val JSON."""
    from tvqaplus_tpu.utils.io import load_json
    gt = load_tvqa_plus_annotation(VAL_JSON)
    assert len(gt["ts_answer"]) == 3017  # SURVEY.md §6 val size
    word2idx = load_json(W2I_JSON)
    pred = {"ts_answer": {str(k): v for k, v in gt["ts_answer"].items()},
            "bbox": gt["bbox"]}
    temporal = compute_temporal_metrics(pred["ts_answer"], gt["ts_answer"])
    assert temporal["qa_acc"] == 1.0
    assert temporal["miou"] > 0.99
    assert temporal["ans_span_joint_acc@.5"] > 0.99
    bbox = compute_att_metrics(pred["bbox"], gt["bbox"], word2idx)
    assert bbox["overall_map"] > 0.99
