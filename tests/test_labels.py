"""Tests for attention-label construction and vocabulary."""
import numpy as np

from tvqaplus_tpu.data.labels import (
    Vocabulary,
    build_iou_data,
    densify_att_labels,
    iou_single_gt_box,
    make_att_label,
)
from tvqaplus_tpu.utils.misc import compute_iou_xyxy


def test_iou_plus_one_convention():
    # identical 10x10 boxes: inter = 11*11 = 121, union = 100+100-121 = 79
    box = [0, 0, 10, 10]
    assert abs(compute_iou_xyxy(box, box) - 121.0 / 79.0) < 1e-9
    # disjoint
    assert compute_iou_xyxy([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0


def test_iou_single_gt_box():
    gt = {"left": 0, "top": 0, "width": 10, "height": 10}
    dets = [[0, 0, 10, 10], [100, 100, 110, 110]]
    ious = iou_single_gt_box(gt, dets)
    assert ious[0] > 1.0 and ious[1] == 0.0


def _mk_iou_data():
    gt_boxes = {
        "3": [{"label": "Sheldon", "left": 0, "top": 0, "width": 10,
               "height": 10}],
        "9": [{"label": "laptop", "left": 5, "top": 5, "width": 10,
               "height": 10}],
    }
    detected = [[[0, 0, 10, 10], [50, 50, 60, 60]] for _ in range(10)]
    return build_iou_data(gt_boxes, detected, frm_cnt=10)


def test_build_iou_data():
    iou_data = _mk_iou_data()
    assert set(iou_data.keys()) == {"3", "9"}
    rec = iou_data["3"][0]
    assert rec["label"] == "Sheldon"
    assert rec["iou"][0] > 0.5 and rec["iou"][1] == 0.0


def test_make_att_label_matches_word_and_iou():
    iou_data = _mk_iou_data()
    # word 'sheldon' at position 1 matches the img-3 GT label (case folded)
    q_ca = "where sheldon sits <eos>"
    labels = make_att_label(iou_data, q_ca, region_cnts=[2, 2], ca_len=4)
    assert len(labels) == 2
    # image 3: word index 1 ("sheldon") -> region 0 positive, normalized
    np.testing.assert_allclose(labels[0][1], [1.0, 0.0])
    # no other word marked; <eos> slot (index 3) never marked
    assert labels[0][[0, 2, 3]].sum() == 0
    # image 9: 'laptop' not in sentence -> all zeros
    assert labels[1].sum() == 0


def test_make_att_label_normalizes_multiple_hits():
    gt_boxes = {"3": [
        {"label": "cup", "left": 0, "top": 0, "width": 10, "height": 10},
    ]}
    # two detected boxes both overlapping the GT above threshold
    detected = [[[0, 0, 10, 10], [1, 1, 11, 11]] for _ in range(5)]
    iou_data = build_iou_data(gt_boxes, detected, frm_cnt=5)
    labels = make_att_label(iou_data, "the cup <eos>", [2], ca_len=3)
    np.testing.assert_allclose(labels[0][1], [0.5, 0.5])


def test_make_att_label_single_box_mode():
    gt_boxes = {"3": [
        {"label": "cup", "left": 0, "top": 0, "width": 10, "height": 10},
    ]}
    detected = [[[0, 0, 10, 10], [1, 1, 11, 11]] for _ in range(5)]
    iou_data = build_iou_data(gt_boxes, detected, frm_cnt=5)
    labels = make_att_label(iou_data, "the cup <eos>", [2], ca_len=3,
                            single_box=True)
    assert labels[0][1].sum() == 1.0  # exactly one region marked


def test_densify_att_labels():
    ragged = [np.ones((3, 2), np.float32) * 0.5, np.zeros((3, 4), np.float32)]
    dense, defined = densify_att_labels(ragged, anno_st_idx=2, num_img=6,
                                        num_words=5, num_region=4)
    assert dense.shape == (6, 5, 4)
    np.testing.assert_allclose(dense[2, :3, :2], 0.5)
    assert defined[2, :3, :2].all() and not defined[2, :3, 2:].any()
    assert defined[3, :3, :4].all()
    assert not defined[[0, 1, 4, 5]].any()


def test_vocabulary_build_and_numericalize(tmp_path):
    sents = ["the cat sat", "the cat ran", "a dog"]
    vocab = Vocabulary.build(sents, word_count_threshold=2)
    assert "the" in vocab and "cat" in vocab
    assert "dog" not in vocab  # below threshold
    ids = vocab.numericalize("the cat flew", eos=True)
    assert ids[0] == vocab.get("the")
    assert ids[2] == 1  # <unk>
    assert ids[3] == 2  # <eos>
    # round-trip
    p = tmp_path / "w2i.json"
    vocab.save(str(p))
    vocab2 = Vocabulary.load(str(p))
    assert vocab2.word2idx == vocab.word2idx


def test_vocabulary_hier_vcpt():
    vocab = Vocabulary.build(["tennis court ball"], word_count_threshold=1)
    ids = vocab.numericalize_hier_vcpt([["tennis court", "ball"]])
    assert ids == [[vocab.get("court"), vocab.get("ball")]]


def test_vocabulary_vcpt_dedup():
    vocab = Vocabulary.build(["red cup blue cup"], word_count_threshold=1)
    ids = vocab.numericalize_vcpt("red cup, blue cup, red cup")
    words = ["red", "cup", "blue", "cup"]
    assert ids == [vocab.get(w) for w in words] + [2]
