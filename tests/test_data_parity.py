"""Fuzz-parity of the data-semantics helpers against the reference code.

These helpers (0.5 fps grid, ts labels, subtitle alignment, IoU attention
labels) encode most of the dataset correctness risk (SURVEY.md §7 step 1);
here they are fuzzed directly against the reference implementations imported
from the read-only checkout.  Skipped without the checkout."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF)
    # stub easydict (not installed) before importing the reference dataset
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    import utils as ref_utils
    import tvqa_dataset as ref_ds
    return types.SimpleNamespace(utils=ref_utils, ds=ref_ds)


def test_get_all_img_ids_fuzz(ref):
    from tvqaplus_tpu.data.sampling import get_all_img_ids
    rng = np.random.default_rng(0)
    for _ in range(300):
        num_imgs = int(rng.integers(10, 400))
        start = int(rng.integers(1, max(2, min(num_imgs, 300) - 6)))
        # annotated ids share the grid phase in real data
        end = start + 6 * int(rng.integers(0, 40))
        ref_idx, ref_s, ref_e = ref.utils.get_all_img_ids(
            start, end, num_imgs, frame_interval=6)
        ours_idx, ours_s, ours_e = get_all_img_ids(start, end, num_imgs)
        assert list(ref_idx) == ours_idx
        assert (ref_s, ref_e) == (ours_s, ours_e)


def test_get_ts_label_fuzz(ref):
    from tvqaplus_tpu.data.sampling import get_all_img_ids, get_ts_label
    rng = np.random.default_rng(1)
    for _ in range(300):
        num_imgs = int(rng.integers(20, 500))
        start = int(rng.integers(1, 7))
        indices, _, _ = get_all_img_ids(start, start, num_imgs)
        indices0 = np.array(indices) - 1
        st = float(rng.uniform(0, num_imgs / 3))
        ed = st + float(rng.uniform(0, 30))
        ref_label = ref.ds.TVQADataset.get_ts_label(st, ed, num_imgs,
                                                    indices0, fps=3)
        ours = get_ts_label(st, ed, num_imgs, indices0)
        assert ref_label == ours, (st, ed, num_imgs)


def test_find_match_fuzz(ref):
    from tvqaplus_tpu.data.sampling import find_match
    rng = np.random.default_rng(2)
    for _ in range(200):
        n = int(rng.integers(2, 15))
        subtime = np.sort(rng.uniform(0, 90, n))
        value = float(rng.uniform(-2, 95))
        for mode in ("nearest", "span", "larger"):
            assert (ref.ds.TVQADataset.find_match(subtime, value, mode=mode)
                    == find_match(subtime, value, mode=mode)), (mode, value)


def test_aligned_sub_indices_fuzz(ref):
    from tvqaplus_tpu.data.sampling import get_aligned_sub_indices
    rng = np.random.default_rng(3)
    words = ["the", "spot", "is", "mine", "bazinga"]
    for _ in range(50):
        n_sent = int(rng.integers(1, 8))
        sentences = [" ".join(rng.choice(words, rng.integers(1, 6)))
                     for _ in range(n_sent)]
        subtext = " <eos> ".join(sentences)
        subtime = np.sort(rng.uniform(0, 60, n_sent)).tolist()
        img_ids = (np.arange(1, 60, 6)).tolist()
        for mode in ("nearest", "larger"):
            ref_idx, ref_tok = ref.ds.TVQADataset.get_aligned_sub_indices(
                img_ids, subtext, subtime, mode=mode)
            ours_idx, ours_tok = get_aligned_sub_indices(
                img_ids, subtext, subtime, mode=mode)
            assert ref_idx == ours_idx and ref_tok == ours_tok


def test_compute_iou_fuzz(ref):
    from tvqaplus_tpu.utils.misc import compute_iou_xyxy
    rng = np.random.default_rng(4)
    for _ in range(500):
        a = rng.uniform(0, 200, 2)
        b = rng.uniform(0, 200, 2)
        box1 = [*a, *(a + rng.uniform(1, 120, 2))]
        box2 = [*b, *(b + rng.uniform(1, 120, 2))]
        assert abs(ref.utils.computeIoU(box1, box2)
                   - compute_iou_xyxy(box1, box2)) < 1e-12


def test_mk_att_label_fuzz(ref):
    """IoU data + attention-label construction, end to end."""
    import torch
    from tvqaplus_tpu.data.labels import build_iou_data, make_att_label
    rng = np.random.default_rng(5)
    labels_vocab = ["cup", "laptop", "book", "couch"]
    for trial in range(30):
        frm_cnt = int(rng.integers(15, 60))
        n_anno = int(rng.integers(1, 5))
        img_ids = sorted(rng.choice(np.arange(1, frm_cnt), n_anno,
                                    replace=False).tolist())
        gt_box_data = {}
        for i in img_ids:
            boxes = []
            for _ in range(int(rng.integers(1, 4))):
                l, t = rng.uniform(0, 500, 2)
                boxes.append({"label": str(rng.choice(labels_vocab)),
                              "left": float(l), "top": float(t),
                              "width": float(rng.uniform(10, 140)),
                              "height": float(rng.uniform(10, 140))})
            gt_box_data[str(i)] = boxes
        detected = []
        counts = []
        for _ in range(frm_cnt):
            c = int(rng.integers(2, 8))
            counts.append(c)
            frame = []
            for _ in range(c):
                x, y = rng.uniform(0, 500, 2)
                frame.append([float(x), float(y),
                              float(x + rng.uniform(10, 150)),
                              float(y + rng.uniform(10, 150))])
            detected.append(frame)
        meta = {"boxes": detected}

        ref_iou = ref.ds.TVQADataset.get_iou_data(
            ref.ds.TVQADataset, gt_box_data, meta, frm_cnt)
        ours_iou = build_iou_data(gt_box_data, detected, frm_cnt)
        assert set(ref_iou.keys()) == set(ours_iou.keys())
        for k in ref_iou:
            for r_rec, o_rec in zip(ref_iou[k], ours_iou[k]):
                assert r_rec["label"] == o_rec["label"]
                np.testing.assert_allclose(r_rec["iou"], o_rec["iou"],
                                           rtol=1e-9)

        sentence = "where is the cup on the couch <eos>"
        region_cnts = [min(counts[int(k) - 1], 6)
                       for k in sorted(ref_iou.keys(), key=int)]
        ca_len = len(sentence.split())
        ref_lab = ref.ds.TVQADataset.mk_att_label(
            ref_iou, sentence, region_cnts, ca_len, iou_thd=0.5)
        ours_lab = make_att_label(ours_iou, sentence, region_cnts, ca_len,
                                  iou_thd=0.5)
        assert len(ref_lab) == len(ours_lab)
        for r, o in zip(ref_lab, ours_lab):
            np.testing.assert_allclose(r.numpy(), o, rtol=1e-6, atol=1e-9)


def test_dissect_by_lengths_fuzz(ref):
    from tvqaplus_tpu.utils.misc import dissect_by_lengths
    rng = np.random.default_rng(6)
    for _ in range(50):
        lens = rng.integers(1, 9, int(rng.integers(1, 6))).tolist()
        arr = rng.standard_normal((sum(lens), 4))
        ref_chunks = ref.utils.dissect_by_lengths(arr, lens)
        ours_chunks = dissect_by_lengths(arr, lens)
        for a, b in zip(ref_chunks, ours_chunks):
            np.testing.assert_array_equal(a, b)


def test_mk_noun_mask_fuzz(ref):
    """make_noun_mask vs the reference's TVQADataset.mk_noun_mask
    (tvqa_dataset.py:310-328), including OOV dropping and the eos slot."""
    import types as _types
    from tvqaplus_tpu.data.labels import make_noun_mask

    vocab_words = ["cup", "couch", "sheldon", "table", "door"]
    fake_self = _types.SimpleNamespace(
        word2idx={w: i for i, w in enumerate(vocab_words)})
    oov = ["zzzq", "blorp"]
    rng = np.random.default_rng(7)
    for _ in range(200):
        q_l = int(rng.integers(2, 12))
        a_l = int(rng.integers(1, 8))
        eos = bool(rng.integers(0, 2))

        def draw(n_max, limit):
            out = []
            for _ in range(int(rng.integers(0, n_max))):
                pos = int(rng.integers(1, limit + 1))
                word = (vocab_words + oov)[int(rng.integers(0, 7))]
                out.append([pos, word.upper() if rng.integers(0, 2)
                            else word])
            return out

        nq, na = draw(4, q_l), draw(3, a_l)
        ref_mask = ref.ds.TVQADataset.mk_noun_mask(
            fake_self, nq, na, q_l, a_l, eos=eos)
        ours = make_noun_mask(nq, na, q_l, a_l,
                              fake_self.word2idx, eos=eos)
        np.testing.assert_array_equal(np.asarray(ref_mask), ours)
