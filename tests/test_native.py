"""Native C fast-path vs numpy fallback parity."""
import numpy as np
import pytest

from tvqaplus_tpu import native
from tvqaplus_tpu.utils.misc import compute_iou_xyxy


def test_library_builds():
    assert native.available(), "C toolchain present in image; build must work"


def test_pad_batch_matches_numpy():
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((n, 8)).astype(np.float32)
              for n in (3, 7, 1, 5)]
    out, mask = native.pad_batch(arrays, max_len=5, dim=8)
    # oracle
    o = np.zeros((4, 5, 8), np.float32)
    m = np.zeros((4, 5), np.float32)
    for i, a in enumerate(arrays):
        k = min(len(a), 5)
        o[i, :k] = a[:k]
        m[i, :k] = 1.0
    np.testing.assert_array_equal(out, o)
    np.testing.assert_array_equal(mask, m)


def test_pad_batch_into_preallocated_slice():
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((2, 4)).astype(np.float32)]
    big = np.zeros((3, 2, 6, 4), np.float32)
    mask = np.zeros((3, 2, 6), np.float32)
    native.pad_batch(arrays, 6, 4, out=big[1, :1], mask=mask[1, :1])
    np.testing.assert_array_equal(big[1, 0, :2], arrays[0])
    assert big[0].sum() == 0 and big[2].sum() == 0
    assert mask[1, 0].sum() == 2


def test_iou_one_vs_many_matches_python():
    rng = np.random.default_rng(2)
    gt = [10.0, 20.0, 50.0, 60.0]
    dets = rng.uniform(0, 100, (20, 4))
    dets[:, 2:] = dets[:, :2] + np.abs(dets[:, 2:] - dets[:, :2]) + 1
    native_ious = native.iou_one_vs_many(gt, dets)
    py_ious = [compute_iou_xyxy(gt, d) for d in dets]
    np.testing.assert_allclose(native_ious, py_ious, rtol=1e-12)


def test_pairwise_iou_matches_numpy():
    from tvqaplus_tpu.evaluation.boxes import pairwise_iou as np_pairwise
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 100, (5, 4))
    a[:, 2:] = a[:, :2] + 10
    b = rng.uniform(0, 100, (7, 4))
    b[:, 2:] = b[:, :2] + 10
    nat = native.pairwise_iou(a, b)
    ref = np_pairwise(a, b)
    np.testing.assert_allclose(nat, ref, rtol=1e-12)


def test_att_entries_matches_python():
    """C att_entries vs labels.att_entries_from_dense (the python path it
    replaces in collate_static), including clipping and the cap."""
    from tvqaplus_tpu.data.labels import att_entries_from_dense
    rng = np.random.default_rng(2)
    for _ in range(25):
        sli, slw, slr = (int(rng.integers(1, 9)) for _ in range(3))
        li, lw, lr = (int(rng.integers(2, 9)) for _ in range(3))
        cap = int(rng.integers(1, 20))
        labels = (rng.random((sli, slw, slr)) < 0.15).astype(np.float32)
        defined = (rng.random((sli, slw, slr)) < 0.6).astype(np.float32)
        # python oracle: clip into the spec window, then extract
        dl = np.zeros((li, lw, lr), np.float32)
        dd = np.zeros_like(dl)
        wi, ww, wr = min(sli, li), min(slw, lw), min(slr, lr)
        dl[:wi, :ww, :wr] = labels[:wi, :ww, :wr]
        dd[:wi, :ww, :wr] = defined[:wi, :ww, :wr]
        ref = att_entries_from_dense(dl, dd, cap)
        got = (np.zeros(cap, np.int32), np.zeros(cap, np.float32),
               np.zeros((cap, lr), np.float32), np.zeros(cap, np.int32),
               np.zeros(cap, np.float32))
        n_pos = native.att_entries(labels, defined, (li, lw, lr), cap, *got)
        assert n_pos == ref[5]
        for g, r in zip(got, ref[:5]):
            np.testing.assert_array_equal(g, r.astype(g.dtype))


def test_fill_sub_windows_matches_numpy():
    rng = np.random.default_rng(3)
    for _ in range(25):
        n = int(rng.integers(1, 8))
        ls = int(rng.integers(1, 10))
        n_tok = int(rng.integers(1, 30))
        spans = np.stack([rng.integers(0, 25, n),
                          rng.integers(0, 14, n)], axis=1).astype(np.int64)
        # numpy oracle (batching fallback path)
        ln = np.minimum(spans[:, 1], ls)
        pos = np.arange(ls)
        valid = pos < ln[:, None]
        idx = spans[:, :1] + pos
        ok = valid & (idx < n_tok)
        exp_idx = np.where(ok, idx + 1, 0).astype(np.int32)
        exp_mask = ok.astype(np.float32)
        exp_over = int(valid.sum() - ok.sum())
        win = np.zeros((n, ls), np.int32)
        mask = np.zeros((n, ls), np.float32)
        over = native.fill_sub_windows(spans, ls, n_tok, win, mask)
        assert over == exp_over
        np.testing.assert_array_equal(win, exp_idx)
        np.testing.assert_array_equal(mask, exp_mask)
