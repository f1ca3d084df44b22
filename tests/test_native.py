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
