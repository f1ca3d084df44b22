"""ctypes loader for the native host-side fast paths (fastops.c).

Compiles the shared library on first import (cached next to the source);
every entry point has a numpy fallback, so the package works without a C
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastops.c")
_LIB = os.path.join(_HERE, "libfastops.so")

_lib = None


def _build():
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                           check=True, capture_output=True)
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.pad_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.iou_xyxy_plus1.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
    lib.pad_batch_2d_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.pairwise_iou_plus1.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p]
    lib.att_entries_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p] + \
        [ctypes.c_int32] * 7 + [ctypes.c_void_p] * 5
    lib.att_entries_f32.restype = ctypes.c_int32
    lib.fill_sub_windows.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.fill_sub_windows.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available():
    return get_lib() is not None


def pad_batch(arrays, max_len, dim, out=None, mask=None):
    """Collate ragged (len_i, dim) f32 arrays into (n, max_len, dim) + mask.

    Native memcpy loop when the library is available; numpy fallback
    otherwise.  ``out``/``mask`` may be preallocated slices.
    """
    n = len(arrays)
    if out is None:
        out = np.zeros((n, max_len, dim), np.float32)
    if mask is None:
        mask = np.zeros((n, max_len), np.float32)
    lib = get_lib()
    contig = [np.ascontiguousarray(a, np.float32) for a in arrays]
    shapes_ok = all(a.ndim == 2 and a.shape[1] == dim for a in contig)
    if (lib is not None and shapes_ok and out.flags.c_contiguous
            and mask.flags.c_contiguous):
        ptrs = (ctypes.c_void_p * n)(
            *[a.ctypes.data for a in contig])
        lens = np.asarray([a.shape[0] for a in contig], np.int32)
        lib.pad_batch_f32(
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, max_len, dim, out.ctypes.data, mask.ctypes.data)
        return out, mask
    for i, a in enumerate(contig):
        k = min(len(a), max_len)
        out[i, :k] = a[:k]
        mask[i, :k] = 1.0
    return out, mask


def iou_one_vs_many(gt_box, det_boxes):
    """IoU (intersection +1 per side, raw areas) of one xyxy box vs (N, 4)
    boxes — the attention-label convention (reference utils.py:506-522)."""
    dets = np.ascontiguousarray(det_boxes, np.float64).reshape(-1, 4)
    lib = get_lib()
    if lib is None:
        from tvqaplus_tpu.utils.misc import compute_iou_xyxy
        return np.asarray([compute_iou_xyxy(list(gt_box), d) for d in dets])
    gt = np.ascontiguousarray(gt_box, np.float64)
    out = np.empty(len(dets), np.float64)
    lib.iou_xyxy_plus1(gt.ctypes.data, dets.ctypes.data, len(dets),
                       out.ctypes.data)
    return out


def att_entries(labels, defined, spec_dims, cap, entry_idx, entry_valid,
                neg_rows, rank, group_npos):
    """Dense att labels -> static entry arrays, clipped to ``spec_dims``
    (li, lw, lr), written into pre-zeroed output slices; returns the total
    positive count (pre-cap) — or None when the library is unavailable
    (caller falls back to labels.att_entries_from_dense)."""
    lib = get_lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.float32)
    defined = np.ascontiguousarray(defined, np.float32)
    assert labels.shape == defined.shape and labels.ndim == 3
    outs = (entry_idx, entry_valid, neg_rows, rank, group_npos)
    if not all(o.flags.c_contiguous for o in outs):
        return None
    li, lw, lr = spec_dims
    return lib.att_entries_f32(
        labels.ctypes.data, defined.ctypes.data,
        labels.shape[0], labels.shape[1], labels.shape[2],
        li, lw, lr, cap,
        entry_idx.ctypes.data, entry_valid.ctypes.data,
        neg_rows.ctypes.data, rank.ctypes.data, group_npos.ctypes.data)


def fill_sub_windows(spans, ls, n_tok, win_idx, mask):
    """Per-frame (start, len) token spans -> window gather indices + mask
    (pre-zeroed (n, ls) slices); returns the overflow-token count — or None
    when the library is unavailable."""
    lib = get_lib()
    if lib is None or not (win_idx.flags.c_contiguous
                           and mask.flags.c_contiguous):
        return None
    spans = np.ascontiguousarray(spans, np.int64).reshape(-1, 2)
    return lib.fill_sub_windows(spans.ctypes.data, len(spans), ls, n_tok,
                                win_idx.ctypes.data, mask.ctypes.data)


def pairwise_iou(a, b):
    """(N, M) +1-convention IoU for the detection evaluator."""
    a = np.ascontiguousarray(a, np.float64).reshape(-1, 4)
    b = np.ascontiguousarray(b, np.float64).reshape(-1, 4)
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((len(a), len(b)), np.float64)
    lib.pairwise_iou_plus1(a.ctypes.data, len(a), b.ctypes.data, len(b),
                           out.ctypes.data)
    return out
