"""Jittable span search, proposal construction and span pooling.

The reference's span machinery leaves the device every step:
``find_max_triples`` syncs to host numpy (model_utils.py:102-111), proposal
construction builds a ragged N_new batch in python (stage.py:408-438), and
``find_max_pair`` is a python scan (inference.py:13-35).  Here every piece is
a shape-static JAX op:

* ``top_spans``: top-N (st <= ed) pairs of p1[st]*p2[ed] via a masked top-k
  over the upper-triangular outer product;
* ``find_max_pair``: the greedy running-argmax scan, vectorized (cummax of
  p1, first-occurrence argmax semantics preserved);
* proposals: a fixed (max_num_proposal+1)-slot axis with 0/1 weights instead
  of a ragged N_new batch — slot 0 is always the GT span, slot j>0 holds the
  j-th predicted span gated by IoU >= iou_thd and confidence >= prob_thd
  (stage.py:408-418 + model_utils.py:54-75 semantics, add_gt=True);
* ``pool_span``: masked max-pool over an expanded [st-e, ed+e) window
  (stage.py:427-432 + model_utils.py:78-89).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tvqaplus_tpu.models.layers import mask_logits
from tvqaplus_tpu.ops.masking import safe_softmax

NEG_INF = -1e10


def top_spans(p1, p2, top_n=1):
    """Top-N spans (st, ed) with st <= ed maximizing p1[st] * p2[ed].

    Args:
      p1, p2: (..., L) start / end probabilities.
      top_n: number of spans.

    Returns:
      (st, ed, conf): each (..., top_n).  Matches reference
      find_max_triples (model_utils.py:92-111) up to tie ordering.
    """
    L = p1.shape[-1]
    product = p1[..., :, None] * p2[..., None, :]        # (..., L, L)
    triu = jnp.triu(jnp.ones((L, L), bool))
    product = jnp.where(triu, product, -jnp.inf)
    flat = product.reshape(*product.shape[:-2], L * L)
    conf, idx = jax.lax.top_k(flat, top_n)
    return idx // L, idx % L, conf


def find_max_pair(p1, p2):
    """Greedy best-span scan (reference inference.py:13-35 semantics).

    For each end index i, pair it with the running argmax of p1 over [0, i]
    (first occurrence on ties); return the pair maximizing p1[st]*p2[ed]
    (first occurrence on ties, initialized to span (0, 1) with value 0).

    Args:
      p1, p2: (..., L)
    Returns:
      (st, ed, value): scalars per batch element.
    """
    L = p1.shape[-1]
    axis = p1.ndim - 1
    cm = jax.lax.cummax(p1, axis=axis)                    # running max of p1
    # first index achieving the running max at each prefix
    idx = jnp.arange(L)
    is_new_max = jnp.concatenate(
        [jnp.ones_like(p1[..., :1], bool), p1[..., 1:] > cm[..., :-1]], -1)
    argcm = jax.lax.cummax(jnp.where(is_new_max, idx, -1), axis=axis)
    vals = cm * p2                                        # (..., L)
    # strict '>' keeps the first max; emulate with argmax over vals (first
    # occurrence) but only where vals > 0, else default span (0, 1).
    best_ed = jnp.argmax(vals, axis=-1)
    best_val = jnp.take_along_axis(vals, best_ed[..., None], -1)[..., 0]
    best_st = jnp.take_along_axis(argcm, best_ed[..., None], -1)[..., 0]
    default = best_val <= 0
    best_st = jnp.where(default, 0, best_st)
    best_ed = jnp.where(default, 1, best_ed)
    best_val = jnp.where(default, 0.0, best_val)
    return best_st, best_ed, best_val


def temporal_iou(pred_st, pred_ed, gt_st, gt_ed):
    """IoU of [st, ed) spans, the reference's simplified union
    (model_utils.py:37-51: union = max(ed) - min(st))."""
    inter = jnp.maximum(0.0, jnp.minimum(pred_ed, gt_ed)
                        - jnp.maximum(pred_st, gt_st))
    union = jnp.maximum(pred_ed, gt_ed) - jnp.minimum(pred_st, gt_st)
    return jnp.where(union > 0, inter / union, 0.0)


def expand_window_mask(st, ed_excl, length, extra=0, valid_mask=None):
    """(..., length) 0/1 mask for indices in [max(0, st-extra), ed+extra).

    Mirrors expand_span + python slicing (model_utils.py:78-89): the lower
    bound clamps at 0, the upper bound may exceed the sequence (slicing
    forgives it; here the mask just ends).
    """
    idx = jnp.arange(length)
    lo = jnp.maximum(0, st - extra)[..., None]
    hi = (ed_excl + extra)[..., None]
    mask = ((idx >= lo) & (idx < hi)).astype(jnp.float32)
    if valid_mask is not None:
        mask = mask * valid_mask
    return mask


def pool_span(x, window_mask):
    """Masked max-pool over the image axis.

    x: (..., Li, D); window_mask: (..., Li) in {0,1}.
    Equivalent to torch.max(mask_logits(x[span], mask[span]), dim)[0]
    (stage.py:429-432): fully-masked windows return -1e10 per dim, matching
    the reference's behaviour on empty slices of -1e10 entries.
    """
    return jnp.max(mask_logits(x, window_mask[..., None]), axis=-2)


def training_proposals(t_scores_ca, ts_st, ts_ed, img_valid_mask,
                       max_num_proposal=1, iou_thd=0.5, ce_prob_thd=0.01):
    """Fixed-shape training proposal spans + weights.

    Args:
      t_scores_ca: (N, Li, 2) span logits of the correct answer (already
        mask_logits-ed over invalid images).
      ts_st, ts_ed: (N,) GT span label indices (inclusive ed).
      img_valid_mask: (N, Li).
      max_num_proposal: predicted spans to consider (reference default 1).
    Returns:
      span_st:  (N, P) inclusive start indices, P = 1 + max_num_proposal
      span_ed:  (N, P) exclusive end indices
      weights:  (N, P) in {0,1}; slot 0 (GT) always 1.

    Semantics (stage.py:408-418): per-axis softmax over Li; top-N spans of
    p_st[st]*p_ed[ed]; keep a predicted span iff conf >= ce_prob_thd and
    IoU([st, ed+1), [gt_st, gt_ed+1)) >= iou_thd; GT span always added.
    """
    del img_valid_mask  # already folded into t_scores_ca via mask_logits
    probs = safe_softmax(t_scores_ca, axis=1)              # (N, Li, 2)
    st, ed, conf = top_spans(probs[..., 0], probs[..., 1], max_num_proposal)
    pred_st, pred_ed_excl = st, ed + 1                     # (N, P-1)
    gt_st = ts_st[:, None].astype(jnp.float32)
    gt_ed_excl = (ts_ed + 1)[:, None].astype(jnp.float32)
    iou = temporal_iou(pred_st.astype(jnp.float32),
                       pred_ed_excl.astype(jnp.float32), gt_st, gt_ed_excl)
    keep = ((conf >= ce_prob_thd) & (iou >= iou_thd)).astype(jnp.float32)

    span_st = jnp.concatenate([ts_st[:, None], pred_st], axis=1)
    span_ed = jnp.concatenate([(ts_ed + 1)[:, None], pred_ed_excl], axis=1)
    weights = jnp.concatenate(
        [jnp.ones_like(keep[:, :1]), keep], axis=1)
    return span_st, span_ed, weights


def eval_proposals(t_scores, img_valid_mask):
    """Top-1 span per (example, answer) for evaluation/inference
    (stage.py:439-448): softmax over Li, unconstrained top-1, no threshold.

    Args:
      t_scores: (N, A, Li, 2) masked span logits.
    Returns:
      span_st, span_ed_excl: (N, A) int32.
    """
    del img_valid_mask
    probs = safe_softmax(t_scores, axis=2)
    st, ed, _ = top_spans(probs[..., 0], probs[..., 1], 1)
    return st[..., 0], ed[..., 0] + 1
