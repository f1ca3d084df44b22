"""All STAGE losses as pure, shape-static JAX functions.

* ``cls_loss``: sum-reduction cross-entropy over answers with the
  reference's ``len(qids)/len(targets)`` proposal rescale (main.py:57-59)
  expressed through proposal weights (no ragged N_new batch).
* ``ts_loss``: start/end CE-sum on the correct answer's span logits,
  averaged over the two heads (stage.py:539-555).
* ``att_loss``: the supervised spatial-attention ranking loss.  The
  reference collects (batch, answer, img, word, region) index tuples in
  python loops on the host every step (stage.py:639-694); here the dense
  (B, Li, Lqa, Lr) label tensor is reduced on device:

    1. the first ``entry_cap`` positive cells per example are extracted with
       one static top-k (top_k is stable, so entries keep the reference's
       row-major (img, word, region) iteration order);
    2. every entry is paired with ``num_negatives`` negatives drawn from the
       *same (img, word) group* — uniformly (Gumbel-categorical over the
       group's negative mask, matching torch.randint over the negative list)
       or, with hard negatives, by per-group score rank with the exact
       pair->rank assignment of stage.py:557-611 (pair j of a group gets the
       (drop_topk + j)-th hardest negative; pool/easy-mix variants follow the
       same window semantics);
    3. hinge ``max(0, m + S_neg - S_pos)`` or LSE ``log1p(exp(a(S_neg -
       S_pos)))`` summed over valid pairs (stage.py:738-745).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tvqaplus_tpu.ops.masking import safe_log_softmax


def _ce_sum(logits, targets, weights):
    """Sum-reduction cross-entropy: -sum_i w_i * log_softmax(logits_i)[t_i].

    logits: (..., C); targets: (...) int; weights: (...) float.
    """
    logp = safe_log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * weights)


def cls_loss(answer_scores, proposal_weights, targets, ex_mask):
    """Answer classification loss.

    Train shape: answer_scores (B, P, A), proposal_weights (B, P) — the
    ragged-N_new CE of the reference becomes a weighted CE rescaled by
    N_real / N_proposals (main.py:59 keeps the loss at batch magnitude).
    Eval shape: (B, A) with proposal_weights (B, 1).

    Returns (loss, n_correct, n_total) — accuracy from the max-scoring
    answer per (example, proposal-slot), like the reference's
    outputs.max(1) over the expanded batch (main.py:73-74).
    """
    if answer_scores.ndim == 3:
        b, p, a = answer_scores.shape
        w = proposal_weights * ex_mask[:, None]             # (B, P)
        tgt = jnp.broadcast_to(targets[:, None], (b, p))
        raw = _ce_sum(answer_scores, tgt, w)
        n_eff = jnp.sum(w)
        n_real = jnp.sum(ex_mask)
        loss = raw * n_real / jnp.maximum(n_eff, 1.0)
        pred = jnp.argmax(answer_scores, axis=-1)
        n_correct = jnp.sum((pred == tgt) * w)
        return loss, n_correct, n_eff
    # eval: (B, A)
    raw = _ce_sum(answer_scores, targets, ex_mask)
    pred = jnp.argmax(answer_scores, axis=-1)
    n_correct = jnp.sum((pred == targets) * ex_mask)
    return raw, n_correct, jnp.sum(ex_mask)


def ts_loss(t_scores, ts_st, ts_ed, targets, ex_mask):
    """Temporal span loss (stage.py:539-555): CE-sum over the image axis for
    start and end logits of the correct answer, averaged over the two heads.
    t_scores: (B, A, Li, 2) already masked with -1e10 outside valid images.
    """
    bsz = t_scores.shape[0]
    ca = t_scores[jnp.arange(bsz), targets]                 # (B, Li, 2)
    loss_st = _ce_sum(ca[..., 0], ts_st, ex_mask)
    loss_ed = _ce_sum(ca[..., 1], ts_ed, ex_mask)
    return (loss_st + loss_ed) / 2.0


def att_loss(scores, att_labels, att_defined, targets, ex_mask, rng,
             num_negatives=2, loss_type="lse", margin=0.1, alpha=20.0,
             use_hard_negatives=False, drop_topk=0, negative_pool_size=0,
             num_hard=2, entry_cap=128, entries=None):
    """Vectorized supervised-attention ranking loss.

    Args:
      scores: (B, A, Li, Lqa, Lr) raw cosine scores (padding at -1e10) —
        or already target-sliced (B, Li, Lqa, Lr) (the fused attention
        kernel's raw_mode="target" output: the loss only ever reads the
        target answer, so the kernel emits just that slice).
      att_labels / att_defined: dense labels + defined-mask (batching.py).
      targets: (B,) correct-answer indices; ex_mask: (B,).
      rng: PRNG key for negative sampling.
      entry_cap: static max positive entries per example.

    Returns (loss, aux) where aux reports n_pairs and n_pos_dropped (entries
    beyond the cap — should be 0 with a well-chosen cap).
    """
    if scores.ndim == 5:
        b, _, li, lw, lr = scores.shape
        pred = scores[jnp.arange(b), targets]                # (B, Li, Lqa, Lr)
    else:
        b, li, lw, lr = scores.shape
        pred = scores
    m = li * lw * lr
    entry_cap = min(entry_cap, m)
    pred_flat = pred.reshape(b, m)

    if entries is not None:
        # production path: the entry extraction is pure label algebra, so
        # the pipeline precomputes it host-side at collate
        # (labels.att_entries_from_dense) — no dense label upload, no
        # (B, Li*Lw*Lr)-wide device top_k
        entry_idx = entries["att_entry_idx"][:, :entry_cap]
        # collate zeroes entries for pad slots, but ex_mask is the batch's
        # authoritative validity (callers may zero it post-collate) — apply
        # it like the dense path does
        entry_valid = entries["att_entry_valid"][:, :entry_cap] \
            * ex_mask[:, None]
        neg_rows = entries["att_neg_rows"][:, :entry_cap]
        rank = entries["att_entry_rank"][:, :entry_cap]
        n_pos_group = entries["att_group_npos"][:, :entry_cap]
        n_pos_dropped = jnp.sum(jnp.maximum(
            entries["att_n_pos"] - entry_cap, 0.0))
    else:
        pos_mask = ((att_labels > 0) & (att_defined > 0)).astype(jnp.float32)
        pos_mask = pos_mask * ex_mask[:, None, None, None]
        neg_mask = ((att_labels == 0) & (att_defined > 0)).astype(jnp.float32)
        pos_flat = pos_mask.reshape(b, m)
        # stable top-k: first `entry_cap` positives in (img, word, region)
        # order.  (A cumsum+scatter compaction was tried — TPU scatter over
        # (B, 50k) serializes and cost +7 ms/step; the sort is 0.38 ms.)
        entry_valid, entry_idx = jax.lax.top_k(pos_flat, entry_cap)  # (B, E)
        n_pos_total = jnp.sum(pos_flat, axis=1)
        n_pos_dropped = jnp.sum(jnp.maximum(n_pos_total - entry_cap, 0.0))
        iw = entry_idx // lr
        r_idx = entry_idx % lr
        neg_rows = jnp.take_along_axis(
            neg_mask.reshape(b, li * lw, lr), iw[..., None], axis=1)
        pos_rows = jnp.take_along_axis(
            pos_mask.reshape(b, li * lw, lr), iw[..., None], axis=1)
        cums = jnp.cumsum(pos_rows, axis=-1)
        # entry's rank among its group's positives (reference iterates
        # regions in increasing order, stage.py:654)
        rank = jnp.take_along_axis(cums, r_idx[..., None], axis=-1)[..., 0] - 1
        n_pos_group = jnp.sum(pos_rows, axis=-1)               # (B, E)

    pos_scores = jnp.take_along_axis(pred_flat, entry_idx, axis=1)  # (B, E)
    iw_idx = entry_idx // lr                                  # (B, E)
    score_rows = jnp.take_along_axis(
        pred_flat.reshape(b, li * lw, lr), iw_idx[..., None], axis=1)
    n_neg = jnp.sum(neg_rows, axis=-1)                         # (B, E)
    has_neg = (n_neg > 0).astype(jnp.float32)

    k = num_negatives
    if not use_hard_negatives:
        # uniform over the group's negatives, independently per (entry, k)
        gumbel = jax.random.gumbel(rng, (b, entry_cap, k, lr))
        logits = jnp.where(neg_rows[:, :, None, :] > 0, 0.0, -jnp.inf)
        neg_r = jnp.argmax(logits + gumbel, axis=-1)           # (B, E, K)
        pair_valid = (entry_valid * has_neg)[..., None] * jnp.ones((1, 1, k))
    else:
        # negatives sorted by predicted score, descending; non-negatives last
        neg_scores_sorted_idx = jnp.argsort(
            -jnp.where(neg_rows > 0, score_rows, -jnp.inf), axis=-1)  # (B,E,Lr)
        ks = jnp.arange(k)[None, None, :]
        if negative_pool_size > num_negatives:
            # sample within rank windows: hard pool then easy remainder
            n_hard = num_hard if num_hard < num_negatives else num_negatives
            is_hard = ks < n_hard                              # (1, 1, K)
            ranks = jnp.arange(lr)[None, None, None, :]
            hard_win = ((ranks >= drop_topk)
                        & (ranks < drop_topk + negative_pool_size)
                        & (ranks < n_neg[..., None, None]))
            easy_win = ((ranks >= drop_topk + negative_pool_size)
                        & (ranks < n_neg[..., None, None]))
            win = jnp.where(is_hard[..., None], hard_win, easy_win)
            gumbel = jax.random.gumbel(rng, (b, entry_cap, k, lr))
            sel_rank = jnp.argmax(
                jnp.where(win, 0.0, -jnp.inf) + gumbel, axis=-1)
            window_ok = jnp.any(win, axis=-1)
        else:
            # directly take the top negatives: pair j -> rank drop_topk + j,
            # j = k * n_pos_group + entry_rank (stage.py:576,606)
            sel_rank = drop_topk + ks * n_pos_group[..., None] + rank[..., None]
            window_ok = sel_rank < n_neg[..., None]
            sel_rank = jnp.clip(sel_rank, 0, lr - 1)
        neg_r = jnp.take_along_axis(
            neg_scores_sorted_idx, sel_rank.astype(jnp.int32), axis=-1)
        pair_valid = (entry_valid * has_neg)[..., None] * window_ok

    neg_scores = jnp.take_along_axis(score_rows, neg_r, axis=-1)  # (B, E, K)
    diff = neg_scores - pos_scores[..., None]                     # (B, E, K)
    # invalid pairs gather arbitrary (possibly -1e10 padding) scores; zero
    # their diff BEFORE the exp so neither forward nor grad sees inf
    diff = jnp.where(pair_valid > 0, diff, 0.0)
    if loss_type == "hinge":
        per_pair = jnp.maximum(0.0, margin + diff)
    elif loss_type == "lse":
        per_pair = jnp.log1p(jnp.exp(alpha * diff))
    else:
        raise NotImplementedError("only hinge and lse are supported")
    loss = jnp.sum(per_pair * pair_valid)
    aux = {"att_n_pairs": jnp.sum(pair_valid),
           "att_n_pos_dropped": n_pos_dropped}
    return loss, aux


def total_loss(outputs, batch, rng, *, att_weight=0.1, ts_weight=0.5,
               use_sup_att=False, use_hard_negatives=False, num_negatives=2,
               att_loss_type="lse", margin=0.1, alpha=20.0, drop_topk=0,
               negative_pool_size=0, num_hard=2, entry_cap=128,
               vfeat_flag=True, train=True):
    """loss = cls * (N/len(targets)) + att_weight*att + ts_weight*ts
    (main.py:55-60).  Returns (loss, metrics dict)."""
    c_loss, n_correct, n_eff = cls_loss(
        outputs["answer_scores"], outputs["proposal_weights"],
        batch["target"], batch["ex_mask"])
    t_loss = ts_loss(outputs["t_scores"], batch["ts_st"], batch["ts_ed"],
                     batch["target"], batch["ex_mask"])
    metrics = {
        "loss_cls": c_loss,
        "loss_ts": ts_weight * t_loss,
        "n_correct": n_correct,
        "n_eff": n_eff,
        "n_examples": jnp.sum(batch["ex_mask"]),
    }
    loss = c_loss + ts_weight * t_loss
    if use_sup_att and train and vfeat_flag:
        entries = batch if "att_entry_idx" in batch else None
        # prefer the target-sliced raw scores when the model emitted them
        # (raw_mode="target": 1/A the tensor, no answer gather here)
        scores = outputs.get("vid_raw_target_s", None)
        if scores is None:
            scores = outputs["vid_raw_s"]
        a_loss, aux = att_loss(
            scores, batch.get("att_labels"),
            batch.get("att_defined"),
            batch["target"], batch["ex_mask"], rng,
            num_negatives=num_negatives, loss_type=att_loss_type,
            margin=margin, alpha=alpha,
            use_hard_negatives=use_hard_negatives, drop_topk=drop_topk,
            negative_pool_size=negative_pool_size, num_hard=num_hard,
            entry_cap=entry_cap, entries=entries)
        loss = loss + att_weight * a_loss
        metrics["loss_att"] = att_weight * a_loss
        metrics.update(aux)
    else:
        metrics["loss_att"] = jnp.asarray(0.0)
    metrics["loss"] = loss
    return loss, metrics
