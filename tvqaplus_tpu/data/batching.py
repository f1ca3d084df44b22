"""Static-shape batch assembly (the TPU replacement for dynamic padding).

The reference pads every batch to its own max lengths (tvqa_dataset.py:
493-628) and clips in ``prepare_inputs`` (:631-688) — per-batch dynamic
shapes, which would force an XLA recompile per batch.  Here every batch is
padded to a **StaticShapeSpec** chosen from a small set of length buckets, so
the jitted train step compiles once per bucket and never again.

Batch contract (all numpy, fixed shapes; B=batch, A=5 answers):
  qas         (B, A, Lqa)  int32   word ids
  qas_mask    (B, A, Lqa)  f32
  qas_bert    (B, A, Lqa, De) f32  fine-tuned BERT token embeddings
  q_l         (B,)         int32   question length (tokens)
  sub_bert    (B, Li, Ls, De) f32  frame-aligned subtitle embeddings
                                   (expanded contract: spec.max_sub_tokens=0)
  sub_tokens  (B, St, De)  f32     per-video unique token stream, slot 0
                                   reserved all-zero (dedup contract)
  sub_win_idx (B, Li, Ls)  int32   window gather indices into St (0 = the
                                   zero token, for padded/invalid slots)
  sub_mask    (B, Li, Ls)  f32
  vid         (B, Li, Lr, Dv) f32  per-frame region features
  vid_mask    (B, Li, Lr)  f32
  target      (B,)         int32   correct-answer index (999 for test)
  ts_st/ts_ed (B,)         int32   span labels on the sampled-image grid
  ts_mask     (B, Li)      f32     valid image positions
  att_labels  (B, Li, Lqa, Lr) f32 dense supervised-attention targets
  att_defined (B, Li, Lqa, Lr) f32 1 where a label is defined (see labels.py)
  anno_st     (B,)         int32   first annotated image index
  ex_mask     (B,)         f32     1 for real examples (last batch padding)

Host-side metadata (qid, vid_name, image_indices, boxes) rides next to the
arrays and never crosses to the device.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List

import numpy as np

from tvqaplus_tpu.data.labels import att_entries_from_dense


# supervised-attention batch keys (excluded from inference pipelines)
ATT_KEYS = ("att_labels", "att_defined", "att_entry_idx", "att_entry_valid",
            "att_neg_rows", "att_entry_rank", "att_group_npos", "att_n_pos")


@dataclass(frozen=True)
class StaticShapeSpec:
    batch: int = 16
    num_a: int = 5
    max_qa_l: int = 40
    max_img: int = 50
    max_sub_l: int = 50
    num_region: int = 25
    bert_dim: int = 768
    vfeat_dim: int = 300
    max_sub_tokens: int = 0   # >0: dedup contract (sub_tokens+sub_win_idx)
    att_entry_cap: int = 128  # E: static positive-entry slots (labels.py)
    vcpt: bool = False        # ship the (dormant) vcpt word-id batch keys

    @classmethod
    def from_config(cls, cfg, batch=None, max_img=None):
        dedup = getattr(cfg, "sub_dedup", False) and cfg.sub_flag
        return cls(batch=batch or cfg.bsz,
                   num_a=5,
                   max_qa_l=cfg.max_qa_l,
                   max_img=max_img or cfg.max_num_img,
                   max_sub_l=cfg.max_sub_l,
                   num_region=cfg.num_region,
                   bert_dim=cfg.embedding_size,
                   vfeat_dim=cfg.vfeat_size,
                   max_sub_tokens=cfg.max_sub_tokens if dedup else 0,
                   att_entry_cap=cfg.att_entry_cap,
                   vcpt=cfg.vcpt_flag)

    def with_max_img(self, max_img):
        return dataclasses.replace(self, max_img=max_img)


def pick_bucket(n_img, buckets, cap):
    """Smallest bucket >= n_img (clamped to cap)."""
    n_img = min(n_img, cap)
    for b in sorted(buckets):
        if b >= n_img:
            return min(b, cap)
    return cap


def zeros_batch(spec: StaticShapeSpec):
    s = spec
    if s.max_sub_tokens:
        sub_keys = {
            "sub_tokens": np.zeros((s.batch, s.max_sub_tokens, s.bert_dim),
                                   np.float32),
            "sub_win_idx": np.zeros((s.batch, s.max_img, s.max_sub_l),
                                    np.int32),
        }
    else:
        sub_keys = {
            "sub_bert": np.zeros((s.batch, s.max_img, s.max_sub_l,
                                  s.bert_dim), np.float32),
        }
    return {
        "qas": np.zeros((s.batch, s.num_a, s.max_qa_l), np.int32),
        "qas_mask": np.zeros((s.batch, s.num_a, s.max_qa_l), np.float32),
        "qas_bert": np.zeros((s.batch, s.num_a, s.max_qa_l, s.bert_dim), np.float32),
        "q_l": np.zeros((s.batch,), np.int32),
        **sub_keys,
        "sub_mask": np.zeros((s.batch, s.max_img, s.max_sub_l), np.float32),
        "vid": np.zeros((s.batch, s.max_img, s.num_region, s.vfeat_dim), np.float32),
        "vid_mask": np.zeros((s.batch, s.max_img, s.num_region), np.float32),
        "target": np.zeros((s.batch,), np.int32),
        "ts_st": np.zeros((s.batch,), np.int32),
        "ts_ed": np.zeros((s.batch,), np.int32),
        "ts_mask": np.zeros((s.batch, s.max_img), np.float32),
        # supervised-attention entries, precomputed host-side from the dense
        # labels (labels.att_entries_from_dense) — replaces uploading the two
        # dense (B, Li, Lqa, Lr) arrays and the device-side top_k extraction
        "att_entry_idx": np.zeros((s.batch, s.att_entry_cap), np.int32),
        "att_entry_valid": np.zeros((s.batch, s.att_entry_cap), np.float32),
        "att_neg_rows": np.zeros((s.batch, s.att_entry_cap, s.num_region),
                                 np.float32),
        "att_entry_rank": np.zeros((s.batch, s.att_entry_cap), np.int32),
        "att_group_npos": np.zeros((s.batch, s.att_entry_cap), np.float32),
        "att_n_pos": np.zeros((s.batch,), np.float32),
        "anno_st": np.zeros((s.batch,), np.int32),
        "ex_mask": np.zeros((s.batch,), np.float32),
        # vcpt word ids: shipped-but-never-read in the reference
        # (pad_collate tvqa_dataset.py:600-605; the model reads only the
        # region FEATURES) — the surface is kept when the vcpt stream is
        # requested, at the hier layout (per-frame per-region last words)
        **({"vcpt": np.zeros((s.batch, s.max_img, s.num_region), np.int32),
            "vcpt_mask": np.zeros((s.batch, s.max_img, s.num_region),
                                  np.float32)} if s.vcpt else {}),
    }


def collate_static(examples: List[dict], spec: StaticShapeSpec,
                   skip_att=False):
    """Assemble ragged per-example dicts into one static-shape batch.

    Each example dict carries (possibly ragged) fields:
      qas: 5 lists of word ids; qas_bert: 5 arrays (L, De);
      sub_bert: per-image arrays (Lw, De); vid: per-image arrays (cnt, Dv);
      target, ts_label [st, ed], anno_st_idx, att_labels (dense arrays from
      labels.densify_att_labels or ragged list), plus metadata fields.

    ``skip_att=True`` (inference pipelines, which exclude ATT_KEYS from the
    upload anyway) bypasses the per-example att-entry extraction — the
    serving path never reads it.

    Returns (arrays dict, meta dict).  Sequences longer than the spec are
    clipped (the reference's ``prepare_inputs`` clipping contract,
    tvqa_dataset.py:631-688).
    """
    s = spec
    assert len(examples) <= s.batch, f"{len(examples)} > batch {s.batch}"
    out = zeros_batch(s)
    # meta carries HOST-side copies of everything the serving/validation
    # loops read back per batch (target/anno_st/QA word ids): each
    # device_get is a tunnel round trip on the axon host — the values are
    # host-known at collate, so the loops never fetch them from the device
    meta = {"qid": [], "vid_name": [], "image_indices": [], "boxes": [],
            "ts": [], "att_n_pos": [], "sub_tok_overflow": [],
            "target": [], "anno_st": [], "qas_words": []}

    from tvqaplus_tpu import native

    for b, ex in enumerate(examples):
        out["ex_mask"][b] = 1.0
        # --- QA text -----------------------------------------------------
        for a in range(s.num_a):
            ids = np.asarray(ex["qas"][a], np.int32)[: s.max_qa_l]
            out["qas"][b, a, : len(ids)] = ids
            out["qas_mask"][b, a, : len(ids)] = 1.0
        native.pad_batch(ex["qas_bert"], s.max_qa_l, s.bert_dim,
                         out=out["qas_bert"][b], mask=None)
        out["q_l"][b] = ex.get("q_l", 0)
        if ex.get("qa_noun_masks") is not None:
            # optional noun-position masks (labels.make_noun_mask) ->
            # structured_attention's noun_mask input
            if "qa_noun_masks" not in out:
                out["qa_noun_masks"] = np.zeros(
                    (s.batch, s.num_a, s.max_qa_l), np.float32)
            for a in range(s.num_a):
                m = np.asarray(ex["qa_noun_masks"][a],
                               np.float32)[: s.max_qa_l]
                out["qa_noun_masks"][b, a, : len(m)] = m
        if s.vcpt and ex.get("vcpt") is not None:
            for i, frame_ids in enumerate(ex["vcpt"][: s.max_img]):
                ids = np.asarray(frame_ids, np.int32)[: s.num_region]
                out["vcpt"][b, i, : len(ids)] = ids
                out["vcpt_mask"][b, i, : len(ids)] = 1.0
        # --- subtitles ----------------------------------------------------
        if s.max_sub_tokens:
            n_sub, n_over = _collate_sub_dedup(ex, s, out, b)
        else:
            sub_list = (ex.get("sub_bert") or [])[: s.max_img]
            n_sub, n_over = len(sub_list), 0
            if sub_list:
                native.pad_batch(sub_list, s.max_sub_l, s.bert_dim,
                                 out=out["sub_bert"][b, : len(sub_list)],
                                 mask=out["sub_mask"][b, : len(sub_list)])
        # --- video regions --------------------------------------------------
        vid_list = (ex.get("vfeat") or [])[: s.max_img]
        if vid_list:
            native.pad_batch(vid_list, s.num_region, s.vfeat_dim,
                             out=out["vid"][b, : len(vid_list)],
                             mask=out["vid_mask"][b, : len(vid_list)])
        # --- labels ---------------------------------------------------------
        out["target"][b] = ex.get("target", 999)
        ts = ex.get("ts_label", [0, 0])
        n_img = len(ex.get("image_indices", [])) or max(n_sub, len(vid_list))
        n_img = min(n_img, s.max_img)
        out["ts_st"][b] = min(ts[0], n_img - 1) if n_img else 0
        out["ts_ed"][b] = min(ts[1], n_img - 1) if n_img else 0
        out["ts_mask"][b, :n_img] = 1.0
        out["anno_st"][b] = ex.get("anno_st_idx", 0)
        att = None if skip_att else ex.get("att_labels_dense")
        n_pos = 0
        if att is not None:
            labels, defined = att
            # n_pos = positives BEFORE the cap: the pipeline asserts on it
            # so an att_entry_cap overflow is loud.  C fast path writes the
            # pre-zeroed slices directly (no intermediate dense copies)
            n_pos = native.att_entries(
                labels, defined, (s.max_img, s.max_qa_l, s.num_region),
                s.att_entry_cap, out["att_entry_idx"][b],
                out["att_entry_valid"][b], out["att_neg_rows"][b],
                out["att_entry_rank"][b], out["att_group_npos"][b])
            if n_pos is None:  # no C library: dense-copy python path
                li = min(labels.shape[0], s.max_img)
                lw = min(labels.shape[1], s.max_qa_l)
                lr = min(labels.shape[2], s.num_region)
                dl = np.zeros((s.max_img, s.max_qa_l, s.num_region),
                              np.float32)
                dd = np.zeros_like(dl)
                dl[:li, :lw, :lr] = labels[:li, :lw, :lr]
                dd[:li, :lw, :lr] = defined[:li, :lw, :lr]
                (out["att_entry_idx"][b], out["att_entry_valid"][b],
                 out["att_neg_rows"][b], out["att_entry_rank"][b],
                 out["att_group_npos"][b], n_pos) = att_entries_from_dense(
                    dl, dd, s.att_entry_cap)
            out["att_n_pos"][b] = n_pos
        # --- metadata --------------------------------------------------------
        meta["qid"].append(ex.get("qid", b))
        meta["vid_name"].append(ex.get("vid_name", ""))
        meta["image_indices"].append(ex.get("image_indices", []))
        meta["boxes"].append(ex.get("boxes"))
        meta["ts"].append(ex.get("ts"))
        meta["att_n_pos"].append(n_pos)
        meta["sub_tok_overflow"].append(n_over)
        meta["target"].append(int(out["target"][b]))
        meta["anno_st"].append(int(out["anno_st"][b]))
        meta["qas_words"].append(out["qas"][b].copy())

    return out, meta


def _collate_sub_dedup(ex, s, out, b):
    """Fill the dedup subtitle contract for example ``b``.

    Preferred example fields: ``sub_tokens`` (n_tok, De) — the per-video
    unique token stream (the reference h5's native layout,
    tvqa_dataset.py:171-176) — and ``sub_win_spans``, per-frame (start, len)
    token ranges (aligned windows are CONSECUTIVE sentences,
    tvqa_dataset.py:266-280, so each window is a contiguous stream slice).
    Datasets that only provide expanded ``sub_bert`` windows get a stream
    synthesized by concatenating them (dedup factor 1, numerics identical).

    Slot 0 of ``sub_tokens`` is reserved all-zero; padded/overflowed window
    slots gather it, reproducing the expanded path's zero padding ahead of
    the bridge EXACTLY.  Returns (n_windows, n_overflow_tokens) — tokens
    beyond the St-1 capacity are dropped (masked), which the pipeline turns
    into a loud error.
    """
    stream = ex.get("sub_tokens")
    spans = ex.get("sub_win_spans")
    if stream is None or spans is None:
        wins = [np.asarray(w)[: s.max_sub_l] for w in
                (ex.get("sub_bert") or [])[: s.max_img]]
        if not wins:
            return 0, 0
        stream = np.concatenate(wins, axis=0)
        starts = np.cumsum([0] + [len(w) for w in wins[:-1]])
        spans = [(int(st), len(w)) for st, w in zip(starts, wins)]
    spans = spans[: s.max_img]
    cap = s.max_sub_tokens - 1                 # slot 0 = zero token
    n_tok = min(len(stream), cap)
    out["sub_tokens"][b, 1: 1 + n_tok] = stream[:n_tok]
    if not spans:
        return 0, 0
    n = len(spans)
    from tvqaplus_tpu import native
    n_over = native.fill_sub_windows(
        np.asarray(spans, np.int64), s.max_sub_l, n_tok,
        out["sub_win_idx"][b, :n], out["sub_mask"][b, :n])
    if n_over is None:
        # numpy fallback: all windows at once — (n, Ls) index grid, masked
        # past each window's length and past the token capacity
        sp = np.asarray(spans, np.int64)       # (n, 2) [start, len]
        ln = np.minimum(sp[:, 1], s.max_sub_l)  # (n,)
        pos = np.arange(s.max_sub_l)
        valid = pos < ln[:, None]              # (n, Ls)
        idx = sp[:, :1] + pos                  # (n, Ls)
        ok = valid & (idx < n_tok)
        n_over = int(valid.sum() - ok.sum())
        out["sub_win_idx"][b, :n] = np.where(ok, idx + 1, 0)
        out["sub_mask"][b, :n] = ok.astype(np.float32)
    return n, n_over


def expand_sub_windows(arrays):
    """Host-side reconstruction of the expanded (B, Li, Ls, De) ``sub_bert``
    from the dedup contract — for consumers of the reference layout
    (parity harnesses, debug dumps).  Exact: padded slots index the zero
    token."""
    tok = np.asarray(arrays["sub_tokens"])
    idx = np.asarray(arrays["sub_win_idx"])
    b, li, ls = idx.shape
    flat = tok[np.arange(b)[:, None], idx.reshape(b, -1)]
    return flat.reshape(b, li, ls, tok.shape[-1])
