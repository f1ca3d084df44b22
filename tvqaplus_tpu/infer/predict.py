"""Inference: produce ``{mode}_inference_predictions.json`` byte-compatible
with the reference evaluator's input contract (inference.py:38-98).

* answer + span prediction run inside one jitted eval step — the greedy
  best-span scan (``find_max_pair``) is in-graph over all five answers at
  once (the reference loops per example on host, inference.py:63-70);
* the span-index -> seconds conversion keeps the reference's exact math:
  ``offset = (first_img_id % 6) / 3``; ``[st*2 + offset, (ed+1)*2 + offset]``
  (inference.py:68-72).  The reference ran under python 2 where that
  division floors; ``py2_offset_div`` replicates the floored offset, the
  default keeps true division (the mathematically-correct frame timestamp);
* ``raw_bbox`` records mirror ``get_att_prediction`` (stage.py:748-806):
  for every answer x annotated frame x QA word in the object vocab, regions
  with cosine score >= 0.2, sorted ascending by score.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.data.batching import ATT_KEYS
from tvqaplus_tpu.models import losses, spans
from tvqaplus_tpu.ops.masking import safe_softmax

# grounding-record acceptance threshold (reference stage.py:787-804)
SCORE_THD = 0.2


def spans_to_seconds(st, ed, first_img_id, py2_offset_div=False,
                     frame_interval=6):
    """Span grid indices -> seconds (inference.py:68-72).

    At the default 0.5 fps sampling (frame_interval 6 over 3 fps frames) one
    grid step is 2 s; the stretch 1 fps config (frame_interval 3) gives 1 s.
    """
    step = frame_interval / 3
    if py2_offset_div:
        offset = (first_img_id % frame_interval) // 3
    else:
        offset = (first_img_id % frame_interval) / 3
    return [st * step + offset, (ed + 1) * step + offset]


def get_att_predictions(scores, words, object_word_ids, qids, vid_names,
                        img_indices, boxes, start_indices, score_thd=0.2,
                        scores_local=False, li_total=None):
    """Host-side grounding records (reference get_att_prediction,
    stage.py:748-806).

    Args:
      scores: np (B, 5, Li, Lqa, Lr) raw cosine scores — or, with
        ``scores_local=True``, (B, 5, F, Lqa, Lr) already gathered at the
        annotated-frame window [anno_st, anno_st + F) on the device (the
        serving path: shipping only the window cuts the device->host
        transfer ~Li/F x); ``li_total`` is then the full frame count for
        the original out-of-range guard.
      words: np (B, 5, Lqa) word ids.
      object_word_ids: set of vocab ids that require boxes.
      img_indices: per-example list of 1-indexed image ids.
      boxes: per-example list (annotated frames) of region-box lists.
      start_indices: per-example first annotated image position.
    Returns:
      list of {str(ans_idx): [record]} dicts, one per example.
    """
    object_word_ids = set(int(w) for w in object_word_ids)
    n_frames_total = li_total if scores_local else scores.shape[2]
    att_predictions = []
    for b in range(len(scores)):
        start_idx = int(start_indices[b])
        ex_boxes = boxes[b] or []
        qid_b = int(qids[b])
        vid_name_b = vid_names[b]
        img_ids_b = img_indices[b]
        # (frame, global index, image id, boxes, box count) rows that survive
        # the reference's out-of-range guard — hoisted out of the answer loop
        frames = []
        for img_local in range(len(ex_boxes)):
            img_global = img_local + start_idx
            if img_global >= n_frames_total:
                continue
            cur_img_boxes = ex_boxes[img_local]
            frames.append((img_local, img_global, int(img_ids_b[img_global]),
                           cur_img_boxes, len(cur_img_boxes)))
        q_preds = {}
        for ans_idx in range(5):
            q_preds[ans_idx] = []
            # object-vocab filter runs once per answer, not once per frame
            obj_words = [(wi, int(w))
                         for wi, w in enumerate(words[b, ans_idx].tolist())
                         if w in object_word_ids]
            if not obj_words or not frames:
                continue
            ans_scores = scores[b, ans_idx]       # (Li or F, Lqa, Lr)
            for img_local, img_global, img_id, cur_img_boxes, n_boxes \
                    in frames:
                cur_img_scores = ans_scores[
                    img_local if scores_local else img_global]
                for word_idx, w in obj_words:
                    region_scores = cur_img_scores[word_idx][:n_boxes]
                    accepted = np.nonzero(region_scores >= score_thd)[0]
                    acc_scores = region_scores[accepted]
                    order = np.argsort(acc_scores)  # ascending (stage.py:793)
                    q_preds[ans_idx].append({
                        "pred": acc_scores[order].tolist(),
                        "bbox": [cur_img_boxes[accepted[i]] for i in order],
                        "word": w,
                        "qid": qid_b,
                        "vid_name": vid_name_b,
                        "img_idx": img_id,
                    })
        att_predictions.append(q_preds)
    return att_predictions


def assemble_att_predictions(sc_sorted, idx_sorted, n_acc, n_valid, words,
                             object_word_ids, qids, vid_names, img_indices,
                             boxes, start_indices, li_total):
    """Grounding records from DEVICE-compacted scores (the serving path).

    The device ships, per (example, answer, window frame, word):
      sc_sorted  (B, 5, F, Lqa, Lr) f32   region scores ascending; invalid
                                          regions (vid_mask == 0) ride as
                                          +inf at the tail;
      idx_sorted (B, 5, F, Lqa, Lr) int   the matching region indices;
      n_acc      (B, 5, F, Lqa)     int   #accepted (valid & score >= 0.2);
      n_valid    (B, F)             int   #valid regions per frame.
    so the reference's per-row ``nonzero -> fancy-index -> argsort``
    (stage.py:787-804) reduces to two SLICES here: the accepted entries are
    the last ``n_acc`` of the first ``n_valid`` sorted positions.  When a
    frame's host-known box count differs from the device's valid-region
    count (malformed data; never in the shipped datasets) the row filters
    indices >= n_boxes, matching the reference's first-n_boxes pool.
    """
    object_word_ids = set(int(w) for w in object_word_ids)
    att_predictions = []
    for b in range(len(sc_sorted)):
        start_idx = int(start_indices[b])
        ex_boxes = boxes[b] or []
        qid_b = int(qids[b])
        vid_name_b = vid_names[b]
        img_ids_b = img_indices[b]
        frames = []
        for img_local in range(len(ex_boxes)):
            img_global = img_local + start_idx
            if img_global >= li_total:
                continue
            cur = ex_boxes[img_local]
            frames.append((img_local, int(img_ids_b[img_global]), cur,
                           len(cur), int(n_valid[b, img_local])))
        q_preds = {}
        words_b = words[b]
        for ans_idx in range(5):
            q_preds[ans_idx] = []
            obj_words = [(wi, int(w))
                         for wi, w in enumerate(words_b[ans_idx].tolist())
                         if w in object_word_ids]
            if not obj_words or not frames:
                continue
            sc_a = sc_sorted[b, ans_idx]       # (F, Lqa, Lr)
            ix_a = idx_sorted[b, ans_idx]
            na_a = n_acc[b, ans_idx]
            rec = q_preds[ans_idx].append
            for img_local, img_id, cur_img_boxes, n_boxes, nv in frames:
                sc_f, ix_f, na_f = sc_a[img_local], ix_a[img_local], \
                    na_a[img_local]
                for word_idx, w in obj_words:
                    n = int(na_f[word_idx])
                    lo = nv - n
                    ix = ix_f[word_idx, lo:nv]
                    sc = sc_f[word_idx, lo:nv]
                    if n_boxes != nv:          # malformed-data fallback
                        keep = ix < n_boxes
                        ix, sc = ix[keep], sc[keep]
                    rec({
                        "pred": sc.tolist(),
                        "bbox": [cur_img_boxes[i] for i in ix],
                        "word": w,
                        "qid": qid_b,
                        "vid_name": vid_name_b,
                        "img_idx": img_id,
                    })
        att_predictions.append(q_preds)
    return att_predictions


class InferenceRunner:
    """Drives the eval-mode model over a dataset split and assembles the
    predictions dict (reference inference.py:38-75).

    The loop keeps one dispatched batch in flight: jax dispatch is async,
    so batch i's host-side collation (device fetches, grounding-record
    assembly, span->seconds) runs while batch i+1 executes on device."""

    def __init__(self, cfg, model, params, mesh=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.mesh = mesh

        def expand_video_dedup(batch):
            """Per-unique-video uploads -> per-example arrays (one device
            gather; config.video_dedup).  The pipeline ships vid_u
            (U, Li, Lr, Dv) / sub_tokens_u (U, St, De) once per batch with
            ex_vid (B,) pointing each example at its clip — the expansion
            costs one HBM pass instead of re-uploading duplicate clips
            through the host link (the serving wall, docs/BENCH.md)."""
            if "ex_vid" not in batch:
                return batch
            batch = dict(batch)
            gi = batch.pop("ex_vid")
            for k in ("vid", "sub_tokens", "sub_bert"):
                if k + "_u" in batch:
                    batch[k] = jnp.take(batch.pop(k + "_u"), gi, axis=0)
            return batch

        def infer_step(params, batch, with_grounding, f_max):
            batch = expand_video_dedup(batch)
            out = model.apply({"params": params}, batch, train=False,
                              need_sub_raw=False,
                              need_vid_raw=with_grounding)
            pred_ids = jnp.argmax(out["answer_scores"], axis=-1)   # (B,)
            t_probs = safe_softmax(out["t_scores"], axis=2)        # (B,A,Li,2)
            st, ed, val = spans.find_max_pair(t_probs[..., 0],
                                              t_probs[..., 1])    # (B, A)
            result = {"pred_ids": pred_ids, "span_st": st, "span_ed": ed}
            # the raw score tensor is large (B,A,Li,Lqa,Lr); grounding
            # records only read the annotated-frame window, so gather it
            # ON DEVICE at the annotated frame window (F = bucketed max
            # annotated frames, typically Li/10), then COMPACT in-graph:
            # threshold + ascending sort + per-row accept counts — the
            # reference's per-row nonzero/argsort host loop
            # (stage.py:787-804) becomes two host slices per record
            # (see assemble_att_predictions)
            if with_grounding and "vid_raw_s" in out:
                raw = out["vid_raw_s"]
                idx = batch["anno_st"].astype(jnp.int32)[:, None] \
                    + jnp.arange(f_max)                           # (B, F)
                idx = jnp.minimum(idx, raw.shape[2] - 1)  # clamp; the host
                # guard (img_global >= Li) skips clamped rows
                win = jnp.take_along_axis(
                    raw, idx[:, None, :, None, None], axis=2).astype(
                        jnp.float32)                    # (B, A, F, Lqa, Lr)
                vmask = jnp.take_along_axis(
                    batch["vid_mask"], idx[..., None], axis=1) > 0
                vm = vmask[:, None, :, None, :]         # (B, 1, F, 1, Lr)
                masked = jnp.where(vm, win, jnp.inf)
                order = jnp.argsort(masked, axis=-1)    # ascending, stable
                idx_t = jnp.int8 if raw.shape[-1] <= 127 else jnp.int32
                result["grd_scores"] = jnp.take_along_axis(masked, order,
                                                           axis=-1)
                result["grd_idx"] = order.astype(idx_t)
                result["grd_nacc"] = jnp.sum(
                    (win >= SCORE_THD) & vm, axis=-1).astype(jnp.uint8)
                result["grd_nvalid"] = jnp.sum(
                    vmask, axis=-1).astype(jnp.uint8)   # (B, F)
            return result

        self._infer_step = jax.jit(
            infer_step, static_argnames=("with_grounding", "f_max"))

        def infer_scan(params, batches, with_grounding, f_max):
            """K same-bucket batches (stacked on a leading axis by the
            pipeline's ``group``) in ONE dispatch — the serving twin of the
            training loop's multi-step scan: amortizes the per-dispatch
            host/tunnel latency over K steps.  ``lax.map`` = scan without
            carry (eval steps are independent)."""
            return jax.lax.map(
                lambda b: infer_step(params, b, with_grounding, f_max),
                batches)

        self._infer_scan = jax.jit(
            infer_scan, static_argnames=("with_grounding", "f_max"))

    def run(self, dataset, mode="valid", object_word_ids=(), debug=False):
        from tvqaplus_tpu.data.pipeline import DataPipeline
        dataset.set_mode(mode)
        group = max(1, getattr(self.cfg, "eval_steps_per_dispatch", 1))
        pipeline = DataPipeline(dataset, self.cfg, mesh=self.mesh,
                                batch_size=self.cfg.test_bsz, shuffle=False,
                                prefetch_depth=self.cfg.prefetch_depth,
                                group=group,
                                # training-only tensors: skip the upload
                                exclude_keys=ATT_KEYS,
                                video_dedup=getattr(
                                    self.cfg, "video_dedup", False))
        predictions = {"ts_answer": {}, "raw_bbox": []}
        with_grounding = bool(object_word_ids) and self.cfg.vfeat_flag
        # annotated-window size for the device-side grounding gather.
        # Preferred: a dataset-level precompute of the split's max annotated
        # frame count — then every Li bucket compiles exactly ONE infer_step
        # variant (each compile is ~60 s through the remote-compile tunnel).
        # Fallback (datasets without the hook): monotone doubling growth,
        # O(log Li) variants per bucket.
        f_global = None
        if with_grounding and hasattr(dataset, "max_annotated_frames"):
            f_global = int(dataset.max_annotated_frames())
        f_cache = {}

        def collate_one(out, meta, li):
            """Assemble one batch's predictions.  Everything except the
            model outputs comes from the HOST-side meta (batching.py) — no
            device round trips for values the collate already knew."""
            n = len(meta["qid"])            # real examples in this batch
            pred_ids, span_st, span_ed = (out["pred_ids"], out["span_st"],
                                          out["span_ed"])
            if "grd_scores" in out and any(
                    bx is not None for bx in meta["boxes"]):
                att = assemble_att_predictions(
                    out["grd_scores"][:n], out["grd_idx"][:n],
                    out["grd_nacc"][:n], out["grd_nvalid"][:n],
                    meta["qas_words"], object_word_ids, meta["qid"],
                    meta["vid_name"], meta["image_indices"], meta["boxes"],
                    meta["anno_st"], li_total=li)
                predictions["raw_bbox"].extend(att)

            for j in range(n):
                qid = meta["qid"][j]
                a = int(pred_ids[j])
                img_ids = meta["image_indices"][j]
                first_img = img_ids[0] if img_ids else 1
                ts = spans_to_seconds(int(span_st[j, a]), int(span_ed[j, a]),
                                      first_img,
                                      self.cfg.py2_offset_div,
                                      self.cfg.frame_interval)
                predictions["ts_answer"][str(qid)] = [ts, a]

        def collate_host(out, batch_size, meta, li, stacked):
            """Host-side assembly of one dispatch's predictions (one batch,
            or K stacked same-bucket batches).  Runs while the NEXT dispatch
            executes on device (depth-1 pending queue below): jax dispatch
            is async, so the only sync point is the model-output fetch here.
            A partial batch can only be the LAST of a stack (shuffle-off
            iteration; only the epoch's final batch is partial), so the
            fixed-stride meta slicing stays aligned."""
            out = {k: np.asarray(v) for k, v in jax.device_get(out).items()}
            if not stacked:
                collate_one(out, meta, li)
                return
            k, b = out["pred_ids"].shape[0], batch_size
            for i in range(k):
                sub_meta = {key: v[i * b:(i + 1) * b]
                            for key, v in meta.items()}
                collate_one({key: v[i] for key, v in out.items()},
                            sub_meta, li)

        pending = None   # one in-flight dispatch
        for batch_idx, (batch, meta, _) in enumerate(pipeline):
            stacked = batch["ex_mask"].ndim == 2   # (K, B): grouped dispatch
            bsz = batch["ex_mask"].shape[-1]
            li = batch["ts_mask"].shape[-1]    # this bucket's frame axis
            if f_global is not None:
                f_max = min(li, max(1, f_global))
            else:
                f_need = max((len(bx) for bx in meta["boxes"] if bx),
                             default=0)
                f_max = f_cache.get(li, 4)
                while f_max < f_need:
                    f_max *= 2
                f_max = min(li, f_max)
                f_cache[li] = f_max
            step = self._infer_scan if stacked else self._infer_step
            out = step(self.params, batch, with_grounding=with_grounding,
                       f_max=f_max)
            if pending is not None:
                collate_host(*pending)
            pending = (out, bsz, meta, li, stacked)
            if debug:
                break
        if pending is not None:
            collate_host(*pending)
        return predictions
