"""STAGE: Spatio-Temporal Answerer with Grounded Evidence, TPU-native.

Re-designs the reference network (``model/stage.py:55-806``) as a flax
module evaluated inside ONE jitted step:

* the five candidate answers are a batch axis (folded, never looped);
* frames (Li) are a batch axis for every per-frame op — encoding, structured
  attention and the classifier encoder all run as single large batched
  matmuls on the MXU;
* span proposals are a fixed (max_num_proposal+1)-slot axis with 0/1 weights
  (see spans.py) instead of the reference's ragged N_new batch, so training
  keeps a static shape;
* span search happens in-graph (the reference syncs to host numpy inside
  forward every step, model_utils.py:102-111).

Default hyper-surface matches reference config.py; every submodule cites its
reference counterpart.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.models import spans
from tvqaplus_tpu.models.attention import (
    _dropout,
    l2_normalize,
    structured_attention,
)
from tvqaplus_tpu.models.layers import (
    ConvLinear,
    DownProjection,
    InputEmbedding,
    LinearWrapper,
    MLPBridge,
    TriMLPBridge,
    StackedEncoder,
    mask_logits,
)

NUM_ANSWERS = 5


@dataclass(frozen=True)
class ModelConfig:
    """Static model hyper-parameters (subset of Config consumed on device)."""
    hsz: int = 128
    bridge_hsz: int = 300
    embedding_size: int = 768
    vfeat_size: int = 300
    dropout: float = 0.1
    scale: float = 10.0
    t_iter: int = 0
    t_layer_type: str = "linear"
    extra_span_length: int = 3
    add_local: bool = False
    sub_flag: bool = True
    vfeat_flag: bool = True
    non_visual: int = 0
    add_non_visual: bool = False
    max_num_proposal: int = 1
    input_encoder_n_blocks: int = 1
    input_encoder_n_conv: int = 2
    input_encoder_kernel_size: int = 7
    input_encoder_n_heads: int = 0
    cls_encoder_n_blocks: int = 1
    cls_encoder_n_conv: int = 2
    cls_encoder_kernel_size: int = 5
    cls_encoder_n_heads: int = 0
    compute_dtype: str = "float32"
    use_pallas: bool = False
    merge_input_streams: bool = False

    @classmethod
    def from_config(cls, cfg):
        return cls(
            hsz=cfg.hsz,
            embedding_size=cfg.embedding_size,
            vfeat_size=cfg.vfeat_size,
            dropout=cfg.dropout,
            scale=cfg.scale,
            t_iter=cfg.t_iter,
            t_layer_type=cfg.t_layer_type,
            extra_span_length=cfg.extra_span_length,
            add_local=cfg.add_local,
            sub_flag=cfg.sub_flag,
            vfeat_flag=cfg.vfeat_flag,
            non_visual=cfg.non_visual,
            add_non_visual=cfg.add_non_visual,
            max_num_proposal=cfg.max_num_proposal,
            input_encoder_n_blocks=cfg.input_encoder_n_blocks,
            input_encoder_n_conv=cfg.input_encoder_n_conv,
            input_encoder_kernel_size=cfg.input_encoder_kernel_size,
            input_encoder_n_heads=cfg.input_encoder_n_heads,
            cls_encoder_n_blocks=cfg.cls_encoder_n_blocks,
            cls_encoder_n_conv=cfg.cls_encoder_n_conv,
            cls_encoder_kernel_size=cfg.cls_encoder_kernel_size,
            cls_encoder_n_heads=cfg.cls_encoder_n_heads,
            compute_dtype=cfg.compute_dtype,
            use_pallas=cfg.use_pallas,
            merge_input_streams=getattr(cfg, "merge_input_streams", False),
        )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class STAGE(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dt = c.dtype
        # input projections (reference stage.py:85-138)
        # bridges stay on the XLA path: the fused bridge kernel
        # (ops/pallas_bridge.py) measured 0.77-0.99x at these shapes — the
        # 768-wide input caps VMEM-feasible rows/cell at ~250, and XLA's
        # own fusion of LN->dropout->dense is already competitive there
        self.bert_word_encoding_fc = MLPBridge(
            c.embedding_size, c.bridge_hsz, c.dropout, dt)
        if c.vfeat_flag:
            self.vid_fc = MLPBridge(c.vfeat_size, c.bridge_hsz, c.dropout,
                                    dt)
        if c.sub_flag and c.vfeat_flag:
            self.concat_fc = TriMLPBridge(c.hsz, c.dropout, dt,
                                          use_pallas=c.use_pallas)
        self.input_embedding = InputEmbedding(c.hsz, c.dropout, dt)
        # the SEPARATE input-encoder sites stay on the XLA path (the k=7
        # per-stream calls measured 0.6-1.05x with the fused kernel —
        # scripts/tune_enc_kernel.py / docs/BENCH.md); the MERGED site
        # (merge_input_streams: all three streams through one call with a
        # zero_mask) runs the fused kernel — one HBM pass over the padded
        # bytes is exactly what makes the merge profitable
        self.input_encoder = StackedEncoder(
            c.input_encoder_n_blocks, c.input_encoder_n_conv,
            c.input_encoder_kernel_size, c.input_encoder_n_heads,
            c.dropout, dt,
            use_pallas=c.use_pallas and c.merge_input_streams)
        self.c2q_down_projection = DownProjection(3 * c.hsz, c.hsz,
                                                  c.dropout, dt)
        self.cls_encoder = StackedEncoder(
            c.cls_encoder_n_blocks, c.cls_encoder_n_conv,
            c.cls_encoder_kernel_size, c.cls_encoder_n_heads, c.dropout, dt,
            use_pallas=c.use_pallas)
        # temporal refinement chain (reference stage.py:147-178)
        layers = [LinearWrapper(c.hsz, True, c.dropout, True, dt)]
        for _ in range(c.t_iter):
            layers.append(ConvLinear(c.hsz, 3, True, c.dropout, True, dt))
        self.cls_projection_layers = layers
        self.temporal_scoring_st_layers = [
            LinearWrapper(1, True, c.dropout, False, dt)
            for _ in range(c.t_iter + 1)]
        self.temporal_scoring_ed_layers = [
            LinearWrapper(1, True, c.dropout, False, dt)
            for _ in range(c.t_iter + 1)]
        self.classifier = LinearWrapper(1, True, c.dropout, False, dt)
        if c.non_visual > 0:
            self.non_visual_vectors = self.param(
                "non_visual_vectors", nn.initializers.normal(0.02),
                (c.non_visual, c.hsz))
        else:
            self.non_visual_vectors = None

    # ------------------------------------------------------------------
    def base_encoder(self, data, mask, init_encoder, *, train):
        """init bridge -> downsize -> stacked conv encoder
        (reference stage.py:350-363)."""
        x = init_encoder(data, train=train)
        x = self.input_embedding(x, train=train)
        return self.input_encoder(x, mask, train=train)

    def _gather_sub_windows(self, tok, idx):
        """Frame-aligned subtitle windows from the per-unique-token stream
        (sub_dedup contract; reference tvqa_dataset.py:164-185 expansion,
        done here on device at hsz).  ``tok`` (B, St, h), ``idx``
        (B, Li, Ls) int32 -> (B, Li, Ls, h)."""
        bsz_, li_, ls_ = idx.shape
        if self.cfg.use_pallas:
            # TPU policy: the window gather as a one-hot matmul — exact
            # (one nonzero per row), and both it and its transpose (the
            # backward scatter-add, the single largest non-kernel op at
            # 0.33 ms/step, profiled r4) run on the MXU instead of the
            # row-DMA gather engine
            onehot = (idx.reshape(bsz_, li_ * ls_)[..., None]
                      == jnp.arange(tok.shape[1])[None, None]
                      ).astype(tok.dtype)
            win = jnp.einsum("bws,bsd->bwd", onehot, tok)
        else:
            win = jnp.take_along_axis(
                tok, idx.reshape(bsz_, li_ * ls_)[..., None], axis=1)
        return win.reshape(bsz_, li_, ls_, tok.shape[-1])

    def _merged_input_encode(self, qa_pre, sub_pre, vid_pre, *, train):
        """ONE input_encoder call over the qa/sub/vid streams.

        The three post-bridge embeddings are zero-padded on L to the
        longest stream and concatenated on the group axis — (B, A, Lqa, h)
        + (B, Li, Ls, h) + (B, Li, Lr, h) -> (B, A+2*Li, Lmax, h) — so the
        encoder's convs/LNs run as one set of large ops instead of three
        (the base_enc bucket was ~30 small XLA ops at 2.18 ms/step,
        docs/BENCH.md r4).  A static per-group ``zero_mask`` re-zeroes each
        conv's input past a stream's true length, making every tap read
        exactly what per-stream SAME padding would — the split outputs
        equal the separate calls exactly (see EncoderBlock.__call__)."""
        a, lqa = qa_pre.shape[1], qa_pre.shape[2]
        li, ls = sub_pre.shape[1], sub_pre.shape[2]
        lr = vid_pre.shape[2]
        lmax = max(lqa, ls, lr)

        def padded(x):
            pad = lmax - x.shape[2]
            if pad == 0:
                return x
            return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

        merged = jnp.concatenate(
            [padded(qa_pre), padded(sub_pre), padded(vid_pre)], axis=1)
        lens = np.concatenate([np.full(a, lqa), np.full(li, ls),
                               np.full(li, lr)])
        zm = jnp.asarray(
            (np.arange(lmax)[None, :] < lens[:, None]), self.cfg.dtype)
        enc = self.input_encoder(merged, None, train=train, zero_mask=zm)
        return (enc[:, :a, :lqa], enc[:, a:a + li, :ls],
                enc[:, a + li:, :lr])

    def qa_ctx_attention(self, qa_embed, ctx_embed, qa_mask, ctx_mask, *,
                         train, use_void=False, need_raw=True,
                         targets=None, noun_mask=None):
        """Structured attention + BiDAF-style fusion
        (reference stage.py:365-387).

        With ``use_pallas`` (and no non-default void vectors) the whole
        pipeline runs as one fused TPU kernel with a real Pallas backward —
        see ops/pallas_attention.py.  Training dropout is split across its
        two reference sites: the similarity dropout
        (context_query_attention.py:95-96) is applied here on the normalized
        kernel *inputs* (gradients flow through the custom_vjp inputs), the
        projection dropout (stage.py:15-32) runs in-kernel via the TPU PRNG
        (the backward kernel replays the stream).  On non-TPU backends the
        dropout path falls back to pure JAX — interpret mode has no TPU PRNG.
        """
        c = self.cfg
        use_void = use_void and c.non_visual > 0
        dropout_active = train and c.dropout > 0.0
        kernel_ok = c.use_pallas and not use_void and noun_mask is None and (
            not dropout_active or jax.default_backend() == "tpu")
        if kernel_ok:
            from tvqaplus_tpu.ops.pallas_attention import \
                fused_qa_ctx_attention
            dp = self.c2q_down_projection
            ce = qa_embed[:, :, 0]                       # (B, A, Lqa, D)
            qe = ctx_embed[:, 0]                         # (B, Li, Lc, D)
            cn, qn = l2_normalize(ce), l2_normalize(qe)
            seed = jnp.zeros((), jnp.int32)
            if dropout_active:
                rng = self.make_rng("dropout")
                rng_c, rng_q, rng_seed = jax.random.split(rng, 3)
                cn = _dropout(cn, c.dropout, rng_c)      # similarity dropout
                qn = _dropout(qn, c.dropout, rng_q)
                seed = jax.random.randint(rng_seed, (), 0, 2 ** 31 - 1,
                                          dtype=jnp.int32)
            raw_mode = {True: "full", False: "none",
                        "target": "target"}[need_raw]
            out = fused_qa_ctx_attention(
                cn, ce, qn, qe, qa_mask[:, :, 0], ctx_mask[:, 0],
                dp.ln_scale, dp.ln_bias, dp.kernel, dp.bias, seed,
                targets if raw_mode == "target" else None, c.scale,
                c.dtype, c.dropout if dropout_active else 0.0, raw_mode)
            mixed, raw_s = out if raw_mode != "none" else (out, None)
            # mixed_mask = (s_mask.sum(-1) != 0): word valid & any region
            any_region = (jnp.sum(ctx_mask[:, 0], -1) > 0)   # (B, Li)
            mixed_mask = (qa_mask[:, :, 0][:, :, None, :]
                          * any_region[:, None, :, None]).astype(jnp.float32)
            return mixed, mixed_mask, raw_s, None

        rng = self.make_rng("dropout") if train else None
        void = self.non_visual_vectors if use_void else None
        u_a, raw_s, s_mask, s_norm = structured_attention(
            qa_embed, ctx_embed, qa_mask, ctx_mask, scale=c.scale,
            dropout_rate=c.dropout if train else 0.0, dropout_rng=rng,
            noun_mask=noun_mask, void_vector=void,
            add_void=c.add_non_visual)
        num_img = ctx_mask.shape[2]
        qa_b = jnp.broadcast_to(
            qa_embed, qa_embed.shape[:2] + (num_img,) + qa_embed.shape[3:])
        mixed = jnp.concatenate([qa_b, u_a, qa_b * u_a], axis=-1)
        mixed = self.c2q_down_projection(mixed, train=train)
        mixed_mask = (jnp.sum(s_mask, -1) != 0).astype(jnp.float32)
        if need_raw == "target":  # gather the target answer (XLA DCEs the
            # rest of raw_s when nothing else reads it)
            b = raw_s.shape[0]
            raw_s = raw_s[jnp.arange(b), targets]
        return mixed, mixed_mask, raw_s, s_norm

    # ------------------------------------------------------------------
    def __call__(self, batch, *, train: bool, need_sub_raw: bool = True,
                 need_vid_raw: bool = True):
        """Forward pass.

        Args:
          batch: static-shape dict (see data/batching.py).
          train: enables dropout and the GT-anchored proposal branch.
          need_sub_raw / need_vid_raw: emit the raw cosine-score tensors
            (B, A, Li, Lqa, Lc) — the largest forward outputs.  The train
            step needs only the vid one AND only at the target answer
            (att loss) — pass need_vid_raw="target" to emit
            ``vid_raw_target_s`` (B, Li, Lqa, Lr) instead, 1/A the bytes;
            QA-only eval needs neither, grounding inference needs full
            vid.  Under the fused kernel False/"target" shrink the HBM
            write + backward read (the XLA path relies on DCE).  Defaults
            keep every output (parity tests).

        Returns a dict:
          answer_scores: (B, P, A) train+add_local / (B, A) otherwise
          proposal_weights: (B, P) (ones when not add_local)
          t_scores: (B, A, Li, 2) masked span logits
          sub_raw_s / vid_raw_s: raw cosine scores (for att loss/predictions)
        """
        c = self.cfg
        bsz, num_a, lqa = batch["qas_mask"].shape
        out = {}

        # every encoder works on (..., L, D) with leading batch dims intact,
        # so data-parallel (B) and context-parallel (Li) shardings survive
        # the whole forward without GSPMD reshuffles.
        # inputs ride their arrival dtype (bf16 bandwidth-optimized upload
        # under the bf16 policy; f32 in parity tests) — a forced f32 cast
        # here would materialize an extra full pass over the biggest
        # tensors (profiled: ~0.6 ms/step at bench shapes)
        # stream encodings.  With merge_input_streams (and a sub_dedup
        # batch) all three streams run through ONE input_encoder call —
        # see _merged_input_encode; the separate path below is the
        # reference-shaped fallback (and the non-dedup configs').
        # heads > 0 would run the encoder's attention branch with mask=None
        # on the merged view (losing the per-example mask) — fall back to
        # the exact separate-stream path there (ADVICE r4)
        merged = (c.merge_input_streams and c.sub_flag and c.vfeat_flag
                  and c.input_encoder_n_heads == 0
                  and "sub_tokens" in batch)
        sub_embed = vid_embed = None
        if merged:
            qa_pre = self.input_embedding(
                self.bert_word_encoding_fc(batch["qas_bert"], train=train),
                train=train)
            # dedup contract (config.py sub_dedup): the bridge +
            # input_embedding (both token-pointwise, reference
            # stage.py:85-120) run ONCE per unique subtitle token of
            # the video stream — the reference h5's native layout —
            # and the frame-aligned windows (tvqa_dataset.py:164-185)
            # are gathered at hsz on device.  Invalid window slots
            # gather the reserved all-zero token 0, whose encoding
            # equals the expanded path's bridge(0) padding rows, so
            # the conv encoder sees identical inputs.
            tok = self.bert_word_encoding_fc(batch["sub_tokens"],
                                             train=train)
            tok = self.input_embedding(tok, train=train)      # (B, St, h)
            win = self._gather_sub_windows(tok, batch["sub_win_idx"])
            vid_pre = self.input_embedding(
                self.vid_fc(l2_normalize(batch["vid"]), train=train),
                train=train)                            # (stage.py:256)
            a_embed, sub_embed, vid_embed = self._merged_input_encode(
                qa_pre, win, vid_pre, train=train)
        else:
            a_embed = self.base_encoder(
                batch["qas_bert"], batch["qas_mask"],
                self.bert_word_encoding_fc, train=train)
            if c.sub_flag:
                if "sub_tokens" in batch:
                    # dedup contract — see the merged branch above
                    tok = self.bert_word_encoding_fc(batch["sub_tokens"],
                                                     train=train)
                    tok = self.input_embedding(tok, train=train)
                    win = self._gather_sub_windows(tok,
                                                   batch["sub_win_idx"])
                    sub_embed = self.input_encoder(win, batch["sub_mask"],
                                                   train=train)
                else:
                    sub_embed = self.base_encoder(
                        batch["sub_bert"], batch["sub_mask"],
                        self.bert_word_encoding_fc, train=train)
            if c.vfeat_flag:
                vid_embed = self.base_encoder(
                    l2_normalize(batch["vid"]),         # (stage.py:256)
                    batch["vid_mask"], self.vid_fc, train=train)
        a_embed = a_embed[:, :, None]                   # (B, A, 1, Lqa, h)
        a_mask = batch["qas_mask"][:, :, None]          # (B, A, 1, Lqa)

        attended_sub = attended_vid = None
        attended_sub_mask = attended_vid_mask = None
        # optional noun-position gate on the similarity rows (reference
        # qa_ctx_attention's noun_mask arg, stage.py:365-380; always None
        # in the reference — wired here when the batch carries the masks)
        noun_mask = batch.get("qa_noun_masks")
        if c.sub_flag:
            sub_embed = sub_embed[:, None]              # (B, 1, Li, Ls, h)
            sub_mask = batch["sub_mask"][:, None]
            attended_sub, attended_sub_mask, sub_raw_s, sub_norm_s = \
                self.qa_ctx_attention(a_embed, sub_embed, a_mask, sub_mask,
                                      train=train, need_raw=need_sub_raw,
                                      noun_mask=noun_mask)
            if need_sub_raw:
                out["sub_raw_s"] = sub_raw_s
                out["sub_normalized_s"] = sub_norm_s

        if c.vfeat_flag:
            vid_embed = vid_embed[:, None]              # (B, 1, Li, Lr, h)
            vid_mask = batch["vid_mask"][:, None]
            attended_vid, attended_vid_mask, vid_raw_s, vid_norm_s = \
                self.qa_ctx_attention(a_embed, vid_embed, a_mask, vid_mask,
                                      train=train,
                                      use_void=c.non_visual > 0,
                                      need_raw=need_vid_raw,
                                      targets=batch.get("target"),
                                      noun_mask=noun_mask)
            if need_vid_raw == "target":
                out["vid_raw_target_s"] = vid_raw_s   # (B, Li, Lqa, Lr)
            elif need_vid_raw:
                out["vid_raw_s"] = vid_raw_s
                out["vid_normalized_s"] = vid_norm_s

        if c.sub_flag and c.vfeat_flag:
            # tri-concat + MLP bridge; with use_pallas the concat is never
            # materialized (fused kernel, ops/pallas_tri_bridge.py)
            statement = self.concat_fc(attended_sub, attended_vid,
                                       train=train)
            statement_mask = attended_vid_mask
        elif c.sub_flag:
            statement, statement_mask = attended_sub, attended_sub_mask
        elif c.vfeat_flag:
            statement, statement_mask = attended_vid, attended_vid_mask
        else:
            raise NotImplementedError("need at least one of sub/vfeat streams")

        scores, weights, t_scores = self.classifier_head_multi_proposal(
            statement, statement_mask, batch, train=train)
        out["answer_scores"] = scores
        out["proposal_weights"] = weights
        out["t_scores"] = t_scores
        return out

    # ------------------------------------------------------------------
    def residual_temporal_predictor(self, layer_idx, x, *, train):
        """x += proj(x); score st/ed heads (reference stage.py:469-482)."""
        x = x + self.cls_projection_layers[layer_idx](x, train=train)
        st = self.temporal_scoring_st_layers[layer_idx](x, train=train)
        ed = self.temporal_scoring_ed_layers[layer_idx](x, train=train)
        return x, jnp.concatenate([st, ed], axis=-1)

    def classifier_head_multi_proposal(self, statement, statement_mask, batch,
                                       *, train):
        """Answer scoring over (local span + global) pooled statements
        (reference stage.py:484-537).

        statement: (B, A, Li, Lqa, D); statement_mask: (B, A, Li, Lqa).
        """
        c = self.cfg
        bsz, num_a, num_img, num_words = statement_mask.shape
        # encoder + masked word-max in one op (reference stage.py:500-505);
        # the fused kernel folds the max in so the (B, A, Li, Lqa, D)
        # encoder output never reaches HBM
        max_statement = self.cls_encoder(statement, statement_mask,
                                         train=train,
                                         reduce_mask=statement_mask)
        max_statement_mask = (jnp.sum(statement_mask, -1) != 0).astype(
            jnp.float32)[..., None]                     # (B, A, Li, 1)
        x = max_statement                               # (B, A, Li, h)

        # temporal chain.  Note the reference's ensemble quirk
        # (stage.py:515-516): 0.5*(t0 + stack(container[:1]).mean(0)) == t0,
        # so the span scores are ALWAYS layer 0's; layers i>0 only extend the
        # (gradient-dead) chain.  Replicated exactly.
        t0 = None
        for i in range(c.t_iter + 1):
            x, t = self.residual_temporal_predictor(i, x, train=train)
            if i == 0:
                t0 = t
                stacked_max_statement = x               # (B, A, Li, h)
        t_scores = mask_logits(
            t0, batch["ts_mask"].reshape(bsz, 1, num_img, 1))

        if c.add_local:
            pooled, weights = self._proposal_pooling(
                stacked_max_statement, max_statement_mask, t_scores, batch,
                train=train)
            # train: pooled (B, P, A, 2D) -> scores (B, P, A)
            # eval:  pooled (B, A, 2D)    -> scores (B, A)
            scores = self.classifier(pooled, train=train)[..., 0]
        else:
            global_pool = jnp.max(
                mask_logits(stacked_max_statement, max_statement_mask),
                axis=2)  # (B, A, D)
            scores = self.classifier(global_pool, train=train)[..., 0]
            weights = jnp.ones((bsz, 1), jnp.float32)
        return scores, weights, t_scores

    def _proposal_pooling(self, x, msm, t_scores, batch, *, train):
        """Local+global masked max-pools over proposal windows.

        x: (B, A, Li, D) level-0 encoded statements;
        msm: (B, A, Li, 1) valid-image mask.
        """
        c = self.cfg
        bsz, num_a, num_img, _ = x.shape
        valid = msm[..., 0]                                   # (B, A, Li)
        global_pool = jnp.max(mask_logits(x, msm), axis=2)     # (B, A, D)
        if train:
            # GT-anchored proposals from the correct answer's span scores
            # (stage.py:408-418); scores detached as in the reference (.data)
            t_ca = jax.lax.stop_gradient(
                t_scores[jnp.arange(bsz), batch["target"]])    # (B, Li, 2)
            st, ed_excl, weights = spans.training_proposals(
                t_ca, batch["ts_st"], batch["ts_ed"],
                batch["ts_mask"], max_num_proposal=c.max_num_proposal)
            # window masks (B, P, Li) -> (B, P, A, Li)
            wmask = spans.expand_window_mask(
                st, ed_excl, num_img, extra=c.extra_span_length)
            wmask = wmask[:, :, None, :] * valid[:, None, :, :]
            local = jnp.max(
                mask_logits(x[:, None], wmask[..., None]), axis=3)
            glob = jnp.broadcast_to(global_pool[:, None],
                                    local.shape)               # (B,P,A,D)
            return jnp.concatenate([local, glob], -1), weights
        else:
            st, ed_excl = spans.eval_proposals(t_scores, batch["ts_mask"])
            wmask = spans.expand_window_mask(
                st, ed_excl, num_img, extra=c.extra_span_length) * valid
            local = jnp.max(mask_logits(x, wmask[..., None]), axis=2)
            return (jnp.concatenate([local, global_pool], -1),
                    jnp.ones((bsz, 1), jnp.float32))
