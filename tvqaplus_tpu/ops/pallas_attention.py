"""Fused QA-context attention Pallas kernel (forward AND backward).

Fuses the whole ``qa_ctx_attention`` pipeline of STAGE (structured cosine
attention + BiDAF-style [qa; A; qa*A] concat + LayerNorm + dropout +
down-projection + ReLU, reference stage.py:365-387 /
context_query_attention.py:35-101) into one TPU kernel per direction.

Why: the train/eval step is activation-bandwidth-bound.  The pure-XLA path
materializes, per stream, S (B,A,Li,Lqa,Lr), its softmax, A (B,A,Li,Lqa,D)
and the 3D-wide concat (B,A,Li,Lqa,3D) in HBM — several hundred MB per step
at the reference shapes.  The kernel computes ``mixed`` directly and writes
only it (+ the raw scores needed by the attention loss); everything else
lives in VMEM/registers.

Grid: one program per (batch, frame); the 5 answers are statically unrolled
(Mosaic forbids the cross-lane reshape a merged (A*Lqa, D) layout would
need), so every op is a static-shape matmul on the MXU (bf16 inputs, f32
accumulation).

Dropout (training path):
* the similarity dropout of reference context_query_attention.py:95-96 acts
  on the kernel's *inputs* (the normalized embeddings ``cn``/``qn``) — the
  caller applies it in XLA, so its gradient flows through the custom_vjp
  inputs with no replay machinery;
* the projection dropout of reference stage.py:15-32 (LinearWrapper's
  LN -> Dropout -> Linear) is generated in-kernel with the TPU PRNG,
  seeded per (batch, frame) grid cell.  The backward kernel re-seeds
  identically and replays the same mask stream.

The backward is a REAL Pallas kernel (flash-attention-style: it re-derives
every intermediate from the saved kernel inputs in VMEM and accumulates
gradients across grid steps in revisited output blocks).  On non-TPU
backends the SAME backward kernel runs in Pallas interpret mode (slow but
exact); ``reference_impl`` exists only as the oracle for parity tests.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvqaplus_tpu.ops.masking import NEG_INF, SAFE_FLOOR

LN_EPS = 1e-5


def _keep_mask(shape, dropout_rate):
    """Draw one keep/(1-p) dropout scale from the TPU PRNG stream.

    MUST be called the same number of times, with the same shapes, in the
    same order, after the same ``pltpu.prng_seed``, in the forward and
    backward kernels — the backward replays the stream to reproduce the
    forward masks exactly."""
    bits = pltpu.prng_random_bits(shape)
    u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5  # [0, 1)
    return (u >= dropout_rate).astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))


def _frames_per_cell(li, m, lr, d, budget_bytes=None):
    """Frame-block size T: each grid cell processes T consecutive frames,
    amortizing per-cell launch latency AND merging T*M rows into single
    MXU matmuls for the row-local projection chain.

    Larger T = bigger matmuls but a bigger VMEM stack: the backward holds
    several (T*M, 3D) f32 intermediates live (xhat/keep/yd/g_yd/gx), plus
    per-frame softmax state.  Mosaic hard-fails past the 16 MB scoped-vmem
    limit, so T is the largest divisor of Li <= 10 whose estimated backward
    footprint fits the budget.  Forward and backward MUST use the same T —
    the dropout PRNG draw shape depends on it (stream replay).

    ``TVQA_ATTN_VMEM_BUDGET_MB`` overrides the 12 MB default for on-hardware
    recalibration (pair with scripts/check_pallas_tpu.py + the bench)."""
    if budget_bytes is None:
        budget_bytes = int(float(os.environ.get(
            "TVQA_ATTN_VMEM_BUDGET_MB", "12")) * 1024 * 1024)

    def footprint(t):
        rows = t * m
        return 4 * (5 * rows * 3 * d      # (T*M, 3D) f32 chain
                    + 6 * rows * d        # (T*M, D) rows/grads + the saved
                    #                       mixed block + relu_on mask
                    + 5 * rows * lr       # per-frame softmax state
                    + 2 * t * lr * d)     # qn/qe blocks
    for t in range(min(10, li), 0, -1):
        if li % t == 0 and footprint(t) <= budget_bytes:
            return t
    return 1


def _out_dtype(compute_dtype):
    """``mixed`` rides the compute dtype (bf16 halves the kernel's dominant
    HBM write + the consumer's read); ``raw`` stays f32 for the att-loss
    thresholds."""
    return jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16


def _attn_frame_fwd(cn, qn, qe, c_mask, q_mask, scale, ct):
    """Per-frame structured attention on answer-merged (M, .) rows; returns
    the intermediates the backward needs.  The 5 answers are MERGED into
    the matmul row axis (a leading-dim collapse Mosaic supports): one
    (A*Lqa, .) op chain instead of 5 unrolled small ones."""
    s = jax.lax.dot_general(
        cn, qn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, Lr)
    s_mask = c_mask * q_mask
    masked = s - NEG_INF * (s_mask - 1.0)               # s - 1e10*(1-m)

    zc = masked * scale
    z = jnp.maximum(zc, SAFE_FLOOR)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z)
    p0 = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p0 * s_mask

    a = jax.lax.dot_general(
        p.astype(ct), qe, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, D)
    return dict(s_mask=s_mask, masked=masked, zc=zc, p0=p0, p=p, a=a)


def _proj_fwd(ce_rows, a_rows, gamma, beta, w_ref, bias, scale_unused,
              dropout_rate, ct, skip_out=False):
    """LN([ce; a; ce*a]) -> dropout -> dense on FRAME-MERGED rows: the whole
    frame block's rows go through ONE (T*M, 3D) x (3D, D) matmul instead of
    T small ones (per-frame matmul latency dominated the round-2 kernel:
    merging frames into rows cut the per-cell op count ~5x).

    Draws exactly ONE (rows, 3D) keep mask from the TPU PRNG stream when
    dropout is active — forward and backward must call in the same order.

    ``skip_out=True`` (the backward's recompute): everything up to ``yd``
    is cheap VPU work, but the (rows, 3D) x (3D, D) output matmul is the
    recompute's dominant MXU cost — and the backward never needs the
    VALUES, only the ReLU sign, which it reads off the SAVED forward
    output (mixed > 0 <=> out > 0)."""
    rows, d = ce_rows.shape
    inv3d = 1.0 / (3 * d)
    cea = ce_rows * a_rows
    mean = (jnp.sum(ce_rows, -1, keepdims=True)
            + jnp.sum(a_rows, -1, keepdims=True)
            + jnp.sum(cea, -1, keepdims=True)) * inv3d
    var = (jnp.sum(jnp.square(ce_rows), -1, keepdims=True)
           + jnp.sum(jnp.square(a_rows), -1, keepdims=True)
           + jnp.sum(jnp.square(cea), -1, keepdims=True)) * inv3d \
        - jnp.square(mean)
    inv_std = jax.lax.rsqrt(var + LN_EPS)
    xhat = (jnp.concatenate([ce_rows, a_rows, cea], axis=-1)
            - mean) * inv_std                            # (rows, 3D)
    y = xhat * gamma + beta
    keep = _keep_mask((rows, 3 * d), dropout_rate) \
        if dropout_rate > 0.0 else None
    yd = y * keep if keep is not None else y
    out = None
    if not skip_out:
        out = jax.lax.dot_general(
            yd.astype(ct), w_ref[...].astype(ct), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bias   # (rows, D)
    return dict(inv_std=inv_std, xhat=xhat, keep=keep, yd=yd, out=out)


def _stack_rows(per_frame):
    """Concatenate per-frame (M, .) arrays along rows -> (T*M, .)."""
    return per_frame[0] if len(per_frame) == 1 else \
        jnp.concatenate(per_frame, axis=0)


def _fwd_kernel(seed_ref, cn_ref, ce_ref, qn_ref, qe_ref, cm_ref, qm_ref,
                gamma_ref, beta_ref, w_ref, b_ref,
                mixed_ref, *maybe_raw_ref, scale, dropout_rate,
                compute_dtype, raw_mode="full"):
    """One (batch, frame-block) cell.

    Refs (leading singleton block dims included):
      cn/ce: (1, A, Lqa, D) normalized(+sim-dropout) / raw QA embeddings
      qn/qe: (1, T, Lr, D) normalized(+sim-dropout) / raw context frames
      cm: (1, A, Lqa, 1) QA mask; qm: (1, T, 1, Lr) context mask
      gamma/beta: (1, 3D); w: (3D, D); b: (1, D)
      mixed_ref: (1, A, T, Lqa, D)
      raw_ref: the raw scores are the kernel's largest HBM write, so they
      are emitted only as consumed (``raw_mode``):
        "full":   (1, A, T, Lqa, Lr) — every answer (grounding inference,
                  parity tests);
        "target": (1, T, Lqa, Lr) — the example's target answer only (the
                  att loss reads nothing else in training; 1/A the bytes).
                  Per-example targets ride the scalar-prefetch operand
                  after the seed (``seed_ref[1 + batch_index]``);
        "none":   absent (sub stream in training, QA-only eval).
    """
    raw_ref = maybe_raw_ref[0] if maybe_raw_ref else None
    a_dim, lqa, d = cn_ref.shape[1:]
    t_frames = qn_ref.shape[1]
    ct = compute_dtype
    if dropout_rate > 0.0:
        # Mosaic accepts at most two seed values: fold the grid cell
        # into one (backward replays the identical seeding)
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))

    gamma = gamma_ref[0, :]
    beta = beta_ref[0, :]
    bias = b_ref[0, :]
    m = a_dim * lqa
    cn = cn_ref[0].reshape(m, d).astype(ct)
    ce = ce_ref[0].reshape(m, d).astype(jnp.float32)
    c_mask = cm_ref[0].reshape(m, 1).astype(jnp.float32)

    frames = []
    for t in range(t_frames):  # static unroll: per-frame attention only
        f = _attn_frame_fwd(cn, qn_ref[0, t].astype(ct),
                            qe_ref[0, t].astype(ct),
                            c_mask, qm_ref[0, t].astype(jnp.float32),
                            scale, ct)
        frames.append(f)
        if raw_ref is not None and raw_mode == "full":
            raw_ref[0, :, t] = f["masked"].reshape(a_dim, lqa, -1)
        elif raw_ref is not None:  # "target": fold out the answer dim
            tgt = seed_ref[1 + pl.program_id(0)]
            m3 = f["masked"].reshape(a_dim, lqa, -1)
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (a_dim, 1, 1), 0) == tgt
            raw_ref[0, t] = jnp.sum(jnp.where(sel, m3, 0.0), axis=0)

    # everything row-local (LN + dropout + projection) runs frame-MERGED
    a_rows = _stack_rows([f["a"] for f in frames])       # (T*M, D)
    ce_rows = _stack_rows([ce] * t_frames)
    pf = _proj_fwd(ce_rows, a_rows, gamma, beta, w_ref, bias, scale,
                   dropout_rate, ct)
    for t in range(t_frames):
        out_t = pf["out"][t * m:(t + 1) * m]
        mixed_ref[0, :, t] = jnp.maximum(out_t, 0.0).astype(
            mixed_ref.dtype).reshape(a_dim, lqa, d)


def _bwd_kernel(seed_ref, cn_ref, ce_ref, qn_ref, qe_ref, cm_ref, qm_ref,
                gamma_ref, beta_ref, w_ref, b_ref, gmix_ref, mix_ref, *refs,
                scale, dropout_rate, compute_dtype, raw_mode):
    """Backward cell: recompute the forward from the kernel inputs (flash
    style) — EXCEPT the projection's output matmul, whose only backward
    role is the ReLU sign, read off the SAVED forward output ``mix_ref``
    (mixed > 0 <=> out > 0; exact zeros mask identically) — replay the
    dropout stream, and accumulate all eight gradients.  Skipping that
    (T*M, 3D) x (3D, D) recompute removes ~30% of the backward's MXU
    FLOPs for one extra read of an output that already exists in HBM.
    Accumulation layout:
      gcn/gce (1, A, Lqa, D): revisited across frame blocks j (init at j==0)
      gqn/gqe (1, T, Lr, D):  one visit per (i, j)            (written fresh)
      ggamma/gbeta (1, 3D), gw (3D, D), gb (1, D): revisited across the
        whole grid (init at i == j == 0)
    TPU grid steps run sequentially, so read-modify-write is race-free.

    ``raw_mode`` mirrors the forward: "none" drops the graw input ref (no
    raw output existed) and the raw-score gradient term vanishes from
    g_s; "target" receives the (1, T, Lqa, Lr) target-answer cotangent
    and scatters it onto the target's rows.
    """
    if raw_mode != "none":
        graw_ref, *refs = refs
    (gcn_ref, gce_ref, gqn_ref, gqe_ref,
     ggamma_ref, gbeta_ref, gw_ref, gb_ref) = refs
    a_dim, lqa, d = cn_ref.shape[1:]
    t_frames, lr = qn_ref.shape[1:3]
    ct = compute_dtype
    i, j = pl.program_id(0), pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    @pl.when(j == 0)
    def _init_qa_grads():
        gcn_ref[...] = jnp.zeros_like(gcn_ref)
        gce_ref[...] = jnp.zeros_like(gce_ref)

    @pl.when((i == 0) & (j == 0))
    def _init_param_grads():
        ggamma_ref[...] = jnp.zeros_like(ggamma_ref)
        gbeta_ref[...] = jnp.zeros_like(gbeta_ref)
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    gamma = gamma_ref[0, :]
    beta = beta_ref[0, :]
    bias = b_ref[0, :]
    m = a_dim * lqa
    inv3d = 1.0 / (3 * d)
    cn = cn_ref[0].reshape(m, d).astype(ct)
    ce = ce_ref[0].reshape(m, d).astype(jnp.float32)
    c_mask = cm_ref[0].reshape(m, 1).astype(jnp.float32)

    gcn_acc = jnp.zeros((m, d), jnp.float32)
    ggamma_acc = jnp.zeros((1, 3 * d), jnp.float32)
    gbeta_acc = jnp.zeros((1, 3 * d), jnp.float32)
    gb_acc = jnp.zeros((1, d), jnp.float32)

    # recompute: per-frame attention, then the frame-MERGED projection
    # (replays the PRNG stream in the forward's draw order: one merged draw)
    frames = []
    for t in range(t_frames):
        frames.append(_attn_frame_fwd(
            cn, qn_ref[0, t].astype(ct), qe_ref[0, t].astype(ct),
            c_mask, qm_ref[0, t].astype(jnp.float32), scale, ct))
    a_rows = _stack_rows([f["a"] for f in frames])       # (T*M, D)
    ce_rows = _stack_rows([ce] * t_frames)
    pf = _proj_fwd(ce_rows, a_rows, gamma, beta, w_ref, bias, scale,
                   dropout_rate, ct, skip_out=True)

    # merged projection backward (one matmul pair for the whole block);
    # relu sign comes from the saved forward output, not a recompute
    g_mixed_rows = _stack_rows(
        [gmix_ref[0, :, t].reshape(m, d).astype(jnp.float32)
         for t in range(t_frames)])                      # (T*M, D)
    # compare in f32: Mosaic rejects vector cmpf on bf16 operands on this
    # target, and the bf16->f32 cast is exact so the sign mask is identical
    relu_on = _stack_rows(
        [(mix_ref[0, :, t].reshape(m, d).astype(jnp.float32) > 0)
         .astype(jnp.float32) for t in range(t_frames)])
    g_out = g_mixed_rows * relu_on                                 # relu
    gb_acc = gb_acc + jnp.sum(g_out, axis=0, keepdims=True)
    gw_acc = jax.lax.dot_general(
        pf["yd"].astype(ct), g_out.astype(ct), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (3D, D)
    g_yd = jax.lax.dot_general(
        g_out.astype(ct), w_ref[...].astype(ct), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (T*M, 3D)
    g_y = g_yd * pf["keep"] if pf["keep"] is not None else g_yd
    xhat = pf["xhat"]
    ggamma_acc = ggamma_acc + jnp.sum(g_y * xhat, 0, keepdims=True)
    gbeta_acc = gbeta_acc + jnp.sum(g_y, 0, keepdims=True)

    # LayerNorm stats backward over the (virtual-concat) 3D axis, merged
    gxh = g_y * gamma                                    # (T*M, 3D)
    m1 = jnp.sum(gxh, -1, keepdims=True) * inv3d
    m2 = jnp.sum(gxh * xhat, -1, keepdims=True) * inv3d
    gx = pf["inv_std"] * (gxh - m1 - xhat * m2)          # (T*M, 3D)
    gx0, gx1, gx2 = gx[:, :d], gx[:, d:2 * d], gx[:, 2 * d:]
    g_ce_rows = gx0 + gx2 * a_rows                       # (T*M, D)
    g_a_rows = gx1 + gx2 * ce_rows
    gce_acc = jnp.sum(g_ce_rows.reshape(t_frames, m, d), axis=0)

    # per-frame attention backward
    for t in range(t_frames):
        f = frames[t]
        qn = qn_ref[0, t].astype(ct)
        qe = qe_ref[0, t].astype(ct)
        g_a = g_a_rows[t * m:(t + 1) * m]

        g_p = jax.lax.dot_general(
            g_a.astype(ct), qe, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                    # (M, Lr)
        # gqe/gqn are written fresh per cell (never accumulated), so they
        # ride the PRIMAL dtype out of the kernel — skips XLA's f32->bf16
        # convert pass over two (B, Li, Lr, D) tensors per stream
        gqe_ref[0, t] = jax.lax.dot_general(
            f["p"].astype(ct), g_a.astype(ct), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(
                gqe_ref.dtype)                                     # (Lr, D)
        g_p0 = g_p * f["s_mask"]
        p0 = f["p0"]
        g_z = p0 * (g_p0 - jnp.sum(g_p0 * p0, axis=-1, keepdims=True))
        g_masked = g_z * scale * (f["zc"] > SAFE_FLOOR).astype(jnp.float32)
        g_s = g_masked
        if raw_mode == "full":
            g_s = g_s + graw_ref[0, :, t].reshape(m, lr)
        elif raw_mode == "target":  # scatter onto the target answer's rows
            tgt = seed_ref[1 + i]
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (a_dim, 1, 1), 0) == tgt
            g_full = jnp.where(sel, graw_ref[0, t][None], 0.0)
            g_s = g_s + g_full.reshape(m, lr)
        gcn_acc = gcn_acc + jax.lax.dot_general(
            g_s.astype(ct), qn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                    # (M, D)
        gqn_ref[0, t] = jax.lax.dot_general(
            g_s.astype(ct), cn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(
                gqn_ref.dtype)                                     # (Lr, D)

    gcn_ref[0] += gcn_acc.reshape(a_dim, lqa, d)
    gce_ref[0] += gce_acc.reshape(a_dim, lqa, d)
    ggamma_ref[...] += ggamma_acc
    gbeta_ref[...] += gbeta_acc
    gw_ref[...] += gw_acc
    gb_ref[...] += gb_acc


def _common_specs(bsz, num_a, lqa, d, li, lr, t):
    return [
        pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
        pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
        pl.BlockSpec((1, t, lr, d), lambda i, j, s: (i, j, 0, 0)),
        pl.BlockSpec((1, t, lr, d), lambda i, j, s: (i, j, 0, 0)),
        pl.BlockSpec((1, num_a, lqa, 1), lambda i, j, s: (i, 0, 0, 0)),
        pl.BlockSpec((1, t, 1, lr), lambda i, j, s: (i, j, 0, 0)),
        pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
        pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
        pl.BlockSpec((3 * d, d), lambda i, j, s: (0, 0)),
        pl.BlockSpec((1, d), lambda i, j, s: (0, 0)),
    ]


def _common_operands(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b):
    """Embeddings ride their NATIVE dtype into the kernel (bf16 under the
    bf16 policy — halves the dominant HBM reads; the kernel upcasts in
    VMEM).  Masks/params are small — normalize to f32."""
    bsz, num_a, lqa, d = cn.shape
    _, li, lr, _ = qn.shape
    return (cn, ce, qn, qe,
            c_mask.reshape(bsz, num_a, lqa, 1).astype(jnp.float32),
            q_mask.reshape(bsz, li, 1, lr).astype(jnp.float32),
            gamma.reshape(1, 3 * d).astype(jnp.float32),
            beta.reshape(1, 3 * d).astype(jnp.float32),
            w.astype(jnp.float32), b.reshape(1, d).astype(jnp.float32))


def _pack_scalars(seed, targets, bsz, raw_mode):
    """Scalar-prefetch operand: [seed] (+ per-example targets for the
    "target" raw mode — one prefetch slot keeps every index_map unary)."""
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if raw_mode != "target":
        return seed_arr
    tgt = jnp.zeros((bsz,), jnp.int32) if targets is None \
        else jnp.asarray(targets, jnp.int32).reshape(bsz)
    return jnp.concatenate([seed_arr, tgt])


def _pallas_forward(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                    scale, dropout_rate, seed, interpret=False,
                    compute_dtype=jnp.bfloat16, raw_mode="full",
                    targets=None):
    """Launch the forward kernel.  Shapes:
      cn/ce: (B, A, Lqa, D); qn/qe: (B, Li, Lr, D);
      c_mask: (B, A, Lqa); q_mask: (B, Li, Lr).
    Returns mixed (B, A, Li, Lqa, D) in the compute dtype and, per
    ``raw_mode``, raw_S in f32: (B, A, Li, Lqa, Lr) ("full") /
    (B, Li, Lqa, Lr) at the target answer ("target") / nothing ("none").
    """
    bsz, num_a, lqa, d = cn.shape
    _, li, lr, _ = qn.shape
    t = _frames_per_cell(li, num_a * lqa, lr, d)

    kernel = functools.partial(_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype,
                               raw_mode=raw_mode)
    out_specs = [pl.BlockSpec((1, num_a, t, lqa, d),
                              lambda i, j, s: (i, 0, j, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((bsz, num_a, li, lqa, d),
                                      _out_dtype(compute_dtype))]
    if raw_mode == "full":
        out_specs.append(pl.BlockSpec((1, num_a, t, lqa, lr),
                                      lambda i, j, s: (i, 0, j, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, num_a, li, lqa, lr), jnp.float32))
    elif raw_mode == "target":
        out_specs.append(pl.BlockSpec((1, t, lqa, lr),
                                      lambda i, j, s: (i, j, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, li, lqa, lr), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, li // t),
        in_specs=_common_specs(bsz, num_a, lqa, d, li, lr, t),
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(_pack_scalars(seed, targets, bsz, raw_mode),
      *_common_operands(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b))
    return (out[0], out[1]) if raw_mode != "none" else out[0]


def _pallas_backward(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                     g_mixed, g_raw, mixed, scale, dropout_rate, seed,
                     interpret=False, compute_dtype=jnp.bfloat16,
                     raw_mode="full", targets=None):
    """Launch the backward kernel; returns gradients for
    (cn, ce, qn, qe, gamma, beta, w, b).  ``g_raw`` matches the forward's
    ``raw_mode``: full (B, A, Li, Lqa, Lr) / target-answer
    (B, Li, Lqa, Lr) / ignored ("none").  ``mixed`` is the SAVED forward
    output (relu-sign source — skips the output-matmul recompute)."""
    bsz, num_a, lqa, d = cn.shape
    _, li, lr, _ = qn.shape
    t = _frames_per_cell(li, num_a * lqa, lr, d)

    kernel = functools.partial(_bwd_kernel, scale=scale,
                               dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype,
                               raw_mode=raw_mode)
    mix_spec = pl.BlockSpec((1, num_a, t, lqa, d),
                            lambda i, j, s: (i, 0, j, 0, 0))
    g_specs = [mix_spec, mix_spec]
    g_operands = [g_mixed, mixed]
    if raw_mode == "full":
        g_specs.append(pl.BlockSpec((1, num_a, t, lqa, lr),
                                    lambda i, j, s: (i, 0, j, 0, 0)))
        g_operands.append(g_raw.astype(jnp.float32))
    elif raw_mode == "target":
        g_specs.append(pl.BlockSpec((1, t, lqa, lr),
                                    lambda i, j, s: (i, j, 0, 0)))
        g_operands.append(g_raw.astype(jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, li // t),
        in_specs=_common_specs(bsz, num_a, lqa, d, li, lr, t) + g_specs,
        out_specs=[
            pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, t, lr, d), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, t, lr, d), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((3 * d, d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j, s: (0, 0)),
        ],
    )
    gcn, gce, gqn, gqe, ggamma, gbeta, gw, gb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, num_a, lqa, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, num_a, lqa, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, li, lr, d), qn.dtype),
            jax.ShapeDtypeStruct((bsz, li, lr, d), qe.dtype),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((3 * d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
    )(_pack_scalars(seed, targets, bsz, raw_mode),
      *_common_operands(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b),
      *g_operands)
    return (gcn, gce, gqn, gqe, ggamma.reshape(gamma.shape),
            gbeta.reshape(beta.shape), gw, gb.reshape(b.shape))


def reference_impl(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, scale):
    """Pure-JAX equivalent (no dropout) — numerics oracle for parity tests
    (the production backward is always the Pallas kernel; interpret mode
    off-TPU)."""
    s = jnp.einsum("bawd,bird->baiwr", cn, qn)
    s_mask = c_mask[:, :, None, :, None] * q_mask[:, None, :, None, :]
    masked = s - 1e10 * (1.0 - s_mask)
    p = jax.nn.softmax(jnp.maximum(masked * scale, SAFE_FLOOR), axis=-1)
    p = p * s_mask
    a = jnp.einsum("baiwr,bird->baiwd", p, qe)
    ce_b = jnp.broadcast_to(ce[:, :, None], a.shape)
    cat = jnp.concatenate([ce_b, a, ce_b * a], axis=-1)
    mean = jnp.mean(cat, -1, keepdims=True)
    var = jnp.var(cat, -1, keepdims=True)
    normed = (cat - mean) * jax.lax.rsqrt(var + LN_EPS) * gamma + beta
    mixed = jnp.maximum(jnp.einsum("baiwk,kd->baiwd", normed, w) + b, 0.0)
    return mixed, masked


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def fused_qa_ctx_attention(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                           seed, targets=None, scale=10.0,
                           compute_dtype=jnp.bfloat16,
                           dropout_rate=0.0, raw_mode="full"):
    """Pallas forward + Pallas backward (TPU) / rematerialized pure-JAX
    backward (interpret mode, dropout_rate == 0 only).

    ``seed`` is a traced int32 scalar: the projection-dropout PRNG seed,
    folded with the grid position per cell.  Ignored when
    ``dropout_rate == 0`` — pass 0.

    ``raw_mode`` sizes the raw-score output to its actual consumer (it is
    the kernel's largest HBM write + the matching backward read):
      "full":   (B, A, Li, Lqa, Lr) raw scores (grounding inference,
                parity tests);
      "target": (B, Li, Lqa, Lr) at each example's ``targets`` answer —
                all the att loss ever reads in training; 1/A the bytes
                each way and the loss-side answer gather disappears;
      "none":   no raw output at all (sub stream in training, QA-only
                eval) — saves ~(B*A*Li*Lqa*Lr)*4 bytes each way.
    """
    return _pallas_forward(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                           scale, dropout_rate=dropout_rate, seed=seed,
                           interpret=jax.default_backend() != "tpu",
                           compute_dtype=compute_dtype, raw_mode=raw_mode,
                           targets=targets)


def _fused_fwd(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, seed,
               targets, scale, compute_dtype, dropout_rate, raw_mode):
    out = fused_qa_ctx_attention(cn, ce, qn, qe, c_mask, q_mask, gamma,
                                 beta, w, b, seed, targets, scale,
                                 compute_dtype, dropout_rate, raw_mode)
    mixed = out[0] if raw_mode != "none" else out
    # `mixed` already lives in HBM for the consumer; saving it costs only
    # lifetime, and lets the backward skip the output-matmul recompute
    # (relu sign: mixed > 0 <=> out > 0)
    return out, (cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, seed,
                 targets, mixed)


def _fused_bwd(scale, compute_dtype, dropout_rate, raw_mode, residuals, g):
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0 and not on_tpu:
        raise NotImplementedError(
            "in-kernel dropout backward needs the TPU PRNG; non-TPU "
            "callers must use the pure-JAX path when dropout is active")
    (cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, seed,
     targets, mixed) = residuals
    g_mixed, g_raw = g if raw_mode != "none" else (g, None)
    gcn, gce, gqn, gqe, ggamma, gbeta, gw, gb = _pallas_backward(
        cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
        g_mixed, g_raw, mixed, scale, dropout_rate, seed,
        interpret=not on_tpu, compute_dtype=compute_dtype,
        raw_mode=raw_mode, targets=targets)
    # cotangents MUST ride the primal dtypes: the kernel accumulates in f32,
    # but under the bf16 policy cn/ce/qn/qe arrive bf16, and upstream
    # transpose rules (lax.div in l2_normalize/_dropout) reject mixed dtypes
    gcn, gce, gqn, gqe = (g.astype(p.dtype) for g, p in
                          ((gcn, cn), (gce, ce), (gqn, qn), (gqe, qe)))
    grads = (gcn, gce, gqn, gqe,
             jnp.zeros_like(c_mask), jnp.zeros_like(q_mask),
             ggamma, gbeta, gw, gb)
    g_seed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    g_targets = None if targets is None else \
        np.zeros(jnp.shape(targets), jax.dtypes.float0)
    return tuple(grads) + (g_seed, g_targets)


fused_qa_ctx_attention.defvjp(_fused_fwd, _fused_bwd)
