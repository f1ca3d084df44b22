"""Fused QANet encoder-block Pallas kernel (forward AND backward).

Fuses STAGE's ``EncoderBlock`` at the default configuration
(reference encoder.py:9-52 with n_conv=2, num_heads=0): positional
encoding + 2 x [LN -> (dropout on even convs) -> depthwise-separable conv
-> ReLU -> residual] + final LN, on (..., L, D) sequences.

Why: the encoder runs at FOUR sites per step (qa/sub/vid input encoding and
the classifier encoder over the (B, A, Li, Lqa, D) statement) and its
pure-XLA forward+backward is ~12 HBM passes over the activation —
~7 ms/step of a 15.7 ms step at bench shapes (profiled, cls_encoder +
input_encoder share).  The kernel reads x once and writes the result once;
every intermediate lives in VMEM.

Layout: the wrapper views x as (B, G, L, D) (G = all leading dims merged —
free reshape) and grids over (B, G/Tg).  In-kernel, rowwise ops (LN,
pointwise matmul) run on the (Tg*L, D) row-collapse; the depthwise conv
runs on the (Tg, L, D) view with static shifted slices along L
(zero-padded per sequence, matching reference cnn.py:6-47).

Dropout (reference encoder.py:41: even conv indices only, i.e. conv_0)
uses the TPU-PRNG replay scheme of ops/pallas_attention.py.  Non-TPU
backends fall back to pure JAX when dropout is active.

Falls back to the unfused module path for non-default configs
(num_heads > 0, n_conv != 2).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvqaplus_tpu.ops.pallas_attention import (
    LN_EPS,
    _keep_mask,
    _out_dtype,
)


def _seqs_per_cell(g, l, d, k, bwd=False, budget_bytes=13 * 1024 * 1024):
    """Sequences per grid cell: largest divisor of G (<= 64) whose VMEM
    footprint fits Mosaic's scoped stack.

    The footprint model is ``4 * (base + tap_cost*k) * rows * D`` bytes of
    live f32-equivalents:

    * forward: base ~ the LN/matmul transients (TVQA_ENC_FWD_BASE);
    * backward (TVQA_ENC_BWD_BASE): the round-5 TWO-PASS backward keeps
      only one conv layer's stash live at a time (layer 0 is recomputed
      after layer 1's backward frees its stash) and stores the stash in
      bf16 under the bf16 policy — roughly half the old single-pass
      liveness (~15 f32/row).  Defaults are the conservative round-4
      calibration; recalibrate ON HARDWARE with
      ``scripts/tune_enc_kernel.py`` (it sweeps these env vars), then bake
      the measured constants.
    * tap_cost: live rotated copies per conv tap (running roll ~O(1)
      amortized; the f32 upcast for pltpu.roll adds transients).
    """
    tap_cost = float(os.environ.get("TVQA_ENC_TAP_COST", "2"))
    base = float(os.environ.get("TVQA_ENC_BWD_BASE", "15")) if bwd \
        else float(os.environ.get("TVQA_ENC_FWD_BASE", "15"))

    def footprint(t):
        return 4 * (base + tap_cost * k) * t * l * d
    best = 1
    for t in range(1, min(64, g) + 1):
        if g % t == 0 and footprint(t) <= budget_bytes:
            best = t
    return best


def _ln_f(x, scale, bias):
    """flax.linen.LayerNorm numerics: f32 fast-variance stats (clipped at
    0), f32 normalize+affine.  Returns (out_f32, xhat, inv_std)."""
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x), -1, keepdims=True) - jnp.square(mean), 0.0)
    inv_std = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mean) * inv_std
    return xhat * scale + bias, xhat, inv_std


def _ln_bwd(g, xhat, inv_std, scale):
    """d(LN)/dx given upstream g; also returns (gscale, gbias) sums."""
    d = xhat.shape[-1]
    gxh = g * scale
    m1 = jnp.sum(gxh, -1, keepdims=True) * (1.0 / d)
    m2 = jnp.sum(gxh * xhat, -1, keepdims=True) * (1.0 / d)
    gx = inv_std * (gxh - m1 - xhat * m2)
    return gx, jnp.sum(g * xhat, 0, keepdims=True), \
        jnp.sum(g, 0, keepdims=True)


def _roll_rows(x2, shift):
    """Circular row shift; out[p] = x2[(p + shift) % rows].

    Compiled path uses the hardware sublane rotator (pltpu.roll) — padded
    copies + unaligned static slices cost ~7x more (measured: the k=7
    slice-based conv backward ran 25 us/cell vs ~3.5 us with rolls)."""
    if shift == 0:
        return x2
    if jax.default_backend() == "tpu":
        # pltpu.roll requires a non-negative shift; circular => mod rows
        return pltpu.roll(x2, shift=(-shift) % x2.shape[0], axis=0)
    return jnp.roll(x2, -shift, axis=0)


def _seq_masks(rows, l, k, dtype=jnp.float32):
    """Per-shift validity masks for a sequence-local conv on row-collapsed
    (rows = Tg*L) arrays: position p may read p+s only within its own
    sequence (zero padding semantics of reference cnn.py:33-39)."""
    pad = k // 2
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % l
    return {s: ((r + s >= 0) & (r + s < l)).astype(dtype)
            for s in range(-pad, pad + 1)}


def _combined_masks(masks, v2, k):
    """Fold a per-row zero mask v (rows, 1) into the per-shift conv masks:
    tap s of output position p reads input p+s only when that position is
    in-sequence AND un-zeroed (the merged-stream ``zero_mask`` contract,
    models/layers.py EncoderBlock).  v is constant per sequence position,
    so the read-side factor is roll(v, s)."""
    if v2 is None:
        return masks
    pad = k // 2
    return {s: masks[s] * _roll_rows(v2, s) for s in range(-pad, pad + 1)}


def _dwconv_f(x2, dw, dwb, k, masks):
    """Depthwise stage on (rows, D): RUNNING roll — consecutive taps read
    shifts differing by 1, so one rotated copy evolves via single-row
    rolls instead of k independent rolls staying live at once (the VMEM
    ceiling that capped rows/cell, see _seqs_per_cell)."""
    pad = k // 2
    out = dwb * jnp.ones_like(x2)
    r = _roll_rows(x2, -pad)
    for j in range(k):
        out = out + dw[j] * (r * masks[j - pad])
        if j < k - 1:
            r = _roll_rows(r, 1)
    return out


def _dwconv_bwd_x(g2, dw, k, masks):
    """dX of the depthwise stage: out[p] read x[p+s], so
    dX[q] += dw * g[q-s] where the read was in-sequence.
    roll(g*m_s, -s) == roll(g, -s) * roll(m_s, -s): the rolled mask is the
    static write-side mask, and roll(g, -s) runs as a running roll."""
    pad = k // 2
    gx = jnp.zeros_like(g2)
    r = _roll_rows(g2, pad)                            # roll(g, -(-pad))
    for j in range(k):
        s = j - pad
        gx = gx + dw[j] * (r * masks[-s])              # masks[-s] == rolled
        if j < k - 1:
            r = _roll_rows(r, -1)
    return gx


def _dwconv_bwd_w(x2, g2, k, masks):
    """dDW (k, D) and dDWB (1, D) of the depthwise stage (running roll)."""
    pad = k // 2
    taps = []
    r = _roll_rows(x2, -pad)
    for j in range(k):
        taps.append(jnp.sum(r * masks[j - pad] * g2, axis=0, keepdims=True))
        if j < k - 1:
            r = _roll_rows(r, 1)
    gdw = jnp.concatenate(taps, axis=0)                 # (k, D)
    gdwb = jnp.sum(g2, axis=0, keepdims=True)           # (1, D)
    return gdw, gdwb


def _conv_layer_fwd(h2, ln_s, ln_b, dw, dwb, pw_ref, pwb, k, ct,
                    dropout_rate, masks2, stash_dt=jnp.float32):
    """One LN -> (dropout) -> dsconv -> ReLU -> residual layer on
    row-collapsed (rows, D).  dropout_rate > 0 draws ONE keep mask.

    ``masks2``: per-shift conv masks (in-sequence x optional zero mask).
    ``stash_dt``: dtype of the saved-for-backward intermediates.  bf16
    halves the backward's VMEM liveness; it is EXACT for the relu sign
    (0/1) and for ``c`` whenever the matmuls run bf16 anyway (ct == bf16),
    and adds one rounding to ``xhat``/``ln_d`` (LN-input and depthwise
    weight grads only)."""
    rows, d = h2.shape
    ln_out, xhat, inv_std = _ln_f(h2, ln_s, ln_b)
    keep = _keep_mask((rows, d), dropout_rate) if dropout_rate > 0.0 else None
    ln_d = ln_out * keep if keep is not None else ln_out
    # depthwise stage stays f32: the hardware rotator (pltpu.roll) only
    # handles 32-bit data, and the k FMAs are cheap VPU work
    c = _dwconv_f(ln_d, dw, dwb, k, masks2)
    y1 = jax.lax.dot_general(
        c.astype(ct), pw_ref[...].astype(ct), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + pwb        # (rows, D)
    y2 = jnp.maximum(y1, 0.0)
    out2 = y2 + h2                                       # residual
    return dict(xhat=xhat.astype(stash_dt), inv_std=inv_std, keep=keep,
                ln_d=ln_d.astype(stash_dt), c=c.astype(stash_dt),
                sign=(y1 > 0.0).astype(stash_dt), out2=out2)


def _conv_layer_bwd(g2, f, ln_s, dw, pw_ref, k, ct, masks, masks2,
                    v2=None):
    """Backward of _conv_layer_fwd.  g2: (rows, D) cotangent of out2.
    Returns g wrt h2 (incl. residual) and the param grad tuple.

    ``masks`` are the base in-sequence masks (dX uses the rolled-mask
    identity, which the zero-mask factor does NOT satisfy — its read-side
    value v(q) is position-local, so it multiplies gx directly as ``v2``);
    ``masks2`` carry the zero-mask factor for the weight grads."""
    f32 = jnp.float32
    g_y1 = g2 * f["sign"].astype(f32)
    gpwb = jnp.sum(g_y1, 0, keepdims=True)
    gpw = jax.lax.dot_general(
        f["c"].astype(ct), g_y1.astype(ct),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g_c = jax.lax.dot_general(
        g_y1.astype(ct), pw_ref[...].astype(ct), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (rows, D)
    gdw, gdwb = _dwconv_bwd_w(f["ln_d"].astype(f32), g_c, k, masks2)
    g_lnd = _dwconv_bwd_x(g_c, dw, k, masks)
    if v2 is not None:
        g_lnd = g_lnd * v2                   # d(x * zero_mask)/dx
    g_ln = g_lnd * f["keep"] if f["keep"] is not None else g_lnd
    g_h, g_ls, g_lb = _ln_bwd(g_ln, f["xhat"].astype(f32), f["inv_std"],
                              ln_s)
    return g_h + g2, (g_ls, g_lb, gdw, gdwb, gpw, gpwb)  # residual


def _layer0_fwd(h0, params, k, ct, dropout_rate, masks2, stash_dt):
    """conv layer 0 (dropout on even conv indices, reference encoder.py:41)."""
    return _conv_layer_fwd(h0, params["ln0_s"], params["ln0_b"],
                           params["dw0"], params["dwb0"], params["pw0"],
                           params["pwb0"], k, ct, dropout_rate, masks2,
                           stash_dt)


def _layer1_fwd(h1, params, k, ct, masks2, stash_dt):
    return _conv_layer_fwd(h1, params["ln1_s"], params["ln1_b"],
                           params["dw1"], params["dwb1"], params["pw1"],
                           params["pwb1"], k, ct, 0.0, masks2, stash_dt)


def _block_fwd(x3, pe, params, k, ct, dropout_rate, v2=None,
               stash_dt=jnp.float32):
    """Full block forward; x3: (Tg, L, D) block view, everything after the
    positional add runs on the (Tg*L, D) row collapse."""
    tg, l, d = x3.shape
    rows = tg * l
    masks = _seq_masks(rows, l, k)
    masks2 = _combined_masks(masks, v2, k)
    h0 = (x3 + pe).reshape(rows, d)                      # pos encoding
    f0 = _layer0_fwd(h0, params, k, ct, dropout_rate, masks2, stash_dt)
    f1 = _layer1_fwd(f0["out2"], params, k, ct, masks2, stash_dt)
    out, xhat_f, inv_std_f = _ln_f(f1["out2"], params["lnf_s"],
                                   params["lnf_b"])
    return dict(masks=masks, masks2=masks2, f0=f0, f1=f1, xhat_f=xhat_f,
                inv_std_f=inv_std_f, out=out)


def _kernel_params(gamma_refs):
    (ln0s, ln0b, dw0, dwb0, pw0, pwb0,
     ln1s, ln1b, dw1, dwb1, pw1, pwb1, lnfs, lnfb) = gamma_refs
    return dict(
        ln0_s=ln0s[0, :], ln0_b=ln0b[0, :], dw0=dw0[...], dwb0=dwb0[0, :],
        pw0=pw0, pwb0=pwb0[0, :],
        ln1_s=ln1s[0, :], ln1_b=ln1b[0, :], dw1=dw1[...], dwb1=dwb1[0, :],
        pw1=pw1, pwb1=pwb1[0, :],
        lnf_s=lnfs[0, :], lnf_b=lnfb[0, :])


def _masked_max(out_rows, mask3, tg, l, d):
    """Masked max over L (the reduce_mask mode): replicates the consumer's
    ``max(mask_logits(out, m), axis=-2)`` (stage.py classifier head) so the
    (B, G, L, D) encoder output never exists in HBM.  Returns
    (masked (tg, L, D), max (tg, D))."""
    masked = out_rows.reshape(tg, l, d) * mask3 + (mask3 - 1.0) * 1e10
    return masked, jnp.max(masked, axis=1)


def _fwd_kernel(seed_ref, x_ref, pe_ref, *refs, k, dropout_rate,
                compute_dtype, reduce=False, zmask=False):
    param_refs, refs = refs[:14], refs[14:]
    zm_ref = None
    if zmask:
        zm_ref, refs = refs[0], refs[1:]
    mask_ref = None
    if reduce:
        mask_ref, refs = refs[0], refs[1:]
    out_ref = refs[0]
    tg, l, d = x_ref.shape[1:]
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    x3 = x_ref[0].astype(jnp.float32)
    pe = pe_ref[...].astype(jnp.float32)                 # (L, D) broadcast
    v2 = zm_ref[0].reshape(tg * l, 1) if zmask else None
    f = _block_fwd(x3, pe, _kernel_params(param_refs), k, compute_dtype,
                   dropout_rate, v2=v2)
    if reduce:
        _, mx = _masked_max(f["out"], mask_ref[0].astype(jnp.float32),
                            tg, l, d)
        out_ref[0] = mx.astype(out_ref.dtype).reshape(tg, 1, d)
    else:
        out_ref[0] = f["out"].astype(out_ref.dtype).reshape(tg, l, d)


def _bwd_kernel(seed_ref, x_ref, pe_ref, *refs, k, dropout_rate,
                compute_dtype, reduce=False, zmask=False):
    """TWO-PASS backward: layer 0's forward stash is recomputed AFTER
    layer 1's backward frees its stash, so only one layer's saved
    intermediates are live at a time (stored in bf16 under the bf16
    policy, see _conv_layer_fwd) — roughly half the VMEM liveness of the
    single-pass formulation, which is what capped rows/cell (the fused
    kernel's main throughput lever, docs/BENCH.md r4 tuner table)."""
    param_refs, refs = refs[:14], refs[14:]
    zm_ref = None
    if zmask:
        zm_ref, refs = refs[0], refs[1:]
    mask_ref = None
    if reduce:
        mask_ref, refs = refs[0], refs[1:]
    g_ref = refs[0]
    gx_ref = refs[1]
    gparam_refs = refs[2:]
    tg, l, d = x_ref.shape[1:]
    rows = tg * l
    ct = compute_dtype
    stash_dt = jnp.bfloat16 if ct == jnp.bfloat16 else jnp.float32
    i, j = pl.program_id(0), pl.program_id(1)

    def seed_cell():
        if dropout_rate > 0.0:
            pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    @pl.when((i == 0) & (j == 0))
    def _init():
        for r in gparam_refs:
            r[...] = jnp.zeros_like(r)

    params = _kernel_params(param_refs)
    x3 = x_ref[0].astype(jnp.float32)
    pe = pe_ref[...].astype(jnp.float32)
    v2 = zm_ref[0].reshape(rows, 1) if zmask else None
    masks = _seq_masks(rows, l, k)
    masks2 = _combined_masks(masks, v2, k)
    h0 = (x3 + pe).reshape(rows, d)

    # pass A: layer-0 forward for its OUTPUT only (stash recomputed in
    # pass B — nothing below reads f0's intermediates, so they die here),
    # then layer 1 with a live stash
    seed_cell()
    h1 = _layer0_fwd(h0, params, k, ct, dropout_rate, masks2,
                     stash_dt)["out2"]
    f1 = _layer1_fwd(h1, params, k, ct, masks2, stash_dt)
    out, xhat_f, inv_std_f = _ln_f(f1["out2"], params["lnf_s"],
                                   params["lnf_b"])

    if reduce:
        # d(masked max)/d(out): tie-splitting like jnp.max's VJP (gradient
        # shared equally among argmax ties), then the mask_logits factor m
        m3 = mask_ref[0].astype(jnp.float32)             # (tg, L, 1)
        masked, mx = _masked_max(out, m3, tg, l, d)
        eq = (masked == mx[:, None, :]).astype(jnp.float32)
        cnt = jnp.sum(eq, axis=1, keepdims=True)         # (tg, 1, D)
        g3 = g_ref[0].astype(jnp.float32)                # (tg, 1, D)
        g = ((g3 * eq / cnt) * m3).reshape(rows, d)
    else:
        g = g_ref[0].reshape(rows, d).astype(jnp.float32)

    g_h2, g_lnf_s, g_lnf_b = _ln_bwd(g, xhat_f, inv_std_f, params["lnf_s"])
    g_h1, p1 = _conv_layer_bwd(g_h2, f1, params["ln1_s"], params["dw1"],
                               params["pw1"], k, ct, masks, masks2, v2)

    # pass B: recompute layer 0's stash (the PRNG re-seed replays the
    # dropout stream bit-exactly) and run its backward
    seed_cell()
    f0 = _layer0_fwd(h0, params, k, ct, dropout_rate, masks2, stash_dt)
    g_h0, p0 = _conv_layer_bwd(g_h1, f0, params["ln0_s"], params["dw0"],
                               params["pw0"], k, ct, masks, masks2, v2)

    grads = list(p0) + list(p1) + [g_lnf_s, g_lnf_b]
    # gx written fresh per cell -> ride the PRIMAL dtype (bf16 policy):
    # avoids XLA's f32->bf16 convert pass over (B, G, L, D) downstream
    gx_ref[0] = g_h0.astype(gx_ref.dtype).reshape(tg, l, d)  # d(pos)/dx = 1
    for r, val in zip(gparam_refs, grads):
        r[...] += val.astype(jnp.float32)


def _param_operands(p, k, d):
    """Normalize the 14 parameter arrays to kernel layouts (f32)."""
    def row(v):
        return jnp.asarray(v, jnp.float32).reshape(1, -1)
    return (row(p["ln0_s"]), row(p["ln0_b"]),
            jnp.asarray(p["dw0"], jnp.float32), row(p["dwb0"]),
            jnp.asarray(p["pw0"], jnp.float32), row(p["pwb0"]),
            row(p["ln1_s"]), row(p["ln1_b"]),
            jnp.asarray(p["dw1"], jnp.float32), row(p["dwb1"]),
            jnp.asarray(p["pw1"], jnp.float32), row(p["pwb1"]),
            row(p["lnf_s"]), row(p["lnf_b"]))


def _param_specs(k, d):
    vec = pl.BlockSpec((1, d), lambda i, j, s: (0, 0))
    tap = pl.BlockSpec((k, d), lambda i, j, s: (0, 0))
    mat = pl.BlockSpec((d, d), lambda i, j, s: (0, 0))
    return [vec, vec, tap, vec, mat, vec,
            vec, vec, tap, vec, mat, vec, vec, vec]


def _param_out_shapes(k, d):
    return [jax.ShapeDtypeStruct(s, jnp.float32) for s in
            [(1, d), (1, d), (k, d), (1, d), (d, d), (1, d),
             (1, d), (1, d), (k, d), (1, d), (d, d), (1, d),
             (1, d), (1, d)]]


def _reduce_operand_spec(reduce_mask, bsz, g, l, tg):
    """The reduce-mode mask rides as (B, G, L, 1) f32 with a (1, tg, L, 1)
    block (lane dim 1 == the array's, L full — Mosaic-legal); the reduced
    output/cotangent is (B, G, 1, D) with a (1, tg, 1, D) block."""
    mask4 = reduce_mask.reshape(bsz, g, l, 1).astype(jnp.float32)
    mask_spec = pl.BlockSpec((1, tg, l, 1), lambda i, j, s: (i, j, 0, 0))
    return mask4, mask_spec


def _zmask_operand(zero_mask, g, l, tg):
    """(G, L) zero mask as a (1, G, L, 1) operand with a (1, tg, L, 1)
    block — the same Mosaic-legal layout as the reduce mask (a 2D
    (tg, L) block is rejected whenever tg isn't a multiple of 8: the
    block's second-to-last dim must divide 8 or equal the array's)."""
    zm = jnp.asarray(zero_mask, jnp.float32).reshape(1, g, l, 1)
    spec = pl.BlockSpec((1, tg, l, 1), lambda i, j, s: (0, j, 0, 0))
    return zm, spec


def _forward(x, pe, params, seed, k, dropout_rate, interpret=False,
             compute_dtype=jnp.bfloat16, reduce_mask=None, zero_mask=None):
    """x: (B, G, L, D); pe: (L, D); params: dict of 14 arrays.

    With ``reduce_mask`` (B, G, L): returns the masked max over L,
    (B, G, D) — the (B, G, L, D) block output never touches HBM.
    With ``zero_mask`` (G, L): each conv's input is re-zeroed at masked
    positions (the merged-stream contract, models/layers.py)."""
    bsz, g, l, d = x.shape
    tg = _seqs_per_cell(g, l, d, k)
    blk = pl.BlockSpec((1, tg, l, d), lambda i, j, s: (i, j, 0, 0))
    pe_spec = pl.BlockSpec((l, d), lambda i, j, s: (0, 0))
    reduce = reduce_mask is not None
    zmask = zero_mask is not None
    kernel = functools.partial(_fwd_kernel, k=k, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype, reduce=reduce,
                               zmask=zmask)
    in_specs = [blk, pe_spec] + _param_specs(k, d)
    operands = [x, pe.astype(jnp.float32), *_param_operands(params, k, d)]
    if zmask:
        zm, zm_spec = _zmask_operand(zero_mask, g, l, tg)
        in_specs.append(zm_spec)
        operands.append(zm)
    if reduce:
        mask4, mask_spec = _reduce_operand_spec(reduce_mask, bsz, g, l, tg)
        in_specs.append(mask_spec)
        operands.append(mask4)
        out_specs = [pl.BlockSpec((1, tg, 1, d), lambda i, j, s: (i, j, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct((bsz, g, 1, d),
                                          _out_dtype(compute_dtype))]
    else:
        out_specs = [blk]
        out_shape = [jax.ShapeDtypeStruct((bsz, g, l, d),
                                          _out_dtype(compute_dtype))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, g // tg),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *operands)
    return out[:, :, 0] if reduce else out


def _backward(x, pe, params, seed, g_out, k, dropout_rate, interpret=False,
              compute_dtype=jnp.bfloat16, reduce_mask=None, zero_mask=None):
    bsz, g, l, d = x.shape
    tg = _seqs_per_cell(g, l, d, k, bwd=True)
    blk = pl.BlockSpec((1, tg, l, d), lambda i, j, s: (i, j, 0, 0))
    pe_spec = pl.BlockSpec((l, d), lambda i, j, s: (0, 0))
    reduce = reduce_mask is not None
    zmask = zero_mask is not None
    kernel = functools.partial(_bwd_kernel, k=k, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype, reduce=reduce,
                               zmask=zmask)
    in_specs = [blk, pe_spec] + _param_specs(k, d)
    operands = [x, pe.astype(jnp.float32), *_param_operands(params, k, d)]
    if zmask:
        zm, zm_spec = _zmask_operand(zero_mask, g, l, tg)
        in_specs.append(zm_spec)
        operands.append(zm)
    if reduce:
        mask4, mask_spec = _reduce_operand_spec(reduce_mask, bsz, g, l, tg)
        in_specs += [mask_spec,
                     pl.BlockSpec((1, tg, 1, d), lambda i, j, s: (i, j, 0, 0))]
        operands += [mask4, g_out.reshape(bsz, g, 1, d)]
    else:
        in_specs.append(blk)
        operands.append(g_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, g // tg),
        in_specs=in_specs,
        out_specs=[blk] + _param_specs(k, d),
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, g, l, d), x.dtype)]
        + _param_out_shapes(k, d),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *operands)
    return outs[0], outs[1:]


def reference_impl(x, pe, params, k, zero_mask=None):
    """Pure-JAX equivalent (no dropout) — oracle + non-TPU VJP.

    ``zero_mask`` broadcastable to x.shape[:-1]: re-zero each conv's input
    at masked positions (the merged-stream contract)."""
    def ln(h, s, b):
        mean = jnp.mean(h, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(jnp.square(h), -1, keepdims=True)
                          - jnp.square(mean), 0.0)
        return ((h - mean) * jax.lax.rsqrt(var + LN_EPS)) * s + b

    def dsconv(h, dw, dwb, pw, pwb):
        if zero_mask is not None:
            h = h * zero_mask[..., None]
        pad_widths = [(0, 0)] * (h.ndim - 2) + [(k // 2, k // 2), (0, 0)]
        hp = jnp.pad(h, pad_widths)
        l = h.shape[-2]
        out = jnp.zeros_like(h) + dwb
        for j in range(k):
            out = out + dw[j] * jax.lax.slice_in_dim(hp, j, j + l, axis=-2)
        return jnp.maximum(jnp.einsum("...d,de->...e", out, pw) + pwb, 0.0)

    h = x.astype(jnp.float32) + pe
    h = h + dsconv(ln(h, params["ln0_s"], params["ln0_b"]),
                   params["dw0"], params["dwb0"], params["pw0"],
                   params["pwb0"])
    h = h + dsconv(ln(h, params["ln1_s"], params["ln1_b"]),
                   params["dw1"], params["dwb1"], params["pw1"],
                   params["pwb1"])
    return ln(h, params["lnf_s"], params["lnf_b"])


_PKEYS = ("ln0_s", "ln0_b", "dw0", "dwb0", "pw0", "pwb0",
          "ln1_s", "ln1_b", "dw1", "dwb1", "pw1", "pwb1", "lnf_s", "lnf_b")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_encoder_block(x, pe, params, seed, k, compute_dtype=jnp.bfloat16,
                        dropout_rate=0.0, reduce_mask=None, zero_mask=None):
    """Pallas forward + Pallas backward (TPU) / pure-JAX rematerialized
    backward (interpret mode, dropout_rate == 0 only).

    x: (B, G, L, D) — merge all leading batch dims into G (free reshape);
    pe: (L, D) positional table; params: dict with keys
    ln0_s/ln0_b/dw0/dwb0/pw0/pwb0/ln1_s/.../lnf_s/lnf_b.

    With ``reduce_mask`` (B, G, L) the kernel also folds in the consumer's
    masked word-max (``max(mask_logits(out, m), axis=-2)``, reference
    stage.py:500-505) and returns (B, G, D) — the full (B, G, L, D) output
    and its cotangent never touch HBM (~120 MB/step at bench shapes).

    With ``zero_mask`` (G, L) each conv's input is re-zeroed past a
    group's true length (the merged-stream input-encoder contract,
    models/stage.py _merged_input_encode) — all three streams run through
    ONE kernel launch.
    """
    return _forward(x, pe, params, seed, k, dropout_rate,
                    interpret=jax.default_backend() != "tpu",
                    compute_dtype=compute_dtype, reduce_mask=reduce_mask,
                    zero_mask=zero_mask)


def _fused_fwd(x, pe, params, seed, k, compute_dtype, dropout_rate,
               reduce_mask=None, zero_mask=None):
    out = fused_encoder_block(x, pe, params, seed, k, compute_dtype,
                              dropout_rate, reduce_mask, zero_mask)
    return out, (x, pe, params, seed, reduce_mask, zero_mask)


def _fused_bwd(k, compute_dtype, dropout_rate, residuals, g):
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0 and not on_tpu:
        raise NotImplementedError(
            "in-kernel dropout backward needs the TPU PRNG")
    x, pe, params, seed, reduce_mask, zero_mask = residuals
    gx, gparams = _backward(x, pe, params, seed, g, k, dropout_rate,
                            interpret=not on_tpu,
                            compute_dtype=compute_dtype,
                            reduce_mask=reduce_mask, zero_mask=zero_mask)
    gp = {key: gv.reshape(jnp.shape(params[key]))
          for key, gv in zip(_PKEYS, gparams)}
    g_mask = None if reduce_mask is None else jnp.zeros_like(reduce_mask)
    g_zm = None if zero_mask is None else jnp.zeros_like(zero_mask)
    return (gx.astype(x.dtype), jnp.zeros_like(pe), gp,
            np.zeros(jnp.shape(seed), jax.dtypes.float0), g_mask, g_zm)


fused_encoder_block.defvjp(_fused_fwd, _fused_bwd)
