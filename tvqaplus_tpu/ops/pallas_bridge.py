"""Fused MLP-bridge Pallas kernel (forward AND backward).

Fuses STAGE's ``MLPBridge`` recipe — LN -> dropout -> dense(Din->Dout) ->
ReLU -> LN (reference stage.py:85-113: `bert_word_encoding_fc` on BERT-768
inputs and `vid_fc` on vfeat-300 inputs).

Why: after round 2's other kernels, the 768->300 bridge over the
(B, Li, Ls, 768) subtitle tensor is the largest XLA bucket (~2 ms/step of a
12.9 ms step): two LayerNorms, a dropout mask and the dense each cost a
full HBM pass over the biggest activation in the model.  One kernel = one
read + one write.

Everything is ROW-LOCAL: the wrapper views x as (B, G, L, Din) and grids
over (B, G/Tg); in-kernel the whole block collapses to (Tg*L, Din) rows.

Dropout follows the TPU-PRNG replay scheme of ops/pallas_attention.py.
LayerNorm numerics replicate flax.linen.LayerNorm (f32 fast-variance
stats); see ops/pallas_encoder.py._ln_f.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvqaplus_tpu.ops.pallas_attention import _keep_mask, _out_dtype
from tvqaplus_tpu.ops.pallas_encoder import _ln_bwd, _ln_f


def _rows_per_cell(g, l, d_in, budget_bytes=13 * 1024 * 1024):
    """Largest divisor Tg of G whose backward footprint (~10 live
    (Tg*L, Din) f32 intermediates) fits the scoped-vmem budget."""
    def footprint(t):
        return 4 * 10 * t * l * d_in
    best = 1
    for t in range(1, min(64, g) + 1):
        if g % t == 0 and footprint(t) <= budget_bytes:
            best = t
    return best


def _bridge_fwd(x2, gin, bin_, w_ref, b, gout, bout, dropout_rate, ct):
    rows, d_in = x2.shape
    ln1, xhat, inv_std = _ln_f(x2, gin, bin_)
    keep = _keep_mask((rows, d_in), dropout_rate) \
        if dropout_rate > 0.0 else None
    ln_d = ln1 * keep if keep is not None else ln1
    y1 = jax.lax.dot_general(
        ln_d.astype(ct), w_ref[...].astype(ct), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b          # (rows, Dout)
    y2 = jnp.maximum(y1, 0.0)
    out, xhat2, inv_std2 = _ln_f(y2, gout, bout)
    return dict(xhat=xhat, inv_std=inv_std, keep=keep, ln_d=ln_d, y1=y1,
                xhat2=xhat2, inv_std2=inv_std2, out=out)


def _fwd_kernel(seed_ref, x_ref, gin_ref, bin_ref, w_ref, b_ref, gout_ref,
                bout_ref, out_ref, *, dropout_rate, compute_dtype):
    tg, l, d_in = x_ref.shape[1:]
    d_out = w_ref.shape[1]
    rows = tg * l
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    x2 = x_ref[0].reshape(rows, d_in).astype(jnp.float32)
    f = _bridge_fwd(x2, gin_ref[0, :], bin_ref[0, :], w_ref, b_ref[0, :],
                    gout_ref[0, :], bout_ref[0, :], dropout_rate,
                    compute_dtype)
    out_ref[0] = f["out"].astype(out_ref.dtype).reshape(tg, l, d_out)


def _bwd_kernel(seed_ref, x_ref, gin_ref, bin_ref, w_ref, b_ref, gout_ref,
                bout_ref, g_ref,
                gx_ref, ggin_ref, gbin_ref, gw_ref, gb_ref, ggout_ref,
                gbout_ref, *, dropout_rate, compute_dtype):
    tg, l, d_in = x_ref.shape[1:]
    d_out = w_ref.shape[1]
    rows = tg * l
    ct = compute_dtype
    i, j = pl.program_id(0), pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    @pl.when((i == 0) & (j == 0))
    def _init():
        for r in (ggin_ref, gbin_ref, gw_ref, gb_ref, ggout_ref, gbout_ref):
            r[...] = jnp.zeros_like(r)

    gin = gin_ref[0, :]
    gout = gout_ref[0, :]
    x2 = x_ref[0].reshape(rows, d_in).astype(jnp.float32)
    f = _bridge_fwd(x2, gin, bin_ref[0, :], w_ref, b_ref[0, :], gout,
                    bout_ref[0, :], dropout_rate, ct)
    g = g_ref[0].reshape(rows, d_out).astype(jnp.float32)

    g_y2, g_gout, g_bout = _ln_bwd(g, f["xhat2"], f["inv_std2"], gout)
    ggout_ref[...] += g_gout
    gbout_ref[...] += g_bout
    g_y1 = g_y2 * (f["y1"] > 0.0).astype(jnp.float32)
    gb_ref[...] += jnp.sum(g_y1, 0, keepdims=True)
    gw_ref[...] += jax.lax.dot_general(
        f["ln_d"].astype(ct), g_y1.astype(ct), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Din, Dout)
    g_lnd = jax.lax.dot_general(
        g_y1.astype(ct), w_ref[...].astype(ct), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (rows, Din)
    g_ln = g_lnd * f["keep"] if f["keep"] is not None else g_lnd
    g_x, g_gin, g_bin = _ln_bwd(g_ln, f["xhat"], f["inv_std"], gin)
    ggin_ref[...] += g_gin
    gbin_ref[...] += g_bin
    gx_ref[0] = g_x.reshape(tg, l, d_in)


def _specs(num_g, l, d_in, d_out, t):
    xblk = pl.BlockSpec((1, t, l, d_in), lambda i, j, s: (i, j, 0, 0))
    oblk = pl.BlockSpec((1, t, l, d_out), lambda i, j, s: (i, j, 0, 0))
    vin = pl.BlockSpec((1, d_in), lambda i, j, s: (0, 0))
    vout = pl.BlockSpec((1, d_out), lambda i, j, s: (0, 0))
    mat = pl.BlockSpec((d_in, d_out), lambda i, j, s: (0, 0))
    return xblk, oblk, vin, vout, mat


def _params_f32(gin, bin_, w, b, gout, bout):
    d_in, d_out = w.shape
    return (gin.reshape(1, d_in).astype(jnp.float32),
            bin_.reshape(1, d_in).astype(jnp.float32),
            w.astype(jnp.float32), b.reshape(1, d_out).astype(jnp.float32),
            gout.reshape(1, d_out).astype(jnp.float32),
            bout.reshape(1, d_out).astype(jnp.float32))


def _forward(x, gin, bin_, w, b, gout, bout, seed, dropout_rate,
             interpret=False, compute_dtype=jnp.bfloat16):
    bsz, g, l, d_in = x.shape
    d_out = w.shape[1]
    t = _rows_per_cell(g, l, d_in)
    xblk, oblk, vin, vout, mat = _specs(g, l, d_in, d_out, t)
    kernel = functools.partial(_fwd_kernel, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(bsz, g // t),
        in_specs=[xblk, vin, vin, mat, vout, vout, vout],
        out_specs=[oblk])
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, g, l, d_out),
                                        _out_dtype(compute_dtype))],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x,
      *_params_f32(gin, bin_, w, b, gout, bout))
    return out


def _backward(x, gin, bin_, w, b, gout, bout, seed, g_out, dropout_rate,
              interpret=False, compute_dtype=jnp.bfloat16):
    bsz, g, l, d_in = x.shape
    d_out = w.shape[1]
    t = _rows_per_cell(g, l, d_in)
    xblk, oblk, vin, vout, mat = _specs(g, l, d_in, d_out, t)
    kernel = functools.partial(_bwd_kernel, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(bsz, g // t),
        in_specs=[xblk, vin, vin, mat, vout, vout, vout, oblk],
        out_specs=[xblk, vin, vin, mat, vout, vout, vout])
    gx, ggin, gbin, gw, gb, ggout, gbout = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, g, l, d_in), jnp.float32),
            jax.ShapeDtypeStruct((1, d_in), jnp.float32),
            jax.ShapeDtypeStruct((1, d_in), jnp.float32),
            jax.ShapeDtypeStruct((d_in, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x,
      *_params_f32(gin, bin_, w, b, gout, bout), g_out)
    return (gx, ggin.reshape(gin.shape), gbin.reshape(bin_.shape), gw,
            gb.reshape(b.shape), ggout.reshape(gout.shape),
            gbout.reshape(bout.shape))


def reference_impl(x, gin, bin_, w, b, gout, bout):
    """Pure-JAX equivalent (no dropout) — oracle + non-TPU VJP."""
    def ln(h, s, bb):
        mean = jnp.mean(h, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(jnp.square(h), -1, keepdims=True)
                          - jnp.square(mean), 0.0)
        return ((h - mean) * jax.lax.rsqrt(var + 1e-5)) * s + bb

    h = ln(x.astype(jnp.float32), gin, bin_)
    h = jnp.maximum(jnp.einsum("...k,kd->...d", h, w) + b, 0.0)
    return ln(h, gout, bout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_mlp_bridge(x, gin, bin_, w, b, gout, bout, seed,
                     compute_dtype=jnp.bfloat16, dropout_rate=0.0):
    """Pallas forward + Pallas backward (TPU) / pure-JAX backward
    (interpret mode, dropout_rate == 0 only).  x: (B, G, L, Din)."""
    return _forward(x, gin, bin_, w, b, gout, bout, seed, dropout_rate,
                    interpret=jax.default_backend() != "tpu",
                    compute_dtype=compute_dtype)


def _fused_fwd(x, gin, bin_, w, b, gout, bout, seed, compute_dtype,
               dropout_rate):
    out = fused_mlp_bridge(x, gin, bin_, w, b, gout, bout, seed,
                           compute_dtype, dropout_rate)
    return out, (x, gin, bin_, w, b, gout, bout, seed)


def _fused_bwd(compute_dtype, dropout_rate, residuals, g):
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0 and not on_tpu:
        raise NotImplementedError(
            "in-kernel dropout backward needs the TPU PRNG")
    x, gin, bin_, w, b, gout, bout, seed = residuals
    gx, ggin, gbin, gw, gb, ggout, gbout = _backward(
        x, gin, bin_, w, b, gout, bout, seed, g, dropout_rate,
        interpret=not on_tpu, compute_dtype=compute_dtype)
    return (gx.astype(x.dtype), ggin, gbin, gw, gb, ggout, gbout,
            np.zeros(jnp.shape(seed), jax.dtypes.float0))


fused_mlp_bridge.defvjp(_fused_fwd, _fused_bwd)
