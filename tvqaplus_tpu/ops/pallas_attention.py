"""Fused QA-context attention Pallas kernel.

Fuses the whole ``qa_ctx_attention`` pipeline of STAGE (structured cosine
attention + BiDAF-style [qa; A; qa*A] concat + LayerNorm + down-projection +
ReLU, reference stage.py:365-387 / context_query_attention.py:35-101) into
one TPU kernel.

Why: the train/eval step is activation-bandwidth-bound.  The pure-XLA path
materializes, per stream, S (B,A,Li,Lqa,Lr), its softmax, A (B,A,Li,Lqa,D)
and the 3D-wide concat (B,A,Li,Lqa,3D) in HBM — several hundred MB per step
at the reference shapes.  The kernel computes ``mixed`` directly and writes
only it (+ the raw scores needed by the attention loss); everything else
lives in VMEM/registers.

Grid: one program per (batch, frame); all five answers are processed
together as one (A*Lqa, D) block, so every op is a static-shape matmul on
the MXU (bf16 inputs, f32 accumulation).  The QA block is re-fetched only
when the batch index changes.

The similarity dropout (reference context_query_attention.py:95-96) is
applied by the caller on the normalized inputs (they are kernel inputs
anyway); the projection dropout (stage.py:135) is applied in-kernel via the
TPU PRNG when ``dropout_rate > 0``.

``fused_qa_ctx_attention`` wraps the kernel in a ``jax.custom_vjp`` whose
backward re-derives gradients through the equivalent pure-JAX computation
(flash-attention-style rematerialization: nothing but the kernel inputs is
saved between forward and backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvqaplus_tpu.ops.masking import NEG_INF, SAFE_FLOOR

LN_EPS = 1e-5


def _kernel(seed_ref, cn_ref, ce_ref, qn_ref, qe_ref, cm_ref, qm_ref,
            gamma_ref, beta_ref, w_ref, b_ref,
            mixed_ref, raw_ref, *, scale, dropout_rate, compute_dtype):
    """One (batch, frame) cell; static unroll over the 5 answers (Mosaic
    forbids the cross-lane reshapes a merged (A*Lqa, D) layout would need).

    Refs (leading singleton block dims included):
      cn/ce: (1, A, Lqa, D) normalized / raw QA embeddings
      qn/qe: (1, 1, Lr, D) normalized / raw context for this frame
      cm: (1, A, Lqa, 1) QA mask; qm: (1, 1, 1, Lr) context mask
      gamma/beta: (1, 3D); w: (3D, D); b: (1, D)
      mixed_ref: (1, A, 1, Lqa, D); raw_ref: (1, A, 1, Lqa, Lr)
    """
    a_dim, lqa, d = cn_ref.shape[1:]
    ct = compute_dtype

    qn = qn_ref[0, 0].astype(ct)                        # (Lr, D)
    qe = qe_ref[0, 0].astype(ct)
    q_mask = qm_ref[0, 0].astype(jnp.float32)           # (1, Lr)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0), pl.program_id(1))

    gamma = gamma_ref[0, :]
    beta = beta_ref[0, :]
    bias = b_ref[0, :]
    inv3d = 1.0 / (3 * d)

    for ai in range(a_dim):  # static unroll
        cn = cn_ref[0, ai].astype(ct)                   # (Lqa, D)
        ce = ce_ref[0, ai].astype(jnp.float32)
        c_mask = cm_ref[0, ai].astype(jnp.float32)      # (Lqa, 1)

        s = jax.lax.dot_general(
            cn, qn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (Lqa, Lr)
        s_mask = c_mask * q_mask
        masked = s - NEG_INF * (s_mask - 1.0)           # s - 1e10*(1-m)
        raw_ref[0, ai, 0] = masked

        z = jnp.maximum(masked * scale, SAFE_FLOOR)
        z = z - jnp.max(z, axis=-1, keepdims=True)
        e = jnp.exp(z)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)) * s_mask

        a = jax.lax.dot_general(
            p.astype(ct), qe, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (Lqa, D)

        # LayerNorm over the virtual concat [ce; a; ce*a] (3D wide)
        cea = ce * a
        mean = (jnp.sum(ce, -1, keepdims=True)
                + jnp.sum(a, -1, keepdims=True)
                + jnp.sum(cea, -1, keepdims=True)) * inv3d
        var = (jnp.sum(jnp.square(ce), -1, keepdims=True)
               + jnp.sum(jnp.square(a), -1, keepdims=True)
               + jnp.sum(jnp.square(cea), -1, keepdims=True)) * inv3d \
            - jnp.square(mean)
        inv_std = jax.lax.rsqrt(var + LN_EPS)

        def part(x, k):
            lo, hi = k * d, (k + 1) * d  # static concat segment
            normed = (x - mean) * inv_std * gamma[lo:hi] + beta[lo:hi]
            if dropout_rate > 0.0:
                bits = pltpu.prng_random_bits((lqa, d))
                u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
                keep = (u >= dropout_rate).astype(jnp.float32)
                normed = normed * keep * (1.0 / (1.0 - dropout_rate))
            return jax.lax.dot_general(
                normed.astype(ct), w_ref[lo:hi, :].astype(ct),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        out = part(ce, 0) + part(a, 1) + part(cea, 2) + bias
        mixed_ref[0, ai, 0] = jnp.maximum(out, 0.0)


def _pallas_forward(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                    scale, dropout_rate, seed, interpret=False,
                    compute_dtype=jnp.bfloat16):
    """Launch the kernel.  Shapes:
      cn/ce: (B, A, Lqa, D); qn/qe: (B, Li, Lr, D);
      c_mask: (B, A, Lqa); q_mask: (B, Li, Lr).
    Returns mixed (B, A, Li, Lqa, D), raw_S (B, A, Li, Lqa, Lr), f32.
    """
    bsz, num_a, lqa, d = cn.shape
    _, li, lr, _ = qn.shape
    seed_arr = jnp.asarray([seed], jnp.int32)

    kernel = functools.partial(_kernel, scale=scale,
                               dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, li),
        in_specs=[
            pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, num_a, lqa, d), lambda i, j, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, lr, d), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, lr, d), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, num_a, lqa, 1), lambda i, j, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, lr), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((3 * d, d), lambda i, j, s: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, num_a, 1, lqa, d),
                         lambda i, j, s: (i, 0, j, 0, 0)),
            pl.BlockSpec((1, num_a, 1, lqa, lr),
                         lambda i, j, s: (i, 0, j, 0, 0)),
        ],
    )
    mixed, raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, num_a, li, lqa, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, num_a, li, lqa, lr), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr,
      cn.astype(jnp.float32), ce.astype(jnp.float32),
      qn.astype(jnp.float32), qe.astype(jnp.float32),
      c_mask.reshape(bsz, num_a, lqa, 1).astype(jnp.float32),
      q_mask.reshape(bsz, li, 1, lr).astype(jnp.float32),
      gamma.reshape(1, 3 * d).astype(jnp.float32),
      beta.reshape(1, 3 * d).astype(jnp.float32),
      w.astype(jnp.float32), b.reshape(1, d).astype(jnp.float32))
    return mixed, raw


def reference_impl(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, scale):
    """Pure-JAX equivalent (no dropout) — numerics oracle + custom-vjp
    backward path."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_qa_ctx_attention(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                           scale, compute_dtype=jnp.bfloat16):
    """Pallas forward / rematerialized pure-JAX backward (eval & no-dropout
    training path)."""
    return _pallas_forward(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b,
                           scale, dropout_rate=0.0, seed=0,
                           interpret=jax.default_backend() != "tpu",
                           compute_dtype=compute_dtype)


def _fused_fwd(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, scale,
               compute_dtype):
    out = fused_qa_ctx_attention(cn, ce, qn, qe, c_mask, q_mask, gamma,
                                 beta, w, b, scale, compute_dtype)
    return out, (cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b)


def _fused_bwd(scale, compute_dtype, residuals, g):
    cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b = residuals
    _, vjp = jax.vjp(
        lambda *args: reference_impl(*args, scale), cn, ce, qn, qe,
        c_mask, q_mask, gamma, beta, w, b)
    return vjp(g)


fused_qa_ctx_attention.defvjp(_fused_fwd, _fused_bwd)
