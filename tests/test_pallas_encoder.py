"""Fused QANet encoder-block kernel vs the pure-JAX oracle and vs the
unfused EncoderBlock module (interpret mode on CPU; dropout path checked on
hardware by scripts/check_pallas_tpu.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.ops import pallas_encoder as pe_mod

B, G, L, D, K = 2, 6, 8, 16, 5


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    x = jnp.array(rng.standard_normal((B, G, L, D)).astype(f32))
    pe = jnp.array((rng.standard_normal((L, D)) * 0.1).astype(f32))
    p = {}
    for i in (0, 1):
        p[f"ln{i}_s"] = jnp.array(
            (rng.standard_normal(D) * 0.1 + 1).astype(f32))
        p[f"ln{i}_b"] = jnp.array((rng.standard_normal(D) * 0.1).astype(f32))
        p[f"dw{i}"] = jnp.array(
            (rng.standard_normal((K, D)) * 0.3).astype(f32))
        p[f"dwb{i}"] = jnp.array((rng.standard_normal(D) * 0.1).astype(f32))
        p[f"pw{i}"] = jnp.array(
            (rng.standard_normal((D, D)) / np.sqrt(D)).astype(f32))
        p[f"pwb{i}"] = jnp.array((rng.standard_normal(D) * 0.1).astype(f32))
    p["lnf_s"] = jnp.array((rng.standard_normal(D) * 0.1 + 1).astype(f32))
    p["lnf_b"] = jnp.array((rng.standard_normal(D) * 0.1).astype(f32))
    return x, pe, p


def test_forward_matches_reference():
    x, pe, p = make_inputs()
    ref = pe_mod.reference_impl(x, pe, p, K)
    out = pe_mod._forward(x, pe, p, 0, K, 0.0, interpret=True,
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               rtol=2e-4, atol=2e-4)


def test_custom_vjp_grads_match_reference():
    x, pe, p = make_inputs()

    def loss_k(x, p):
        return jnp.sum(pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), K, jnp.float32, 0.0) ** 2)

    def loss_r(x, p):
        return jnp.sum(pe_mod.reference_impl(x, pe, p, K) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, p)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.array(gk[0]), np.array(gr[0]),
                               rtol=1e-3, atol=1e-3)
    for key in p:
        np.testing.assert_allclose(np.array(gk[1][key]),
                                   np.array(gr[1][key]),
                                   rtol=1e-3, atol=1e-3, err_msg=key)


def test_module_fused_matches_unfused():
    """EncoderBlock's fused path == its unfused module chain (the
    pre-round-2 formulation) on a 5D statement-shaped input."""
    from tvqaplus_tpu.models.layers import EncoderBlock

    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((2, 3, 4, L, D)).astype(np.float32))
    blk_u = EncoderBlock(D, n_conv=2, kernel_size=K, num_heads=0,
                         dtype=jnp.float32, use_pallas=False)
    blk_f = EncoderBlock(D, n_conv=2, kernel_size=K, num_heads=0,
                         dtype=jnp.float32, use_pallas=True)
    variables = blk_u.init(jax.random.PRNGKey(0), x, None, train=False)
    out_u = blk_u.apply(variables, x, None, train=False)
    out_f = blk_f.apply(variables, x, None, train=False)
    assert out_f.shape == x.shape
    np.testing.assert_allclose(np.array(out_f), np.array(out_u),
                               rtol=2e-4, atol=2e-4)


def test_reduce_mask_matches_xla_masked_max():
    """reduce_mask mode == encoder output -> mask_logits -> max over L
    (the classifier head's word-max, reference stage.py:500-505), forward
    AND gradients."""
    from tvqaplus_tpu.ops.masking import mask_logits

    x, pe, p = make_inputs()
    rng = np.random.default_rng(3)
    mask = (rng.random((B, G, L)) > 0.3).astype(np.float32)
    mask[..., 0] = 1.0
    mask = jnp.array(mask)

    def loss_k(x, p):
        out = pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), K, jnp.float32, 0.0, mask)
        return out, jnp.sum(out ** 2)

    def loss_r(x, p):
        full = pe_mod.reference_impl(x, pe, p, K)
        out = jnp.max(mask_logits(full, mask[..., None]), axis=-2)
        return out, jnp.sum(out ** 2)

    out_k = loss_k(x, p)[0]
    out_r = loss_r(x, p)[0]
    assert out_k.shape == (B, G, D)
    np.testing.assert_allclose(np.array(out_k), np.array(out_r),
                               rtol=2e-4, atol=2e-4)
    gk = jax.grad(lambda x, p: loss_k(x, p)[1], argnums=(0, 1))(x, p)
    gr = jax.grad(lambda x, p: loss_r(x, p)[1], argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.array(gk[0]), np.array(gr[0]),
                               rtol=1e-3, atol=1e-3)
    for key in p:
        np.testing.assert_allclose(np.array(gk[1][key]),
                                   np.array(gr[1][key]),
                                   rtol=1e-3, atol=1e-3, err_msg=key)


def test_grad_with_bf16_primals():
    x, pe, p = make_inputs()
    bf16 = jnp.bfloat16

    def loss(x):
        x = x / 1.25
        out = pe_mod.fused_encoder_block(x, pe, p, jnp.int32(0), K, bf16,
                                         0.0)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(x.astype(bf16))
    assert gx.dtype == bf16
    assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())


def test_zero_mask_matches_reference():
    """zero_mask mode (the merged-stream contract): forward + grads vs the
    pure-JAX oracle with per-conv input re-zeroing."""
    x, pe, p = make_inputs(seed=5)
    rng = np.random.default_rng(6)
    # per-group true lengths (first len_q positions valid), like
    # _merged_input_encode's static length mask
    lens = rng.integers(2, L + 1, G)
    zm = jnp.array((np.arange(L)[None, :] < lens[:, None])
                   .astype(np.float32))                   # (G, L)

    def loss_k(x, p):
        out = pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), K, jnp.float32, 0.0, None, zm)
        return out, jnp.sum((out * zm[..., None]) ** 2)

    def loss_r(x, p):
        out = pe_mod.reference_impl(x, pe, p, K, zero_mask=zm)
        return out, jnp.sum((out * zm[..., None]) ** 2)

    out_k, out_r = loss_k(x, p)[0], loss_r(x, p)[0]
    # only the valid positions are contractual (callers slice them out)
    np.testing.assert_allclose(np.array(out_k * zm[..., None]),
                               np.array(out_r * zm[..., None]),
                               rtol=2e-4, atol=2e-4)
    gk = jax.grad(lambda x, p: loss_k(x, p)[1], argnums=(0, 1))(x, p)
    gr = jax.grad(lambda x, p: loss_r(x, p)[1], argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.array(gk[0]), np.array(gr[0]),
                               rtol=1e-3, atol=1e-3)
    for key in p:
        np.testing.assert_allclose(np.array(gk[1][key]),
                                   np.array(gr[1][key]),
                                   rtol=1e-3, atol=1e-3, err_msg=key)
