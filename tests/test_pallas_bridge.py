"""Fused MLP-bridge kernel vs the pure-JAX oracle and vs the unfused
MLPBridge module (interpret mode on CPU; dropout path checked on hardware
by scripts/check_pallas_tpu.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.ops import pallas_bridge as br

B, G, L, DIN, DOUT = 2, 6, 8, 24, 16


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    x = jnp.array(rng.standard_normal((B, G, L, DIN)).astype(f32))
    gin = jnp.array((rng.standard_normal(DIN) * 0.1 + 1).astype(f32))
    bin_ = jnp.array((rng.standard_normal(DIN) * 0.1).astype(f32))
    w = jnp.array(
        (rng.standard_normal((DIN, DOUT)) / np.sqrt(DIN)).astype(f32))
    b = jnp.array((rng.standard_normal(DOUT) * 0.1).astype(f32))
    gout = jnp.array((rng.standard_normal(DOUT) * 0.1 + 1).astype(f32))
    bout = jnp.array((rng.standard_normal(DOUT) * 0.1).astype(f32))
    return x, gin, bin_, w, b, gout, bout


def test_forward_matches_reference():
    args = make_inputs()
    ref = br.reference_impl(*args)
    out = br._forward(*args, seed=0, dropout_rate=0.0, interpret=True,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               rtol=2e-4, atol=2e-4)


def test_custom_vjp_grads_match_reference():
    args = make_inputs()
    seed = jnp.zeros((), jnp.int32)

    def loss_k(*a):
        return jnp.sum(br.fused_mlp_bridge(*a, seed, jnp.float32, 0.0) ** 2)

    def loss_r(*a):
        return jnp.sum(br.reference_impl(*a) ** 2)

    argnums = tuple(range(7))
    gk = jax.grad(loss_k, argnums=argnums)(*args)
    gr = jax.grad(loss_r, argnums=argnums)(*args)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.array(a), np.array(b_),
                                   rtol=1e-3, atol=1e-3)


def test_module_fused_matches_unfused():
    from tvqaplus_tpu.models.layers import MLPBridge

    x, *_ = make_inputs()
    m_u = MLPBridge(DIN, DOUT, dropout=0.1, dtype=jnp.float32,
                    use_pallas=False)
    m_f = MLPBridge(DIN, DOUT, dropout=0.1, dtype=jnp.float32,
                    use_pallas=True)
    variables = m_u.init(jax.random.PRNGKey(0), x, train=False)
    out_u = m_u.apply(variables, x, train=False)
    out_f = m_f.apply(variables, x, train=False)
    np.testing.assert_allclose(np.array(out_f), np.array(out_u),
                               rtol=2e-4, atol=2e-4)


def test_grad_with_bf16_primals():
    x, *rest = make_inputs()
    seed = jnp.zeros((), jnp.int32)
    bf16 = jnp.bfloat16

    def loss(x):
        out = br.fused_mlp_bridge(x / 1.25, *rest, seed, bf16, 0.0)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(x.astype(bf16))
    assert gx.dtype == bf16
    assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())
