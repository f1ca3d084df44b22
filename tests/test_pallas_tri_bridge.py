"""Fused tri-concat MLP bridge kernel vs the pure-JAX oracle and vs the
original MLPBridge-on-concat module (interpret mode on CPU; the same
kernels compile for TPU via Mosaic — dropout path checked on hardware by
scripts/check_pallas_tpu.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.ops import pallas_tri_bridge as tb

B, A, LI, LQA, D = 2, 5, 4, 8, 16


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    s = rng.standard_normal((B, A, LI, LQA, D)).astype(f32)
    v = rng.standard_normal((B, A, LI, LQA, D)).astype(f32)
    gin = (rng.standard_normal(3 * D) * 0.1 + 1.0).astype(f32)
    bin_ = (rng.standard_normal(3 * D) * 0.1).astype(f32)
    w = (rng.standard_normal((3 * D, D)) / np.sqrt(3 * D)).astype(f32)
    b = (rng.standard_normal(D) * 0.1).astype(f32)
    gout = (rng.standard_normal(D) * 0.1 + 1.0).astype(f32)
    bout = (rng.standard_normal(D) * 0.1).astype(f32)
    return tuple(jnp.array(x) for x in (s, v, gin, bin_, w, b, gout, bout))


def test_forward_matches_reference():
    args = make_inputs()
    ref = tb.reference_impl(*args)
    out = tb._forward(*args, seed=0, dropout_rate=0.0, interpret=True,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               rtol=2e-4, atol=2e-4)


def test_custom_vjp_grads_match_reference():
    args = make_inputs()
    seed = jnp.zeros((), jnp.int32)

    def loss_pallas(*a):
        out = tb.fused_tri_bridge(*a, seed, jnp.float32, 0.0)
        return jnp.sum(out ** 2)

    def loss_ref(*a):
        return jnp.sum(tb.reference_impl(*a) ** 2)

    argnums = tuple(range(8))
    g_pallas = jax.grad(loss_pallas, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.array(gp), np.array(gr),
                                   rtol=1e-3, atol=1e-3)


def test_module_unfused_matches_old_mlpbridge():
    """TriMLPBridge's unfused path == MLPBridge applied to the explicit
    concat (the pre-round-2 formulation), with the identical parameter
    tree."""
    from tvqaplus_tpu.models.layers import MLPBridge, TriMLPBridge

    s, v, *_ = make_inputs()
    tri = TriMLPBridge(hsz=D, dropout=0.1, dtype=jnp.float32,
                       use_pallas=False)
    variables = tri.init({"params": jax.random.PRNGKey(0)}, s, v,
                         train=False)
    out_tri = tri.apply(variables, s, v, train=False)

    old = MLPBridge(in_hsz=3 * D, out_hsz=D, dropout=0.1,
                    dtype=jnp.float32)
    cat = jnp.concatenate([s, v, s * v], axis=-1)
    out_old = old.apply(variables, cat, train=False)
    np.testing.assert_allclose(np.array(out_tri), np.array(out_old),
                               rtol=1e-6, atol=1e-6)


def test_module_fused_matches_unfused():
    from tvqaplus_tpu.models.layers import TriMLPBridge

    s, v, *_ = make_inputs()
    tri_f = TriMLPBridge(hsz=D, dropout=0.1, dtype=jnp.float32,
                         use_pallas=True)
    tri_u = TriMLPBridge(hsz=D, dropout=0.1, dtype=jnp.float32,
                         use_pallas=False)
    variables = tri_u.init({"params": jax.random.PRNGKey(0)}, s, v,
                           train=False)
    out_f = tri_f.apply(variables, s, v, train=False)
    out_u = tri_u.apply(variables, s, v, train=False)
    np.testing.assert_allclose(np.array(out_f), np.array(out_u),
                               rtol=2e-4, atol=2e-4)


def test_grad_with_bf16_primals():
    """Cotangents ride the primal dtypes (see the equivalent
    pallas_attention regression)."""
    s, v, *rest = make_inputs()
    seed = jnp.zeros((), jnp.int32)
    bf16 = jnp.bfloat16

    def loss(s, v):
        s, v = s / 1.25, v / 1.25
        out = tb.fused_tri_bridge(s, v, *rest, seed, bf16, 0.0)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gs, gv = jax.grad(loss, argnums=(0, 1))(s.astype(bf16), v.astype(bf16))
    assert gs.dtype == bf16 and gv.dtype == bf16
    assert bool(jnp.isfinite(gs.astype(jnp.float32)).all())
    assert bool(jnp.isfinite(gv.astype(jnp.float32)).all())
