"""Fused qa-ctx-attention Pallas kernel vs the pure-JAX oracle (interpret
mode on CPU; the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tvqaplus_tpu.models.attention import l2_normalize
from tvqaplus_tpu.ops import pallas_attention as pa

B, A, LI, LQA, LR, D = 2, 5, 4, 8, 6, 16


def make_inputs(seed=0, all_valid=False):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    ce = rng.standard_normal((B, A, LQA, D)).astype(f32)
    qe = rng.standard_normal((B, LI, LR, D)).astype(f32)
    cn = np.array(l2_normalize(jnp.array(ce)))
    qn = np.array(l2_normalize(jnp.array(qe)))
    if all_valid:
        c_mask = np.ones((B, A, LQA), f32)
        q_mask = np.ones((B, LI, LR), f32)
    else:
        c_mask = (rng.random((B, A, LQA)) > 0.25).astype(f32)
        c_mask[..., 0] = 1
        q_mask = (rng.random((B, LI, LR)) > 0.25).astype(f32)
        q_mask[..., 0] = 1
    gamma = rng.standard_normal(3 * D).astype(f32) * 0.1 + 1.0
    beta = rng.standard_normal(3 * D).astype(f32) * 0.1
    w = (rng.standard_normal((3 * D, D)) / np.sqrt(3 * D)).astype(f32)
    b = rng.standard_normal(D).astype(f32) * 0.1
    return tuple(jnp.array(x) for x in
                 (cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b))


@pytest.mark.parametrize("all_valid", [True, False])
def test_forward_matches_reference(all_valid):
    args = make_inputs(all_valid=all_valid)
    mixed_ref, raw_ref = pa.reference_impl(*args, scale=10.0)
    mixed_k, raw_k = pa._pallas_forward(*args, scale=10.0, dropout_rate=0.0,
                                        seed=0, interpret=True,
                                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.array(mixed_k), np.array(mixed_ref),
                               rtol=2e-4, atol=2e-4)
    # raw scores: compare where defined (padding is -1e10 in both)
    np.testing.assert_allclose(np.array(raw_k), np.array(raw_ref),
                               rtol=2e-4, atol=2e-4)


def test_custom_vjp_grads_match_reference():
    """The REAL Pallas backward kernel (interpret mode here, Mosaic on TPU)
    against the pure-JAX VJP of the oracle, for every differentiable input
    and both cotangents (mixed + raw)."""
    args = make_inputs()
    seed = jnp.zeros((), jnp.int32)

    def loss_pallas(cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b):
        mixed, raw = pa.fused_qa_ctx_attention(
            cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, b, seed,
            None, 10.0, jnp.float32, 0.0)
        return jnp.sum(mixed ** 2) + jnp.sum(jnp.where(raw > -1e9, raw, 0.0))

    def loss_ref(cn, ce, qn, qe, *rest):
        mixed, raw = pa.reference_impl(cn, ce, qn, qe, *rest, scale=10.0)
        return jnp.sum(mixed ** 2) + jnp.sum(jnp.where(raw > -1e9, raw, 0.0))

    argnums = (0, 1, 2, 3, 6, 7, 8, 9)  # cn ce qn qe gamma beta w b
    g_pallas = jax.grad(loss_pallas, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.array(gp), np.array(gr),
                                   rtol=1e-3, atol=1e-3)


def test_target_raw_mode_matches_full():
    """raw_mode="target" must equal the full raw output gathered at the
    target answer — forward values and gradients (the training att loss
    reads nothing else)."""
    args = make_inputs()
    seed = jnp.zeros((), jnp.int32)
    targets = jnp.array([3, 1], jnp.int32)

    full_mixed, full_raw = pa.fused_qa_ctx_attention(
        *args, seed, None, 10.0, jnp.float32, 0.0, "full")
    t_mixed, t_raw = pa.fused_qa_ctx_attention(
        *args, seed, targets, 10.0, jnp.float32, 0.0, "target")
    np.testing.assert_allclose(np.array(t_mixed), np.array(full_mixed),
                               rtol=1e-6)
    gathered = np.array(full_raw)[np.arange(B), np.array(targets)]
    np.testing.assert_allclose(np.array(t_raw), gathered, rtol=1e-6)

    def loss(mode):
        def f(cn, ce, qn, qe, gamma, beta, w, b):
            a = (cn, ce, qn, qe) + args[4:6] + (gamma, beta, w, b)
            mixed, raw = pa.fused_qa_ctx_attention(
                *a, seed, targets if mode == "target" else None,
                10.0, jnp.float32, 0.0, mode)
            if mode == "full":
                raw = raw[jnp.arange(B), targets]
            return (jnp.sum(mixed ** 2)
                    + jnp.sum(jnp.where(raw > -1e9, raw ** 2, 0.0)))
        return f

    diff_args = args[:4] + args[6:]
    g_full = jax.grad(loss("full"), argnums=tuple(range(8)))(*diff_args)
    g_tgt = jax.grad(loss("target"), argnums=tuple(range(8)))(*diff_args)
    for gf, gt in zip(g_full, g_tgt):
        np.testing.assert_allclose(np.array(gt), np.array(gf),
                                   rtol=1e-5, atol=1e-6)


def test_kernel_invoked_in_train_step(monkeypatch):
    """A train=True STAGE step with use_pallas must actually call the fused
    kernel (round-1 verdict: the kernel silently bypassed training because
    of dropout; now only the non-TPU dropout path bypasses)."""
    import jax.numpy as jnp
    from tests.test_stage_model import tiny_batch, tiny_cfg
    from tvqaplus_tpu.models.stage import STAGE

    calls = []
    real = pa.fused_qa_ctx_attention

    def spy(*args, **kw):
        calls.append(args[14] if len(args) > 14 else kw.get("dropout_rate"))
        return real(*args, **kw)

    monkeypatch.setattr(pa, "fused_qa_ctx_attention", spy)
    # dropout=0 exercises the kernel on every backend; on TPU the dropout>0
    # path uses it too (asserted in scripts/check_pallas_tpu.py)
    cfg = tiny_cfg(add_local=True, use_pallas=True, dropout=0.0)
    batch = {k: jnp.array(v) for k, v in tiny_batch().items()}
    model = STAGE(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    calls.clear()
    model.apply(variables, batch, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(calls) == 2  # sub + vid streams


def test_dropout_path_runs_and_differs():
    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_seed has no CPU interpreter")
    args = make_inputs(all_valid=True)
    mixed0, _ = pa._pallas_forward(*args, scale=10.0, dropout_rate=0.0,
                                   seed=1, interpret=True)
    mixed1, _ = pa._pallas_forward(*args, scale=10.0, dropout_rate=0.5,
                                   seed=1, interpret=True)
    assert not np.allclose(np.array(mixed0), np.array(mixed1))
    # dropout keeps ~half the pre-projection activations; output still finite
    assert np.isfinite(np.array(mixed1)).all()


def test_grad_with_bf16_primals():
    """Cotangents must ride the primal dtypes: under the bf16 policy the
    embeddings reach the kernel as bf16, and the f32 accumulators of the
    backward kernel must be cast back before upstream transpose rules
    (lax.div in l2_normalize/_dropout) see them.  Regression for a
    round-2 TypeError ('lax.div requires arguments to have the same
    dtypes, got float32, bfloat16') raised only under jax.grad."""
    cn, ce, qn, qe, *rest = make_inputs(all_valid=True)
    seed = jnp.zeros((), jnp.int32)
    bf16 = jnp.bfloat16

    def loss(cn, ce, qn, qe):
        # mimic the model: bf16 primals that pass through a division
        # upstream of the kernel (as l2_normalize/_dropout do)
        cn, ce, qn, qe = (x / 1.25 for x in (cn, ce, qn, qe))
        mixed, _ = pa.fused_qa_ctx_attention(
            cn, ce, qn, qe, *rest, seed, None, 10.0, bf16, 0.0)
        return jnp.sum(mixed.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        cn.astype(bf16), ce.astype(bf16), qn.astype(bf16), qe.astype(bf16))
    for g in grads:
        assert g.dtype == bf16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_bfloat16_kernel_close():
    args = make_inputs(all_valid=True)
    mixed_ref, _ = pa.reference_impl(*args, scale=10.0)
    mixed_k, _ = pa._pallas_forward(*args, scale=10.0, dropout_rate=0.0,
                                    seed=0, interpret=True,
                                    compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.array(mixed_k), np.array(mixed_ref),
                               rtol=0.1, atol=0.05)
