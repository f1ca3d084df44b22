"""TPU validation + benchmark for the fused qa-ctx-attention kernel.

Runs ON THE TPU (the CPU test suite covers the same kernels in interpret
mode, except the dropout path, which needs the hardware PRNG):

1. forward + backward parity vs the pure-JAX oracle at dropout=0;
2. dropout-path checks: keep-rate, determinism in seed, finite-difference
   gradient check (valid because the PRNG mask depends only on
   (seed, grid position), so an FD probe with the same seed differentiates
   the same realized function the backward replays);
3. host-fetch-timed fwd+bwd comparison: fused kernel vs pure-XLA path at
   Li=50 and Li=100 (VERDICT r1 next-step #4's acceptance bar).

Usage: python scripts/check_pallas_tpu.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.models.attention import l2_normalize
from tvqaplus_tpu.ops import pallas_attention as pa
from tvqaplus_tpu.utils.timing import timeit_host_synced


def make_inputs(b, a, li, lqa, lr, d, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    ce = rng.standard_normal((b, a, lqa, d)).astype(f32)
    qe = rng.standard_normal((b, li, lr, d)).astype(f32)
    cn = np.array(l2_normalize(jnp.array(ce)))
    qn = np.array(l2_normalize(jnp.array(qe)))
    c_mask = (rng.random((b, a, lqa)) > 0.2).astype(f32)
    c_mask[..., 0] = 1
    q_mask = (rng.random((b, li, lr)) > 0.2).astype(f32)
    q_mask[..., 0] = 1
    gamma = rng.standard_normal(3 * d).astype(f32) * 0.1 + 1.0
    beta = rng.standard_normal(3 * d).astype(f32) * 0.1
    w = (rng.standard_normal((3 * d, d)) / np.sqrt(3 * d)).astype(f32)
    bias = rng.standard_normal(d).astype(f32) * 0.1
    return tuple(jnp.array(x) for x in
                 (cn, ce, qn, qe, c_mask, q_mask, gamma, beta, w, bias))


def loss_of(mixed, raw):
    return jnp.sum(mixed ** 2) + 0.01 * jnp.sum(
        jnp.where(raw > -1e9, raw, 0.0) ** 2)


def check_parity_dropout0(args):
    # the oracle's einsums run at the TPU's default bf16-ish matmul
    # precision otherwise (CLAUDE.md gotcha) — force f32 passes for parity
    jax.config.update("jax_default_matmul_precision", "highest")
    seed = jnp.zeros((), jnp.int32)

    def f_pallas(*a):
        return loss_of(*pa.fused_qa_ctx_attention(
            *a, seed, None, 10.0, jnp.float32, 0.0))

    def f_ref(*a):
        return loss_of(*pa.reference_impl(*a, scale=10.0))

    argnums = (0, 1, 2, 3, 6, 7, 8, 9)
    vp, gp = jax.value_and_grad(f_pallas, argnums=argnums)(*args)
    vr, gr = jax.value_and_grad(f_ref, argnums=argnums)(*args)
    np.testing.assert_allclose(float(vp), float(vr), rtol=2e-4)
    for x, y in zip(gp, gr):
        np.testing.assert_allclose(np.array(x), np.array(y),
                                   rtol=2e-3, atol=2e-3)
    print("PASS dropout=0 fwd+bwd parity vs oracle (TPU Mosaic kernels)")


def check_dropout_path(args):
    rate = 0.35

    def f(seed, *a):
        return pa.fused_qa_ctx_attention(*a, seed, None, 10.0, jnp.float32, rate)

    m1, _ = f(jnp.int32(7), *args)
    m1b, _ = f(jnp.int32(7), *args)
    m2, _ = f(jnp.int32(8), *args)
    assert np.array_equal(np.array(m1), np.array(m1b)), "seed not determin."
    assert not np.allclose(np.array(m1), np.array(m2)), "seed has no effect"
    print("PASS dropout determinism in seed")

    # FD probe on beta: same seed -> same realized mask -> FD is exact
    def loss(beta, seed):
        a = list(args)
        a[7] = beta
        return loss_of(*pa.fused_qa_ctx_attention(
            *a, seed, None, 10.0, jnp.float32, rate))

    seed = jnp.int32(3)
    g = jax.grad(loss)(args[7], seed)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = rng.standard_normal(args[7].shape).astype(np.float32)
        v /= np.linalg.norm(v)
        eps = 1e-2
        fp = float(loss(args[7] + eps * v, seed))
        fm = float(loss(args[7] - eps * v, seed))
        fd = (fp - fm) / (2 * eps)
        an = float(jnp.vdot(g, v))
        assert abs(fd - an) <= 2e-2 * max(1.0, abs(fd)), (fd, an)
    print("PASS dropout backward finite-difference check (PRNG replay)")


def bench(b, a, li, lqa, lr, d, rate):
    args = make_inputs(b, a, li, lqa, lr, d)
    seed = jnp.int32(5)

    def _scalars(g):
        # reduce grads to scalars ON DEVICE: returning the raw (multi-MB)
        # grad arrays makes the harness ship them through the axon tunnel
        # every call (~1.5 ms/10 MB), swamping the device time being
        # measured (a 3 ms kernel "benched" at 122 ms before this fix)
        return tuple(jnp.sum(x.astype(jnp.float32)) for x in g)

    @jax.jit
    def step_pallas(*a):
        return _scalars(jax.grad(
            lambda *x: loss_of(*pa.fused_qa_ctx_attention(
                *x, seed, None, 10.0, jnp.bfloat16, rate)),
            argnums=(0, 2, 8))(*a))

    @jax.jit
    def step_xla(*a):
        return _scalars(jax.grad(
            lambda *x: loss_of(*pa.reference_impl(*x, scale=10.0)),
            argnums=(0, 2, 8))(*a))

    tp = timeit_host_synced(lambda: step_pallas(*args), n=20)
    tx = timeit_host_synced(lambda: step_xla(*args), n=20)
    print(f"Li={li:4d} rate={rate}: fused fwd+bwd {tp:7.3f} ms | "
          f"pure-XLA (no dropout) {tx:7.3f} ms | speedup {tx / tp:.2f}x")
    return tp, tx


def make_tri_inputs(b, a, li, lqa, d, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    s = rng.standard_normal((b, a, li, lqa, d)).astype(f32)
    v = rng.standard_normal((b, a, li, lqa, d)).astype(f32)
    gin = (rng.standard_normal(3 * d) * 0.1 + 1.0).astype(f32)
    bin_ = (rng.standard_normal(3 * d) * 0.1).astype(f32)
    w = (rng.standard_normal((3 * d, d)) / np.sqrt(3 * d)).astype(f32)
    bias = (rng.standard_normal(d) * 0.1).astype(f32)
    gout = (rng.standard_normal(d) * 0.1 + 1.0).astype(f32)
    bout = (rng.standard_normal(d) * 0.1).astype(f32)
    return tuple(jnp.array(x) for x in
                 (s, v, gin, bin_, w, bias, gout, bout))


def check_tri_bridge():
    """Tri-concat MLP-bridge kernel (ops/pallas_tri_bridge.py): Mosaic
    parity at dropout=0, seed determinism, FD gradient check with dropout
    (PRNG replay), and a fwd+bwd timing vs the pure-XLA formulation."""
    from tvqaplus_tpu.ops import pallas_tri_bridge as tb

    jax.config.update("jax_default_matmul_precision", "highest")
    args = make_tri_inputs(4, 5, 10, 40, 128)
    seed = jnp.zeros((), jnp.int32)

    def f_pallas(*a):
        return jnp.sum(tb.fused_tri_bridge(*a, seed, jnp.float32, 0.0) ** 2)

    def f_ref(*a):
        return jnp.sum(tb.reference_impl(*a) ** 2)

    argnums = tuple(range(8))
    vp, gp = jax.value_and_grad(f_pallas, argnums=argnums)(*args)
    vr, gr = jax.value_and_grad(f_ref, argnums=argnums)(*args)
    np.testing.assert_allclose(float(vp), float(vr), rtol=2e-4)
    for x, y in zip(gp, gr):
        np.testing.assert_allclose(np.array(x), np.array(y),
                                   rtol=2e-3, atol=2e-3)
    print("PASS tri-bridge dropout=0 fwd+bwd parity vs oracle")

    rate = 0.35
    out1 = tb.fused_tri_bridge(*args, jnp.int32(7), jnp.float32, rate)
    out1b = tb.fused_tri_bridge(*args, jnp.int32(7), jnp.float32, rate)
    out2 = tb.fused_tri_bridge(*args, jnp.int32(8), jnp.float32, rate)
    assert np.array_equal(np.array(out1), np.array(out1b))
    assert not np.allclose(np.array(out1), np.array(out2))

    def loss(gin, sd):
        a = list(args)
        a[2] = gin
        # MEAN-scaled: a sum-loss at these shapes is ~1e6, so its f32
        # rounding (~0.1) swamps the FD quotient at eps=1e-2 — the check
        # must keep the loss O(1) for the FD to resolve the gradient
        return jnp.mean(tb.fused_tri_bridge(*a, sd, jnp.float32, rate) ** 2)

    sd = jnp.int32(3)
    g = jax.grad(loss)(args[2], sd)
    rng = np.random.default_rng(0)
    for _ in range(3):
        vdir = rng.standard_normal(args[2].shape).astype(np.float32)
        vdir /= np.linalg.norm(vdir)
        eps = 1e-2
        fd = (float(loss(args[2] + eps * vdir, sd))
              - float(loss(args[2] - eps * vdir, sd))) / (2 * eps)
        an = float(jnp.vdot(g, vdir))
        assert abs(fd - an) <= 2e-2 * max(1e-3, abs(fd)), (fd, an)
    print("PASS tri-bridge dropout determinism + FD gradient (PRNG replay)")

    jax.config.update("jax_default_matmul_precision", "default")
    big = make_tri_inputs(16, 5, 50, 40, 128)

    @jax.jit
    def step_pallas(*a):
        g = jax.grad(lambda *x: jnp.sum(tb.fused_tri_bridge(
            *x, seed, jnp.bfloat16, 0.1).astype(jnp.float32) ** 2),
            argnums=(0, 1, 4))(*a)
        return tuple(jnp.sum(x.astype(jnp.float32)) for x in g)

    @jax.jit
    def step_xla(*a):
        g = jax.grad(lambda *x: jnp.sum(tb.reference_impl(
            *x).astype(jnp.float32) ** 2), argnums=(0, 1, 4))(*a)
        return tuple(jnp.sum(x.astype(jnp.float32)) for x in g)

    tp = timeit_host_synced(lambda: step_pallas(*big), n=20)
    tx = timeit_host_synced(lambda: step_xla(*big), n=20)
    print(f"tri-bridge Li=50: fused fwd+bwd {tp:7.3f} ms | pure-XLA "
          f"(no dropout) {tx:7.3f} ms | speedup {tx / tp:.2f}x")
    assert tp <= tx * 1.05, "tri-bridge kernel slower than XLA"
    print("PASS tri-bridge >= XLA at Li=50")


def check_encoder():
    """Fused QANet encoder-block kernel (ops/pallas_encoder.py): Mosaic
    parity at dropout=0, dropout determinism + FD grad, and a fwd+bwd
    timing vs XLA at the cls-encoder bench shapes ((16, 250, 40, 128))."""
    from tests.test_pallas_encoder import make_inputs as mk_small
    from tvqaplus_tpu.ops import pallas_encoder as pe_mod

    jax.config.update("jax_default_matmul_precision", "highest")
    x, pe, p = mk_small()
    k = 5

    def loss_k(x, p):
        return jnp.mean(pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), k, jnp.float32, 0.0) ** 2)

    def loss_r(x, p):
        return jnp.mean(pe_mod.reference_impl(x, pe, p, k) ** 2)

    (vk, gk), (vr, gr) = (jax.value_and_grad(f, argnums=(0, 1))(x, p)
                          for f in (loss_k, loss_r))
    np.testing.assert_allclose(float(vk), float(vr), rtol=2e-4)
    np.testing.assert_allclose(np.array(gk[0]), np.array(gr[0]),
                               rtol=2e-3, atol=2e-3)
    for key in p:
        np.testing.assert_allclose(np.array(gk[1][key]),
                                   np.array(gr[1][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=key)
    print("PASS encoder dropout=0 fwd+bwd parity vs oracle")

    rate = 0.35
    o1 = pe_mod.fused_encoder_block(x, pe, p, jnp.int32(7), k,
                                    jnp.float32, rate)
    o1b = pe_mod.fused_encoder_block(x, pe, p, jnp.int32(7), k,
                                     jnp.float32, rate)
    o2 = pe_mod.fused_encoder_block(x, pe, p, jnp.int32(8), k,
                                    jnp.float32, rate)
    assert np.array_equal(np.array(o1), np.array(o1b))
    assert not np.allclose(np.array(o1), np.array(o2))

    # FD-probe pw0: downstream of the in-kernel dropout (replay-sensitive)
    # with a large gradient — tiny-magnitude probes (e.g. ln0_s, |g|~3e-3)
    # sit at the f32 FD noise/truncation floor and false-alarm
    def loss_d(pw0, sd):
        pp = dict(p, pw0=pw0)
        return jnp.mean(pe_mod.fused_encoder_block(
            x, pe, pp, sd, k, jnp.float32, rate) ** 2)

    sd = jnp.int32(3)
    g = jax.grad(loss_d)(p["pw0"], sd)
    rng = np.random.default_rng(0)
    for _ in range(3):
        vdir = rng.standard_normal(p["pw0"].shape).astype(np.float32)
        vdir /= np.linalg.norm(vdir)
        eps = 1e-2
        fd = (float(loss_d(p["pw0"] + eps * vdir, sd))
              - float(loss_d(p["pw0"] - eps * vdir, sd))) / (2 * eps)
        an = float(jnp.vdot(g, vdir))
        assert abs(fd - an) <= 2e-2 * max(1e-2, abs(fd)), (fd, an)
    print("PASS encoder dropout determinism + FD gradient (PRNG replay)")

    jax.config.update("jax_default_matmul_precision", "default")
    rng = np.random.default_rng(0)
    xb = jnp.array(rng.standard_normal((16, 250, 40, 128)).astype(
        np.float32))
    peb = jnp.array(rng.standard_normal((40, 128)).astype(np.float32) * 0.1)
    pb = {}
    for i in (0, 1):
        pb[f"ln{i}_s"] = jnp.ones(128)
        pb[f"ln{i}_b"] = jnp.zeros(128)
        pb[f"dw{i}"] = jnp.array(
            (rng.standard_normal((5, 128)) * 0.3).astype(np.float32))
        pb[f"dwb{i}"] = jnp.zeros(128)
        pb[f"pw{i}"] = jnp.array(
            (rng.standard_normal((128, 128)) / 11.3).astype(np.float32))
        pb[f"pwb{i}"] = jnp.zeros(128)
    pb["lnf_s"] = jnp.ones(128)
    pb["lnf_b"] = jnp.zeros(128)

    @jax.jit
    def step_pallas(x, p):
        g = jax.grad(lambda x, p: jnp.mean(pe_mod.fused_encoder_block(
            x, peb, p, jnp.int32(0), 5, jnp.bfloat16, 0.1).astype(
                jnp.float32) ** 2), argnums=(0, 1))(x, p)
        return (jnp.sum(g[0].astype(jnp.float32)),
                jnp.sum(g[1]["pw0"]))

    @jax.jit
    def step_xla(x, p):
        g = jax.grad(lambda x, p: jnp.mean(pe_mod.reference_impl(
            x.astype(jnp.bfloat16), peb, p, 5).astype(jnp.float32) ** 2),
            argnums=(0, 1))(x, p)
        return (jnp.sum(g[0].astype(jnp.float32)),
                jnp.sum(g[1]["pw0"]))

    tp = timeit_host_synced(lambda: step_pallas(xb, pb), n=20)
    tx = timeit_host_synced(lambda: step_xla(xb, pb), n=20)
    print(f"encoder (16,250,40,128): fused fwd+bwd {tp:7.3f} ms | "
          f"pure-XLA {tx:7.3f} ms | speedup {tx / tp:.2f}x")
    assert tp <= tx * 1.05, "encoder kernel slower than XLA"
    print("PASS encoder >= XLA at cls shapes")


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    small = make_inputs(4, 5, 8, 40, 25, 128)
    check_parity_dropout0(small)
    check_dropout_path(small)
    jax.config.update("jax_default_matmul_precision", "default")
    b, a, lqa, lr, d = 16, 5, 40, 25, 128
    t50p, t50x = bench(b, a, 50, lqa, lr, d, 0.1)
    t100p, t100x = bench(b, a, 100, lqa, lr, d, 0.1)
    assert t50p <= t50x * 1.05, "kernel slower than XLA at Li=50"
    assert t100p < t100x, "kernel not faster than XLA at Li=100"
    print("PASS kernel >= XLA at Li=50 and faster at Li=100")
    check_tri_bridge()
    check_encoder()


if __name__ == "__main__":
    main()
