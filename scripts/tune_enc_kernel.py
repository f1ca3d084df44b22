"""Recalibrate the fused encoder kernel's VMEM model on hardware.

Measures fused-vs-XLA fwd+bwd at each encoder site of the bench config,
sweeping TVQA_ENC_TAP_COST (the per-tap liveness term of `_seqs_per_cell`).

Two hardware facts this script encodes (measured round 4):
* a host-synced dispatch through the axon tunnel costs ~1.5 ms, which
  swamps the small sites — so each measurement runs the grad step N times
  inside ONE jit via lax.scan (the carry perturbs x so XLA cannot CSE the
  iterations) and divides;
* the REAL k=7 backward footprint is ~(15 + 3.8*k) live f32 elements/row
  (a tap_cost=0.5 pick of t=25 at the sub site OOMed Mosaic's 16 MB scoped
  stack at 26.78 MB), so the sweep skips settings whose measured-calibrated
  footprint exceeds 15 MB instead of crashing.

Run on a QUIET TPU host: python scripts/tune_enc_kernel.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.utils.timing import timeit_host_synced

# (site, shape (B, G, L, D), k) — bench config: B=16, A=5, Li=50,
# Lqa=40, Ls=50, Lr=25, D=128 (input_encoder sees the row-merged views)
SITES = [
    ("qa  (16,5,40)", (16, 5, 40, 128), 7),
    ("sub (16,50,50)", (16, 50, 50, 128), 7),
    ("vid (16,50,25)", (16, 50, 25, 128), 7),
    ("mrg (16,105,50)", (16, 105, 50, 128), 7),  # merged qa+sub+vid site
    ("cls (16,250,40)", (16, 250, 40, 128), 5),   # regression guard
]
N_INNER = 20          # grad steps per dispatch (amortizes tunnel latency)
MEASURED_TAP = 3.8    # real f32/row/tap liveness of the k=7 backward


def make_params(d, k, rng):
    p = {}
    for i in (0, 1):
        p[f"ln{i}_s"] = jnp.ones(d)
        p[f"ln{i}_b"] = jnp.zeros(d)
        p[f"dw{i}"] = jnp.array(
            (rng.standard_normal((k, d)) * 0.3).astype(np.float32))
        p[f"dwb{i}"] = jnp.zeros(d)
        p[f"pw{i}"] = jnp.array(
            (rng.standard_normal((d, d)) / np.sqrt(d)).astype(np.float32))
        p[f"pwb{i}"] = jnp.zeros(d)
    p["lnf_s"] = jnp.ones(d)
    p["lnf_b"] = jnp.zeros(d)
    return p


def scanned_grad_step(loss, x, p):
    """N_INNER grad evaluations inside one jit; the carry feeds back into x
    so iterations can't be CSE'd, and only scalars leave the device."""
    def body(c, _):
        g = jax.grad(loss, argnums=(0, 1))(x + c * 1e-6, p)
        c2 = jnp.sum(g[0].astype(jnp.float32)) * 1e-9 + jnp.sum(g[1]["pw0"]) * 0
        return c2, None

    def run(x, p):
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_INNER)
        return c

    return jax.jit(run)


def bench_site(shape, k, tap_cost):
    from tvqaplus_tpu.ops import pallas_encoder as pe_mod
    os.environ["TVQA_ENC_TAP_COST"] = str(tap_cost)
    b, g, l, d = shape
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal(shape).astype(np.float32))
    pe = jnp.array(rng.standard_normal((l, d)).astype(np.float32) * 0.1)
    p = make_params(d, k, rng)
    tg = pe_mod._seqs_per_cell(g, l, d, k)
    real_fp = 4 * (15 + MEASURED_TAP * k) * tg * l * d
    if real_fp > 15 * 1024 * 1024:
        return tg, None, None   # would OOM Mosaic's scoped stack

    def loss_fused(x, p):
        return jnp.mean(pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), k, jnp.bfloat16, 0.1).astype(
                jnp.float32) ** 2)

    def loss_xla(x, p):
        return jnp.mean(pe_mod.reference_impl(
            x.astype(jnp.bfloat16), pe, p, k).astype(jnp.float32) ** 2)

    step_fused = scanned_grad_step(loss_fused, x, p)
    step_xla = scanned_grad_step(loss_xla, x, p)
    tp = timeit_host_synced(lambda: step_fused(x, p), n=5) / N_INNER
    tx = timeit_host_synced(lambda: step_xla(x, p), n=5) / N_INNER
    return tg, tp, tx


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    for name, shape, k in SITES:
        for tap_cost in (2.0, 1.0):
            tg, tp, tx = bench_site(shape, k, tap_cost)
            if tp is None:
                print(f"{name} k={k} tap_cost={tap_cost:<4} rows/cell="
                      f"{tg * shape[2]:<5} SKIPPED (real footprint > 15 MB)",
                      flush=True)
                continue
            print(f"{name} k={k} tap_cost={tap_cost:<4} rows/cell="
                  f"{tg * shape[2]:<5} fused {tp:7.3f} ms | XLA {tx:7.3f} ms"
                  f" | {tx / tp:.2f}x", flush=True)
        print()


if __name__ == "__main__":
    main()
