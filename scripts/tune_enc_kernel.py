"""Recalibrate the fused encoder kernel's VMEM model on hardware.

Measures fused-vs-XLA fwd+bwd at each encoder site of the bench config,
sweeping the footprint-model env vars of ``_seqs_per_cell``:

* TVQA_ENC_BWD_BASE — live f32-equivalents/row of the backward.  Round 5
  restructured the backward into TWO PASSES (layer-0 stash recomputed
  after layer-1's backward retires) with a bf16 stash under the bf16
  policy, so the true base should be roughly half the old single-pass 15;
* TVQA_ENC_TAP_COST — live rotated copies per conv tap (running roll).

Each (base, tap) pick changes rows/cell (bigger cells = fewer launches,
bigger matmuls — the lever that decides fused-vs-XLA).  A pick that
under-estimates real liveness OOMs Mosaic's 16 MB scoped stack: the sweep
catches that and reports MOSAIC-OOM instead of crashing, so the largest
SAFE pick is read straight off the table.

Hardware facts encoded here (measured round 4):
* a host-synced dispatch through the axon tunnel costs ~1.5 ms, which
  swamps the small sites — each measurement runs the grad step N times
  inside ONE jit via lax.scan (the carry perturbs x so XLA cannot CSE the
  iterations) and divides.

The ``mrg`` site is the merged-stream input encoder (qa+sub+vid through
one zero-masked call, stage.py _merged_input_encode): its fused number
competes against the SUM of the three separate XLA sites — the
merge_input_streams decision criterion (docs/BENCH.md).

Run on a QUIET TPU host: python scripts/tune_enc_kernel.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.utils.timing import timeit_host_synced

# (site, shape (B, G, L, D), k, zero-mask lens or None) — bench config:
# B=16, A=5, Li=50, Lqa=40, Ls=50, Lr=25, D=128
SITES = [
    ("qa ", (16, 5, 40, 128), 7, None),
    ("sub", (16, 50, 50, 128), 7, None),
    ("vid", (16, 50, 25, 128), 7, None),
    ("mrg", (16, 105, 50, 128), 7, [40] * 5 + [50] * 50 + [25] * 50),
    ("cls", (16, 250, 40, 128), 5, None),   # the #1 single op (bwd)
]
N_INNER = 20          # grad steps per dispatch (amortizes tunnel latency)
# (bwd_base, tap_cost) picks, conservative -> aggressive
SWEEPS = [(15.0, 2.0), (11.0, 1.0), (8.0, 0.5), (6.0, 0.25)]


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


def site_inputs(shape, k, lens):
    b, g, l, d = shape
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal(shape).astype(np.float32))
    pe = jnp.array(rng.standard_normal((l, d)).astype(np.float32) * 0.1)
    p = make_params(d, k, rng)
    zm = None
    if lens is not None:
        zm = jnp.array((np.arange(l)[None, :]
                        < np.asarray(lens)[:, None]).astype(np.float32))
    return x, pe, p, zm


def bench_fused(shape, k, lens, bwd_base, tap):
    from tvqaplus_tpu.ops import pallas_encoder as pe_mod
    os.environ["TVQA_ENC_BWD_BASE"] = str(bwd_base)
    os.environ["TVQA_ENC_TAP_COST"] = str(tap)
    b, g, l, d = shape
    x, pe, p, zm = site_inputs(shape, k, lens)
    tg = pe_mod._seqs_per_cell(g, l, d, k, bwd=True)

    def loss_fused(x, p):
        out = pe_mod.fused_encoder_block(
            x, pe, p, jnp.int32(0), k, jnp.bfloat16, 0.1, None, zm)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    step = scanned_grad_step(loss_fused, x, p)
    try:
        t = timeit_host_synced(lambda: step(x, p), n=5) / N_INNER
    except Exception as e:  # Mosaic scoped-stack OOM etc.
        return tg, None, type(e).__name__ + ": " + str(e)[:300]
    return tg, t, None


def bench_xla(shape, k, lens):
    from tvqaplus_tpu.ops import pallas_encoder as pe_mod
    x, pe, p, zm = site_inputs(shape, k, lens)

    def loss_xla(x, p):
        out = pe_mod.reference_impl(x.astype(jnp.bfloat16), pe, p, k,
                                    zero_mask=zm)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    step = scanned_grad_step(loss_xla, x, p)
    return timeit_host_synced(lambda: step(x, p), n=5) / N_INNER


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    only = os.environ.get("TVQA_TUNE_SITES", "")
    sites = [s for s in SITES
             if not only or s[0].strip() in only.split(",")]
    xla_ms = {}
    for name, shape, k, lens in sites:
        xla_ms[name] = bench_xla(shape, k, lens)
        print(f"{name} k={k} XLA fwd+bwd {xla_ms[name]:7.3f} ms",
              flush=True)
    print()
    for name, shape, k, lens in sites:
        seen = set()
        for base, tap in SWEEPS:
            from tvqaplus_tpu.ops import pallas_encoder as pe_mod
            os.environ["TVQA_ENC_BWD_BASE"] = str(base)
            os.environ["TVQA_ENC_TAP_COST"] = str(tap)
            b, g, l, d = shape
            if pe_mod._seqs_per_cell(g, l, d, k, bwd=True) in seen:
                continue  # same block size -> same program, skip recompile
            tg, t, err = bench_fused(shape, k, lens, base, tap)
            seen.add(tg)
            rows = tg * shape[2]
            if t is None:
                print(f"{name} k={k} base={base:<4} tap={tap:<4} "
                      f"rows/cell={rows:<5} FAILED ({err})", flush=True)
                break  # more aggressive picks would OOM harder
            print(f"{name} k={k} base={base:<4} tap={tap:<4} "
                  f"rows/cell={rows:<5} fused {t:7.3f} ms | XLA "
                  f"{xla_ms[name]:7.3f} ms | {xla_ms[name] / t:.2f}x",
                  flush=True)
        print()
    if all(s in xla_ms for s in ("qa ", "sub", "vid")):
        sep = xla_ms["qa "] + xla_ms["sub"] + xla_ms["vid"]
        print(f"merge decision: separate-XLA total {sep:.3f} ms vs the "
              f"best mrg fused row above (merge wins if smaller)")


if __name__ == "__main__":
    main()
