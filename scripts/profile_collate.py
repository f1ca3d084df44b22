"""Profile ONE bench-shape collate on the host: where do the ms go?

The free-running mixed-bucket epoch is host-collation-bound on this 1-vCPU
tunnel host (docs/BENCH.md, bench_buckets) — this script breaks a
bench-shape `collate_static` into its per-section costs so the C fast
paths (native/fastops.c) target the real hot loops.  Run on a QUIET host.

Usage: python scripts/profile_collate.py [n_batches]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("TVQA_FORCE_PLATFORM", "cpu")

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
from tvqaplus_tpu.data.synthetic import CachedDataset, SyntheticTVQADataset
from tvqaplus_tpu import native


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = Config(bsz=16, use_sup_att=True, add_local=True,
                 synthetic_data=True, results_dir_base="results/bench",
                 img_buckets=[50])
    cfg.finalize(save=False)
    ds = CachedDataset(SyntheticTVQADataset(cfg, 64, mode="train"))
    spec = StaticShapeSpec.from_config(cfg, batch=16, max_img=50)
    examples = [[ds[(b * 16 + i) % 64] for i in range(16)]
                for b in range(n_batches)]
    print(f"native C library: {native.available()}")

    # warm
    collate_static(examples[0], spec)

    t0 = time.perf_counter()
    for ex in examples:
        collate_static(ex, spec)
    dt = time.perf_counter() - t0
    print(f"collate_static (train, att entries): "
          f"{1000 * dt / n_batches:.2f} ms/batch "
          f"({16 * n_batches / dt:.0f} ex/s)")

    t0 = time.perf_counter()
    for ex in examples:
        collate_static(ex, spec, skip_att=True)
    dt = time.perf_counter() - t0
    print(f"collate_static (serving, skip_att): "
          f"{1000 * dt / n_batches:.2f} ms/batch "
          f"({16 * n_batches / dt:.0f} ex/s)")

    pr = cProfile.Profile()
    pr.enable()
    for ex in examples:
        collate_static(ex, spec)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
