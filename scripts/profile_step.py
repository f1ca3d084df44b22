"""Per-op TPU profile of the training step (bench configuration).

Traces a few dispatches with jax.profiler, parses the xplane with xprof's
converter, and prints the top HLO ops + an aggregation by program region
(inferred from HLO op metadata / fusion names).  This is the ground-truth
step-time decomposition: host-fetch-synced wall time can hide where device
time goes (VERDICT r1: never draw optimization conclusions without a real
profile).

Usage: python scripts/profile_step.py [--steps N] [--trace_dir DIR]
Needs a quiet host (don't run while pytest runs).
"""
import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def build_trainer():
    from tvqaplus_tpu.config import Config
    from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
    from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
    from tvqaplus_tpu.parallel.mesh import make_mesh, shard_batch
    from tvqaplus_tpu.train.loop import Trainer

    cfg = Config(bsz=16, test_bsz=16, use_sup_att=True, add_local=True,
                 synthetic_data=True, results_dir_base="results/bench",
                 compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                 use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
                 img_buckets=[50])
    cfg.finalize(save=False)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticTVQADataset(cfg, cfg.bsz, mode="train")
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.bsz, max_img=50)
    arrays, _ = collate_static([ds[i] for i in range(cfg.bsz)], spec)
    k = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "10"))
    stacked = {key: np.stack([v] * k) for key, v in arrays.items()}
    batch = shard_batch(mesh, stacked, stacked=True)
    return trainer, batch, k


def host_sync(metrics):
    return float(np.asarray(jax.device_get(metrics["loss"])).ravel()[-1])


REGION_RULES = [
    ("pallas_bwd", r"transpose\(jvp.*qa_ctx_attention"),
    ("pallas_fwd", r"qa_ctx_attention.*pallas_call"),
    ("qa_ctx_xla", r"qa_ctx_attention|c2q_down_projection"),
    ("cls_encoder", r"cls_encoder|classifier_head|_proposal_pooling|"
                    r"residual_temporal|temporal_scoring|cls_projection|"
                    r"classifier/"),
    ("concat_fc", r"concat_fc"),
    ("base_enc", r"input_encoder|input_embedding|bert_word_encoding|vid_fc|"
                 r"base_encoder"),
    ("losses", r"total_loss|att_loss|ts_loss|cls_loss|softmax_cross|"
               r"log_softmax|spans|proposal"),
    ("optimizer", r"adam|clip|optax|apply_updates|global_norm"),
    ("rng", r"rng_bit_generator|threefry|random_bits|bernoulli"),
]


def region_of(name):
    for region, pat in REGION_RULES:
        if re.search(pat, name, re.IGNORECASE):
            return region
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/step_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", action="store_true",
                    help="re-parse an existing trace_dir without touching "
                         "the TPU")
    args = ap.parse_args()

    k = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "10"))
    if not args.parse_only:
        trainer, batch, k = build_trainer()
        for _ in range(2):  # compile + warm
            trainer.state, metrics = trainer._train_step_scan(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
        host_sync(metrics)

        with jax.profiler.trace(args.trace_dir):
            for _ in range(args.steps):
                trainer.state, metrics = trainer._train_step_scan(
                    trainer.state, batch, trainer.rng,
                    use_hard_negatives=False)
            host_sync(metrics)

    xplanes = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xplanes:
        sys.exit("no xplane.pb produced")
    xplane = xplanes[-1]

    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    t0 = table[0] if isinstance(table, list) else table
    cols = [c["label"] for c in t0["cols"]]
    i_cat = cols.index("HLO op category")
    i_name = cols.index("HLO op name")
    i_fw = cols.index("Framework op name")
    i_self = cols.index("Total self time (us)")
    i_bound = cols.index("Bound by")
    ops = []
    for r in t0["rows"]:
        vals = [c.get("v") for c in r["c"]]
        ops.append((str(vals[i_fw]) or str(vals[i_name]), str(vals[i_cat]),
                    float(vals[i_self] or 0.0), str(vals[i_bound])))
    ops.sort(key=lambda t: -t[2])
    n_steps = args.steps * k
    total = sum(t for _, _, t, _ in ops)
    print(f"total device self-time={total/1e3:.0f} ms over {n_steps} steps "
          f"-> {total/n_steps/1000:.3f} ms/step")
    print(f"\ntop {args.top} ops (us/step, self):")
    for fw, cat, t, bound in ops[:args.top]:
        short = fw.replace("jit(train_step_scan)/while/body/closed_call/", "")
        print(f"  {t/n_steps:8.1f} {bound:8s} {cat[:18]:18s} {short[:95]}")
    agg = {}
    for fw, _, t, _ in ops:
        agg[region_of(fw)] = agg.get(region_of(fw), 0.0) + t
    print("\nby region (ms/step):")
    for region, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {t/n_steps/1000:8.3f}  {region}")


if __name__ == "__main__":
    main()
