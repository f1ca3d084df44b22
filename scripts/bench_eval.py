"""Eval-path (serving) throughput: fused Pallas kernel vs pure-XLA."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.parallel.mesh import make_mesh, shard_batch
from tvqaplus_tpu.models.stage import STAGE, ModelConfig

def build(use_pallas, dtype="bfloat16"):
    cfg = Config(bsz=16, test_bsz=16, synthetic_data=True, use_sup_att=True,
                 add_local=True, results_dir_base="results/bench",
                 img_buckets=[50], compute_dtype=dtype, use_pallas=use_pallas)
    cfg.finalize(save=False)
    mesh = make_mesh((1,1), devices=jax.devices()[:1])
    model = STAGE(ModelConfig.from_config(cfg))
    ds = SyntheticTVQADataset(cfg, cfg.bsz, mode="train")
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.bsz, max_img=50)
    arrays, _ = collate_static([ds[i] for i in range(cfg.bsz)], spec)
    batch = shard_batch(mesh, arrays)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b, train=False)["answer_scores"])
    return variables["params"], batch, fwd

from tvqaplus_tpu.utils.timing import timeit_host_synced

def timeit(fn, *a, n=50):
    # host-fetch sync: block_until_ready is a no-op on axon (utils/timing.py)
    return timeit_host_synced(lambda: fn(*a), n=n, warmup=2, trials=3)

# Sections are env-gated so a long grounding compile can be re-run alone
# (first grounding pass pays ~60-120 s of infer_step compiles through the
# remote-compile tunnel; the persistent cache makes repeats fast).
RUN_FWD = os.environ.get("BENCH_EVAL_FWD", "1") == "1"
RUN_QA = os.environ.get("BENCH_EVAL_QA", "1") == "1"
RUN_GROUNDING = os.environ.get("BENCH_EVAL_GROUNDING", "1") == "1"

if RUN_FWD:
    for use_pallas in (False, True):
        p, b, fwd = build(use_pallas)
        ms = timeit(fwd, p, b)
        print(f"eval fwd use_pallas={use_pallas}: {ms:.3f} ms  ({16/ms*1000:.0f} qa/s)", flush=True)


def bench_end_to_end(n_examples=256, grounding=False, li=50,
                     frame_interval=6, tag="", qas_per_video=1,
                     video_dedup=False, sub_buckets=True):
    """Full InferenceRunner serving loop over synthetic examples: host
    collation + upload + device step + host prediction assembly.  Wall
    clock is valid here — the runner host-fetches every batch's outputs."""
    from tvqaplus_tpu.data.synthetic import CachedDataset
    from tvqaplus_tpu.infer.predict import InferenceRunner

    st_cap = max(512, 512 * li // 50)
    cfg = Config(bsz=16, test_bsz=16, synthetic_data=True,
                 results_dir_base="results/bench", img_buckets=[li],
                 max_num_img=li, frame_interval=frame_interval,
                 # unique-subtitle-token cap scales with clip length;
                 # per-batch St buckets cut the upload (the wall on this
                 # tunnel host, ~47 MB/s — docs/BENCH.md)
                 max_sub_tokens=st_cap,
                 sub_token_buckets=(
                     [st_cap // 2, st_cap * 3 // 4] if sub_buckets else []),
                 video_dedup=video_dedup,
                 compute_dtype="bfloat16", use_pallas=True)
    cfg.finalize(save=False)
    model = STAGE(ModelConfig.from_config(cfg))
    # pre-generated examples: measure the serving system, not the synthetic
    # generator (production reads precomputed h5 features)
    ds = SyntheticTVQADataset(cfg, n_examples, mode="valid")
    if qas_per_video > 1:
        # real-data clip layout: ~7 QAs share each video (SURVEY stats)
        from tvqaplus_tpu.data.synthetic import SharedVideoDataset
        ds = SharedVideoDataset(ds, qas_per_video)
    ds = CachedDataset(ds)
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.test_bsz, max_img=li)
    arrays, _ = collate_static([ds[i] for i in range(cfg.test_bsz)], spec)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        train=False)["params"]
    runner = InferenceRunner(cfg, model, params)
    obj_ids = list(range(3, 1000, 7)) if grounding else ()
    runner.run(ds, mode="valid", object_word_ids=obj_ids, debug=True)  # warm
    # best of N trials: the e2e rate is tunnel-bandwidth-bound and the
    # shared tunnel's weather swings run-to-run (measured 6.4-11.8 s for
    # the same 256-example loop); best-of mirrors utils/timing.py
    best, n = None, 0
    for _ in range(int(os.environ.get("BENCH_EVAL_TRIALS", "2"))):
        t0 = time.perf_counter()
        preds = runner.run(ds, mode="valid", object_word_ids=obj_ids)
        dt = time.perf_counter() - t0
        n = len(preds["ts_answer"])
        best = dt if best is None else min(best, dt)
    print(f"serving e2e{tag} grounding={grounding}: {n} examples in "
          f"{best:.2f} s (best of trials) -> {n / best:.1f} qa/s",
          flush=True)


if RUN_QA:
    bench_end_to_end(grounding=False)
if os.environ.get("BENCH_EVAL_AB", "0") == "1":
    # on/off deltas for the two serving features (docs/BENCH.md publishes
    # these rows; the shipped defaults must match the measured winners)
    bench_end_to_end(grounding=False, sub_buckets=False,
                     tag=" st_buckets=off")
    bench_end_to_end(grounding=False, qas_per_video=7, video_dedup=False,
                     tag=" qpv=7,vdedup=off")
if os.environ.get("BENCH_EVAL_VDEDUP", "1") == "1":
    # the real-data layout (~7 QAs/clip) + batch-level video dedup: each
    # unique clip's vid/sub_tokens upload once per batch
    bench_end_to_end(grounding=False, qas_per_video=7, video_dedup=True,
                     tag=" qpv=7+vdedup")
if RUN_GROUNDING:
    bench_end_to_end(grounding=True)
    bench_end_to_end(grounding=True, qas_per_video=7, video_dedup=True,
                     tag=" qpv=7+vdedup")
if os.environ.get("BENCH_EVAL_STRETCH", "0") == "1":
    # stretch config #5 (BASELINE.json): 2x frame rate (frame_interval=3)
    # -> Li=100 long clips, full batched inference incl. grounding records
    bench_end_to_end(n_examples=128, grounding=True, li=100,
                     frame_interval=3, tag=" stretch(li=100,fi=3)")
