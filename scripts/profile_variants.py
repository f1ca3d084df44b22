import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax
from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.parallel.mesh import make_mesh, shard_batch
from tvqaplus_tpu.train.loop import Trainer

def build(**kw):
    cfg = Config(bsz=16, test_bsz=16, synthetic_data=True,
                 results_dir_base="results/bench", img_buckets=[50],
                 compute_dtype="bfloat16", **kw)
    cfg.finalize(save=False)
    mesh = make_mesh((1,1), devices=jax.devices()[:1])
    tr = Trainer(cfg, mesh=mesh)
    ds = SyntheticTVQADataset(cfg, cfg.bsz, mode="train")
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.bsz, max_img=50)
    arrays, _ = collate_static([ds[i] for i in range(cfg.bsz)], spec)
    return tr, shard_batch(mesh, arrays)

from tvqaplus_tpu.utils.timing import timeit_host_synced

def timeit(fn, n=30):
    # host-fetch sync: block_until_ready is a no-op on axon (utils/timing.py)
    return timeit_host_synced(fn, n=n, warmup=2, trials=3)

import sys
variant = sys.argv[1]
kw = {
  "full": dict(use_sup_att=True, add_local=True),
  "noatt": dict(use_sup_att=False, add_local=True),
  "nolocal": dict(use_sup_att=True, add_local=False),
  "plain": dict(use_sup_att=False, add_local=False),
  "fp32": dict(use_sup_att=True, add_local=True, compute_dtype="float32"),
}[variant]
tr, batch = build(**kw)
st = [tr.state]
def step():
    s, m = tr._train_step(st[0], batch, tr.rng, use_hard_negatives=False)
    st[0] = s
    return m["loss"]
print(f"{variant}: {timeit(step):.3f} ms/step", flush=True)
fwd = jax.jit(lambda p, b: tr.model.apply({"params": p}, b, train=False)["answer_scores"])
def f(): return fwd(st[0].params, batch)
print(f"{variant} fwd-eval: {timeit(f):.3f} ms", flush=True)
