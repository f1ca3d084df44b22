"""Worker process for the 2-process CPU multi-host smoke test
(tests/test_multihost.py).

Each worker joins a jax.distributed cluster (coordinator on localhost),
owns 4 virtual CPU devices, builds the (data, ctx) multihost mesh (data
spanning both processes = the DCN axis; ctx within a process = ICI),
loads ITS OWN half of the global batch, and runs two full STAGE training
steps.  Prints ``RESULT <pid> <loss0> <loss1>`` — the test asserts both
workers report identical finite losses (the gradient psum crossed
processes correctly).

Usage: python scripts/multihost_worker.py <port> <process_id> <nproc>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(f for f in flags.split()
                 if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

import numpy as np  # noqa: E402

from tvqaplus_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
    make_multihost_mesh,
    shard_batch,
)

init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

from tvqaplus_tpu.config import Config  # noqa: E402
from tvqaplus_tpu.data.batching import (  # noqa: E402
    StaticShapeSpec,
    collate_static,
)
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset  # noqa: E402
from tvqaplus_tpu.train.loop import Trainer  # noqa: E402

mesh = make_multihost_mesh(ctx=2)          # data=4 (2 per process), ctx=2
assert dict(mesh.shape) == {"data": 2 * nproc, "ctx": 2}

GLOBAL_BSZ = 8
local_bsz = GLOBAL_BSZ // nproc
cfg = Config(bsz=GLOBAL_BSZ, test_bsz=GLOBAL_BSZ, hsz=16, embedding_size=24,
             vfeat_size=12, max_qa_l=10, max_sub_l=8, max_num_img=4,
             img_buckets=[4], num_region=5, max_q_l=4, max_a_l=4,
             use_sup_att=True, add_local=True, synthetic_data=True,
             results_dir_base="results/multihost")
cfg.finalize(save=False)

trainer = Trainer(cfg, mesh=mesh)

# every host loads a DIFFERENT slice of the global batch (standard
# multihost data loading): process p takes examples [p*local : (p+1)*local)
ds = SyntheticTVQADataset(cfg, GLOBAL_BSZ, mode="train", seed=7)
spec = StaticShapeSpec.from_config(cfg, batch=local_bsz,
                                   max_img=cfg.max_num_img)
items = [ds[i] for i in range(pid * local_bsz, (pid + 1) * local_bsz)]
arrays, _ = collate_static(items, spec)
batch = shard_batch(mesh, arrays)

losses = []
for _ in range(2):
    trainer.state, metrics = trainer._train_step(
        trainer.state, batch, trainer.rng, use_hard_negatives=False)
    losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))
assert all(np.isfinite(v) for v in losses), losses
print(f"RESULT {pid} {losses[0]:.6f} {losses[1]:.6f}", flush=True)
