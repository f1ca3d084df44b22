"""Device mesh + sharding layout for the STAGE train/eval step.

The reference's only parallelism is single-process DataParallel
scatter/gather (main.py:204-206).  Here parallelism is a 2-axis
``jax.sharding.Mesh``:

* ``data``: batch-dimension sharding — jit's SPMD partitioner turns the
  loss/grad sums into `psum` collectives over ICI (the DP all-reduce);
* ``ctx``: optional context parallelism over the sampled-image axis Li.
  STAGE's structured attention never mixes frames (SURVEY.md §5), so the
  per-frame encode/attend pipeline needs zero communication; only the
  Li-softmax of the span head and the Li max-pools reduce across shards,
  which XLA lowers to a handful of small collectives.

Params are replicated (the model is ~0.55M params; sharding them would be
all overhead).  Batch arrays shard their leading dim on ``data`` and, where
an Li axis exists (dim 1), on ``ctx``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys that carry the sampled-image axis Li at dim 1
_LI_KEYS = ("sub_bert", "sub_mask", "vid", "vid_mask", "ts_mask",
            "att_labels", "att_defined")


def make_mesh(mesh_shape=(-1, 1), devices=None):
    """Create a ("data", "ctx") mesh.  A -1 entry absorbs the remaining
    devices (like the reference's bsz x n_gpus scaling, config.py:187)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, ctx = mesh_shape
    if data == -1:
        assert ctx >= 1 and n % ctx == 0
        data = n // ctx
    if ctx == -1:
        assert data >= 1 and n % data == 0
        ctx = n // data
    assert data * ctx <= n, f"mesh {data}x{ctx} > {n} devices"
    mesh_devices = np.asarray(devices[: data * ctx]).reshape(data, ctx)
    return Mesh(mesh_devices, ("data", "ctx"))


def data_parallel_size(mesh):
    return mesh.shape["data"]


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_shardings(mesh, batch, stacked=False):
    """Per-key NamedSharding for a batch dict.

    stacked=True: arrays carry a leading K (steps-per-dispatch) axis that is
    replicated; the batch axis moves to dim 1.
    """
    lead = (None,) if stacked else ()
    out = {}
    for k, v in batch.items():
        ndim_min = (3, 2) if stacked else (2, 1)
        if k in _LI_KEYS and np.ndim(v) >= ndim_min[0]:
            spec = P(*lead, "data", "ctx")
        elif np.ndim(v) >= ndim_min[1]:
            spec = P(*lead, "data")
        else:
            spec = P()
        out[k] = NamedSharding(mesh, spec)
    return out


def shard_batch(mesh, batch, stacked=False):
    """Host numpy batch -> device arrays laid out on the mesh."""
    shardings = batch_shardings(mesh, batch, stacked=stacked)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
