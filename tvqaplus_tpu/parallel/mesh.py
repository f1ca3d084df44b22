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
* ``model``: optional tensor parallelism for the stretch config (absent
  from 2-entry mesh shapes; size 1 changes nothing).  The LARGEST weight
  matrices — the BERT 768->300 bridge, the embedding table, anything
  >= 64k params (``_TP_MIN_PARAMS``) — shard their output axis; GSPMD
  partitions their matmuls/gathers and all-gathers at the consumers.
  At the reference's hsz 128 the remaining weights are 128-wide and stay
  replicated (a model split would drop their matmul tiles below the
  128x128 MXU tile — all collective, no compute win); larger-hsz stretch
  configs qualify automatically under the same rule.

Params are replicated by default (the model is ~0.55M params; sharding
them would be all overhead).  Batch arrays shard their leading dim on
``data`` and, where an Li axis exists (dim 1), on ``ctx``; batch arrays
never shard over ``model``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys that carry the sampled-image axis Li at dim 1
# (sub_tokens is NOT here: its dim 1 is the unique-token axis St, sharded
# over data only; the window gather redistributes onto the ctx-sharded Li.
# The att_entry_* keys carry flat entry axes, not Li — generic "data" rule)
_LI_KEYS = ("sub_bert", "sub_win_idx", "sub_mask", "vid", "vid_mask",
            "ts_mask")

# video-dedup uploads (config.video_dedup): leading dim is the
# unique-video slot axis U, not the batch — every data shard's ex_vid
# indexes the same global table, so the tables replicate (serving-only
# arrays; U is a few slots of bf16, replication is cheaper than the
# gather collective a U-shard would need)
_REPLICATED_KEYS = ("vid_u", "sub_tokens_u", "sub_bert_u")


def make_mesh(mesh_shape=(-1, 1), devices=None):
    """Create a ("data", "ctx") mesh — or ("data", "ctx", "model") from a
    3-entry shape.  A single -1 entry absorbs the remaining devices (like
    the reference's bsz x n_gpus scaling, config.py:187)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    axes = ("data", "ctx", "model")[: len(mesh_shape)]
    sizes = list(mesh_shape)
    assert len(sizes) in (2, 3), f"mesh shape {mesh_shape}"
    if -1 in sizes:
        assert sizes.count(-1) == 1, f"one -1 entry at most: {mesh_shape}"
        rest = int(np.prod([s for s in sizes if s != -1]))
        assert rest >= 1 and n % rest == 0
        sizes[sizes.index(-1)] = n // rest
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {sizes} > {n} devices"
    return Mesh(np.asarray(devices[:total]).reshape(sizes), axes)


def init_distributed(coordinator_address, num_processes, process_id,
                     local_device_ids=None):
    """Join a multi-host run (jax.distributed).  Call BEFORE any other JAX
    API touches a backend.  Idempotent per process."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)


def make_multihost_mesh(ctx=1):
    """("data", "ctx") mesh over ALL processes' devices.

    The data axis spans hosts — its gradient psum rides DCN, which is fine:
    DP all-reduces one ~0.55M-param gradient per step.  The ctx axis is
    kept WITHIN a host (contiguous local devices) so the Li-axis
    collectives of the span head ride ICI.  ``create_device_mesh`` orders
    devices host-major, so reshaping (n_data, ctx) with ctx dividing the
    per-host device count yields exactly that layout.
    """
    n = jax.device_count()
    n_local = jax.local_device_count()
    assert ctx >= 1 and n_local % ctx == 0, \
        f"ctx={ctx} must divide local device count {n_local}"
    devices = np.asarray(jax.devices()).reshape(n // ctx, ctx)
    return Mesh(devices, ("data", "ctx"))


def data_parallel_size(mesh):
    return mesh.shape["data"]


def replicated(mesh):
    return NamedSharding(mesh, P())


# minimum parameter count for a weight matrix to shard over "model":
# below this the matmul tiles fall under the MXU tile and the all-gather
# at the consumer costs more than the split compute saves.  At reference
# shapes only the BERT 768->300 bridge and the embedding table qualify.
_TP_MIN_PARAMS = 65536


def state_shardings(mesh, tree):
    """Per-leaf NamedSharding for a parameter/optimizer-state pytree.

    Without a "model" mesh axis (or with it at size 1) everything is
    replicated — the default DP layout.  With model > 1, array leaves with
    >= 2 dims, >= ``_TP_MIN_PARAMS`` elements and a last dim divisible by
    the axis size shard their output (last) axis over "model"; Adam's
    mu/nu mirror their parameters automatically (same shapes).  Everything
    else (biases, LN scales, step counters) stays replicated."""
    tp = mesh.shape.get("model", 1)

    def rule(x):
        shape = jnp.shape(x)
        if (tp > 1 and len(shape) >= 2 and int(np.prod(shape)) >= _TP_MIN_PARAMS
                and shape[-1] % tp == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def place_state(mesh, tree):
    """Place a host train-state pytree on the mesh under the TP-aware rule
    (== ``place_replicated`` when no model axis is present)."""
    sh = state_shardings(mesh, tree)
    if jax.process_count() > 1:
        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx: x[idx])
        return jax.tree_util.tree_map(put, tree, sh)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)


def place_replicated(mesh, tree):
    """Place a host pytree fully-replicated on the mesh.

    Single-process: plain device_put.  Multi-process: assembled via
    make_array_from_callback (device_put cannot target non-addressable
    devices); every process supplies the identical full value."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])
        return jax.tree_util.tree_map(put, tree)
    return jax.device_put(tree, sh)


def batch_shardings(mesh, batch, stacked=False):
    """Per-key NamedSharding for a batch dict.

    stacked=True: arrays carry a leading K (steps-per-dispatch) axis that is
    replicated; the batch axis moves to dim 1.
    """
    lead = (None,) if stacked else ()
    out = {}
    for k, v in batch.items():
        ndim_min = (3, 2) if stacked else (2, 1)
        if k in _REPLICATED_KEYS:
            spec = P()
        elif k in _LI_KEYS and np.ndim(v) >= ndim_min[0]:
            spec = P(*lead, "data", "ctx")
        elif np.ndim(v) >= ndim_min[1]:
            spec = P(*lead, "data")
        else:
            spec = P()
        out[k] = NamedSharding(mesh, spec)
    return out


def shard_batch(mesh, batch, stacked=False):
    """Host numpy batch -> device arrays laid out on the mesh.

    Multi-process: each process passes its LOCAL portion of the batch
    (standard multihost data loading — every host reads different
    examples); the global array is assembled process-locally without any
    cross-host data movement."""
    shardings = batch_shardings(mesh, batch, stacked=stacked)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
            shardings[k], np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
