"""Mesh / sharding layout tests (8 virtual CPU devices)."""
import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from tvqaplus_tpu.parallel.mesh import (
    batch_shardings,
    data_parallel_size,
    make_mesh,
    replicated,
    shard_batch,
)


def test_make_mesh_fills_devices():
    mesh = make_mesh((-1, 1))
    assert mesh.shape["data"] == 8 and mesh.shape["ctx"] == 1
    mesh = make_mesh((-1, 2))
    assert mesh.shape["data"] == 4 and mesh.shape["ctx"] == 2
    mesh = make_mesh((2, -1))
    assert mesh.shape["ctx"] == 4
    assert data_parallel_size(mesh) == 2


def test_batch_shardings_specs():
    mesh = make_mesh((4, 2))
    batch = {
        "vid": np.zeros((8, 4, 5, 6), np.float32),       # Li key
        "qas": np.zeros((8, 5, 7), np.int32),            # data only
        "target": np.zeros((8,), np.int32),
    }
    s = batch_shardings(mesh, batch)
    assert s["vid"].spec == P("data", "ctx")
    assert s["qas"].spec == P("data")
    assert s["target"].spec == P("data")


def test_batch_shardings_stacked():
    mesh = make_mesh((4, 2))
    batch = {
        "vid": np.zeros((3, 8, 4, 5, 6), np.float32),
        "target": np.zeros((3, 8), np.int32),
    }
    s = batch_shardings(mesh, batch, stacked=True)
    assert s["vid"].spec == P(None, "data", "ctx")
    assert s["target"].spec == P(None, "data")


def test_shard_batch_places_on_mesh():
    mesh = make_mesh((4, 2))
    batch = {"vid": np.arange(8 * 4 * 5 * 6, dtype=np.float32).reshape(
        8, 4, 5, 6)}
    placed = shard_batch(mesh, batch)
    arr = placed["vid"]
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), batch["vid"])


def test_replicated_sharding():
    mesh = make_mesh((8, 1))
    x = jax.device_put(np.ones(4), replicated(mesh))
    assert x.sharding.is_fully_replicated
