"""Weight-interop tests: flax <-> reference torch state_dict."""
import numpy as np
import jax
import pytest

from tvqaplus_tpu.interop.torch_weights import (
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from tvqaplus_tpu.models.stage import STAGE, ModelConfig

from tests.test_stage_model import tiny_batch, tiny_cfg


def _params(cfg):
    model = STAGE(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, tiny_batch(),
                           train=False)
    return model, variables["params"]


@pytest.mark.parametrize("kw", [dict(), dict(t_iter=2), dict(add_local=True)])
def test_round_trip_identity(kw):
    cfg = tiny_cfg(**kw)
    model, params = _params(cfg)
    sd = flax_to_torch_state_dict(params, cfg)
    back = torch_state_dict_to_flax(sd, cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(np.asarray, back))[0])
    # param trees match key-for-key, value-for-value
    assert len(flat_a) == len(flat_b)
    for key, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val), flat_b[key],
                                      err_msg=str(key))


def test_restored_params_same_forward():
    cfg = tiny_cfg(add_local=True)
    model, params = _params(cfg)
    batch = tiny_batch()
    out1 = model.apply({"params": params}, batch, train=False)
    back = torch_state_dict_to_flax(flax_to_torch_state_dict(params, cfg),
                                    cfg)
    out2 = model.apply({"params": back}, batch, train=False)
    np.testing.assert_allclose(np.array(out1["answer_scores"]),
                               np.array(out2["answer_scores"]), rtol=1e-6)


def test_load_reference_checkpoint_pth(tmp_path):
    """A torch-saved best_valid.pth round-trips into a working param tree."""
    import torch
    from tvqaplus_tpu.interop.torch_weights import load_reference_checkpoint
    cfg = tiny_cfg(add_local=True)
    model, params = _params(cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params, cfg).items()}
    pth = str(tmp_path / "best_valid.pth")
    torch.save(sd, pth)
    restored = load_reference_checkpoint(pth, cfg)
    batch = tiny_batch()
    out1 = model.apply({"params": params}, batch, train=False)
    out2 = model.apply({"params": restored}, batch, train=False)
    np.testing.assert_allclose(np.array(out1["answer_scores"]),
                               np.array(out2["answer_scores"]), rtol=1e-6)


def test_state_dict_loads_into_reference_model():
    """The exported dict must load strict (minus fixed posenc buffers) into
    the actual reference model."""
    import os
    if not os.path.isdir("/root/reference/model"):
        pytest.skip("reference checkout not available")
    import torch
    from tests.test_reference_parity import _load_reference_stage, DE, DV, H
    cfg = ModelConfig(hsz=H, embedding_size=DE, vfeat_size=DV,
                      add_local=True)
    model = STAGE(cfg)
    from tests.test_reference_parity import _np_batch
    variables = model.init({"params": jax.random.PRNGKey(0)}, _np_batch(),
                           train=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(variables["params"],
                                               cfg).items()}
    tmodel = _load_reference_stage(add_local=True)
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert all("position_encoding.pe" in k for k in missing), missing
    assert not unexpected, unexpected
