"""Weight interop with the reference PyTorch checkpoint format.

The reference saves ``model.state_dict()`` as ``best_valid.pth``
(main.py:112).  These converters map that format to/from the flax parameter
tree bit-exactly (layout transposes only), so

* a user of the reference can load their trained checkpoint into this
  framework (``load_reference_checkpoint``) and run TPU inference at the
  published ~72% val accuracy, and
* checkpoints trained here can be exported back for the reference tooling.

Verified end-to-end by ``tests/test_reference_parity.py`` (transplanted
weights give numerically identical forwards) and by round-trip tests.

Key layout differences:
  flax Dense kernel (in, out)        <-> torch Linear weight (out, in)
  flax depthwise (k, D)              <-> torch grouped Conv1d (D, 1, k)
  flax pointwise kernel (in, out)    <-> torch Conv1d (out, in, 1)
"""
from __future__ import annotations

import numpy as np


def _np(x):
    return np.asarray(x)


def _seq_ln(sd, prefix, idx):
    return {"scale": _np(sd[f"{prefix}.{idx}.weight"]),
            "bias": _np(sd[f"{prefix}.{idx}.bias"])}


def _map_bridge(params_out, sd_out, name, flax=None, sd=None):
    """Sequential(LN, Dropout, Linear, ReLU, LN) <-> MLPBridge."""
    if flax is not None:  # flax -> torch
        sd_out[f"{name}.0.weight"] = _np(flax["ln_in"]["scale"])
        sd_out[f"{name}.0.bias"] = _np(flax["ln_in"]["bias"])
        sd_out[f"{name}.2.weight"] = _np(flax["fc"]["kernel"]).T
        sd_out[f"{name}.2.bias"] = _np(flax["fc"]["bias"])
        sd_out[f"{name}.4.weight"] = _np(flax["ln_out"]["scale"])
        sd_out[f"{name}.4.bias"] = _np(flax["ln_out"]["bias"])
    else:  # torch -> flax
        return {
            "ln_in": _seq_ln(sd, name, 0),
            "fc": {"kernel": _np(sd[f"{name}.2.weight"]).T,
                   "bias": _np(sd[f"{name}.2.bias"])},
            "ln_out": _seq_ln(sd, name, 4),
        }


def _map_dsconv(flax=None, sd=None, prefix=None):
    if flax is not None:
        return {
            f"{prefix}.depthwise_conv.weight":
                _np(flax["depthwise"]).T[:, None, :],
            f"{prefix}.depthwise_conv.bias": _np(flax["depthwise_bias"]),
            f"{prefix}.pointwise_conv.weight":
                _np(flax["pointwise"]["kernel"]).T[:, :, None],
            f"{prefix}.pointwise_conv.bias": _np(flax["pointwise"]["bias"]),
        }
    return {
        "depthwise": _np(sd[f"{prefix}.depthwise_conv.weight"])[:, 0, :].T,
        "depthwise_bias": _np(sd[f"{prefix}.depthwise_conv.bias"]),
        "pointwise": {
            "kernel": _np(sd[f"{prefix}.pointwise_conv.weight"])[:, :, 0].T,
            "bias": _np(sd[f"{prefix}.pointwise_conv.bias"])},
    }


def _map_encoder(name, flax=None, sd=None, n_blocks=1, n_conv=2):
    out_sd, out_flax = {}, {}
    for b in range(n_blocks):
        tb = f"{name}.stacked_encoderBlocks.{b}"
        if flax is not None:
            blk = flax[f"block_{b}"]
            for i in range(n_conv):
                out_sd[f"{tb}.layer_norm.{i}.weight"] = \
                    _np(blk[f"ln_{i}"]["scale"])
                out_sd[f"{tb}.layer_norm.{i}.bias"] = \
                    _np(blk[f"ln_{i}"]["bias"])
                out_sd.update(_map_dsconv(flax=blk[f"conv_{i}"],
                                          prefix=f"{tb}.conv.{i}"))
            out_sd[f"{tb}.final_layer_norm.weight"] = \
                _np(blk["final_ln"]["scale"])
            out_sd[f"{tb}.final_layer_norm.bias"] = \
                _np(blk["final_ln"]["bias"])
        else:
            blk = {}
            for i in range(n_conv):
                blk[f"ln_{i}"] = _seq_ln(sd, f"{tb}.layer_norm", i)
                blk[f"conv_{i}"] = _map_dsconv(sd=sd, prefix=f"{tb}.conv.{i}")
            blk["final_ln"] = {
                "scale": _np(sd[f"{tb}.final_layer_norm.weight"]),
                "bias": _np(sd[f"{tb}.final_layer_norm.bias"])}
            out_flax[f"block_{b}"] = blk
    return out_sd if flax is not None else out_flax


def _map_linear_wrapper(name, flax=None, sd=None):
    """LinearWrapper: conv = Sequential(LN, Dropout, Linear)."""
    if flax is not None:
        return {
            f"{name}.conv.0.weight": _np(flax["ln"]["scale"]),
            f"{name}.conv.0.bias": _np(flax["ln"]["bias"]),
            f"{name}.conv.2.weight": _np(flax["fc"]["kernel"]).T,
            f"{name}.conv.2.bias": _np(flax["fc"]["bias"]),
        }
    return {"ln": _seq_ln(sd, f"{name}.conv", 0),
            "fc": {"kernel": _np(sd[f"{name}.conv.2.weight"]).T,
                   "bias": _np(sd[f"{name}.conv.2.bias"])}}


def _map_conv_linear(name, flax=None, sd=None):
    """ConvLinear: conv = Sequential(LN, Dropout, DepthwiseSeparableConv)."""
    if flax is not None:
        out = {
            f"{name}.conv.0.weight": _np(flax["ln"]["scale"]),
            f"{name}.conv.0.bias": _np(flax["ln"]["bias"]),
        }
        out.update(_map_dsconv(flax=flax["conv"], prefix=f"{name}.conv.2"))
        return out
    return {"ln": _seq_ln(sd, f"{name}.conv", 0),
            "conv": _map_dsconv(sd=sd, prefix=f"{name}.conv.2")}


def flax_to_torch_state_dict(params, cfg):
    """Flax param tree -> reference state_dict (numpy values)."""
    sd = {}
    _map_bridge(None, sd, "bert_word_encoding_fc",
                flax=params["bert_word_encoding_fc"])
    if cfg.vfeat_flag:
        _map_bridge(None, sd, "vid_fc", flax=params["vid_fc"])
    if cfg.vfeat_flag and cfg.sub_flag:
        _map_bridge(None, sd, "concat_fc", flax=params["concat_fc"])
    ie = params["input_embedding"]
    sd["input_embedding.1.weight"] = _np(ie["fc"]["kernel"]).T
    sd["input_embedding.1.bias"] = _np(ie["fc"]["bias"])
    sd["input_embedding.3.weight"] = _np(ie["ln_out"]["scale"])
    sd["input_embedding.3.bias"] = _np(ie["ln_out"]["bias"])
    sd.update(_map_encoder("input_encoder", flax=params["input_encoder"],
                           n_blocks=cfg.input_encoder_n_blocks,
                           n_conv=cfg.input_encoder_n_conv))
    sd.update(_map_encoder("cls_encoder", flax=params["cls_encoder"],
                           n_blocks=cfg.cls_encoder_n_blocks,
                           n_conv=cfg.cls_encoder_n_conv))
    c2q = params["c2q_down_projection"]
    sd["c2q_down_projection.0.weight"] = _np(c2q["ln_scale"])
    sd["c2q_down_projection.0.bias"] = _np(c2q["ln_bias"])
    sd["c2q_down_projection.2.weight"] = _np(c2q["kernel"]).T
    sd["c2q_down_projection.2.bias"] = _np(c2q["bias"])
    sd.update(_map_linear_wrapper("cls_projection_layers.0",
                                  flax=params["cls_projection_layers_0"]))
    for i in range(1, cfg.t_iter + 1):
        sd.update(_map_conv_linear(f"cls_projection_layers.{i}",
                                   flax=params[f"cls_projection_layers_{i}"]))
    for i in range(cfg.t_iter + 1):
        sd.update(_map_linear_wrapper(
            f"temporal_scoring_st_layers.{i}",
            flax=params[f"temporal_scoring_st_layers_{i}"]))
        sd.update(_map_linear_wrapper(
            f"temporal_scoring_ed_layers.{i}",
            flax=params[f"temporal_scoring_ed_layers_{i}"]))
    sd.update(_map_linear_wrapper("classifier", flax=params["classifier"]))
    return sd


def torch_state_dict_to_flax(sd, cfg):
    """Reference state_dict (tensor/ndarray values) -> flax param tree."""
    sd = {k: _np(v) for k, v in sd.items()}
    params = {}
    params["bert_word_encoding_fc"] = _map_bridge(
        {}, None, "bert_word_encoding_fc", sd=sd)
    if cfg.vfeat_flag:
        params["vid_fc"] = _map_bridge({}, None, "vid_fc", sd=sd)
    if cfg.vfeat_flag and cfg.sub_flag:
        params["concat_fc"] = _map_bridge({}, None, "concat_fc", sd=sd)
    params["input_embedding"] = {
        "fc": {"kernel": _np(sd["input_embedding.1.weight"]).T,
               "bias": _np(sd["input_embedding.1.bias"])},
        "ln_out": {"scale": _np(sd["input_embedding.3.weight"]),
                   "bias": _np(sd["input_embedding.3.bias"])},
    }
    params["input_encoder"] = _map_encoder(
        "input_encoder", sd=sd, n_blocks=cfg.input_encoder_n_blocks,
        n_conv=cfg.input_encoder_n_conv)
    params["cls_encoder"] = _map_encoder(
        "cls_encoder", sd=sd, n_blocks=cfg.cls_encoder_n_blocks,
        n_conv=cfg.cls_encoder_n_conv)
    params["c2q_down_projection"] = {
        "ln_scale": _np(sd["c2q_down_projection.0.weight"]),
        "ln_bias": _np(sd["c2q_down_projection.0.bias"]),
        "kernel": _np(sd["c2q_down_projection.2.weight"]).T,
        "bias": _np(sd["c2q_down_projection.2.bias"]),
    }
    params["cls_projection_layers_0"] = _map_linear_wrapper(
        "cls_projection_layers.0", sd=sd)
    for i in range(1, cfg.t_iter + 1):
        params[f"cls_projection_layers_{i}"] = _map_conv_linear(
            f"cls_projection_layers.{i}", sd=sd)
    for i in range(cfg.t_iter + 1):
        params[f"temporal_scoring_st_layers_{i}"] = _map_linear_wrapper(
            f"temporal_scoring_st_layers.{i}", sd=sd)
        params[f"temporal_scoring_ed_layers_{i}"] = _map_linear_wrapper(
            f"temporal_scoring_ed_layers.{i}", sd=sd)
    params["classifier"] = _map_linear_wrapper("classifier", sd=sd)
    return params


def load_reference_checkpoint(path, cfg):
    """Load a reference ``best_valid.pth`` into a flax param tree
    (requires torch for unpickling)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return torch_state_dict_to_flax(
        {k: v.numpy() for k, v in sd.items()}, cfg)
