"""Convert torchvision-style ResNet ``.pth`` state dicts to Flax params.

Equivalent of the reference's pretrained-backbone init with name mapping
(reference: load_pretrained in libs/nets/resnet.py / train.py; SURVEY.md
§5.4). The reference fine-tunes from torchvision ResNet weights; this
converter maps a torch ``state_dict`` (either a real ``torch.Tensor`` dict
or plain numpy arrays with the same keys) onto our ``ResNet`` param pytree.

Key mapping (torchvision -> flax path under "backbone"):
  conv1.weight                  -> conv1/kernel (OIHW -> HWIO)
  bn1.{weight,bias,running_*}   -> bn1/{...}
  layerL.B.convN.weight         -> layer{L}_{B}/convN/kernel
  layerL.B.bnN.*                -> layer{L}_{B}/bnN/*
  layerL.B.downsample.0.weight  -> layer{L}_{B}/downsample_conv/kernel
  layerL.B.downsample.1.*       -> layer{L}_{B}/downsample_bn/*
"""

from __future__ import annotations

import re

import numpy as np
from flax import traverse_util

_BN_KEYS = {"weight", "bias", "running_mean", "running_var"}


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def torch_key_to_flax_path(key: str) -> tuple | None:
    """Returns the flax param path tuple, or None for skipped keys (fc,
    num_batches_tracked)."""
    if key.startswith("fc.") or key.endswith("num_batches_tracked"):
        return None
    m = re.fullmatch(r"conv1\.weight", key)
    if m:
        return ("conv1", "kernel")
    m = re.fullmatch(r"bn1\.(\w+)", key)
    if m and m.group(1) in _BN_KEYS:
        return ("bn1", m.group(1))
    m = re.fullmatch(r"layer(\d)\.(\d+)\.conv(\d)\.weight", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}", "kernel")
    m = re.fullmatch(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)", key)
    if m and m.group(4) in _BN_KEYS:
        return (f"layer{m.group(1)}_{m.group(2)}", f"bn{m.group(3)}", m.group(4))
    m = re.fullmatch(r"layer(\d)\.(\d+)\.downsample\.0\.weight", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "downsample_conv", "kernel")
    m = re.fullmatch(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)", key)
    if m and m.group(3) in _BN_KEYS:
        return (f"layer{m.group(1)}_{m.group(2)}", "downsample_bn", m.group(3))
    raise KeyError(f"unrecognized torchvision resnet key: {key}")


def convert_resnet_state_dict(state_dict: dict) -> dict:
    """torch state_dict -> flat {flax path tuple: np array} for ResNet."""
    out = {}
    for key, value in state_dict.items():
        path = torch_key_to_flax_path(key)
        if path is None:
            continue
        arr = _to_numpy(value)
        if path[-1] == "kernel":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[path] = arr.astype(np.float32)
    return out


def load_resnet_backbone(params: dict, state_dict: dict,
                         backbone_name: str = "backbone") -> dict:
    """Returns a copy of ``params`` (full variables dict) with the backbone
    subtree replaced by converted torch weights. Shapes are validated."""
    converted = convert_resnet_state_dict(state_dict)
    flat = dict(traverse_util.flatten_dict(params))
    n_loaded = 0
    for path, arr in converted.items():
        full = ("params", backbone_name) + path
        if full not in flat:
            raise KeyError(f"param {full} not found in model")
        if flat[full].shape != arr.shape:
            raise ValueError(
                f"shape mismatch at {full}: model {flat[full].shape} "
                f"vs torch {arr.shape}"
            )
        flat[full] = arr
        n_loaded += 1
    if n_loaded == 0:
        raise ValueError("no weights loaded")
    return traverse_util.unflatten_dict(flat)


def maybe_load_pretrained(cfg, params: dict) -> dict:
    """Driver entry point: if ``cfg.model.weights`` names a torch ``.pth``
    (or numpy ``.npz``) ResNet state dict, return ``params`` with the
    backbone subtree replaced; otherwise return ``params`` unchanged.
    Wired into train.py / eval.py (reference: the unconditional
    load_pretrained fine-tune init in libs/nets/resnet.py + train.py)."""
    path = cfg.model.get("weights", "")
    if not path:
        return params
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        sd = load_pth(path)
    return load_resnet_backbone(params, sd)


def load_pth(path: str) -> dict:
    """Load a .pth/.pt state dict (handles 'state_dict'/'model' wrappers)."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if isinstance(d, dict) and wrapper in d and isinstance(d[wrapper], dict):
            d = d[wrapper]
    return {k.replace("module.", ""): v for k, v in d.items()}
