"""Torch -> Flax weight import for the CNN backbones.

The reference's DNN path embeds with torchvision
``resnet50(weights=IMAGENET1K_V2)`` truncated at the flatten node
(backend/descriptors.py:161-168) or HuggingFace ``google/bit-50``
(descriptors.py:170-172); the siamese trainers start from pretrained
densenet121. This module converts those checkpoints (torchvision
ResNet/DenseNet state_dicts, HF BitModel state_dicts) into this
framework's Flax variables, so a user carries the exact pretrained
backbone over:

    python -m image_search_engine_tpu.indexer --method dnn \\
        --torch-weights resnet50-imagenet.pth ...

Architecture parity is exact: both are ResNet v1.5 (stride on the 3x3),
with torch's (1,1) padding on the 3x3 convs and -inf-padded max pool, so
converted weights reproduce torch outputs to float tolerance
(tests/test_torch_import.py checks forward parity against a minimal torch
twin — torchvision itself isn't needed, only the state_dict layout).

Layout transforms: conv (O, I, H, W) -> (H, W, I, O); linear (O, I) ->
(I, O); BatchNorm weight/bias -> scale/bias and running_mean/var ->
batch_stats.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np

# torchvision stage layouts, keyed by the embedder registry names
RESNET_STAGES = {
    "resnet50": (3, 4, 6, 3),
    "resnet-tiny": (1, 1, 1, 1),
}
DENSENET_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet-tiny": (2, 2),
}
BIT_STAGES = {
    "bit-50": (3, 4, 6, 3),
    "bit-tiny": (1, 1),
}


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


class _Tracked:
    """state_dict view that records consumed keys, so converters can
    reject checkpoints with unconsumed structure (a shape-compatible but
    deeper model, e.g. resnet101 passed as resnet50, must not silently
    convert to a franken-backbone)."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = sd
        self.used: set = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k):
        return k in self.sd

    def check_consumed(self, head_keys: Sequence[str]) -> None:
        ignorable = {k for k in self.sd
                     if k.endswith("num_batches_tracked") or k in head_keys}
        leftover = sorted(set(self.sd) - self.used - ignorable)
        if leftover:
            raise ValueError(
                f"checkpoint has {len(leftover)} keys the target architecture "
                f"does not consume (wrong model variant?): {leftover[:6]}..."
            )


def _conv(sd, key: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[key + ".weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, key: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}
    stats = {"mean": _np(sd[key + ".running_mean"]), "var": _np(sd[key + ".running_var"])}
    return params, stats


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    num_classes: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision ResNet state_dict -> (params, batch_stats) for
    ``models.resnet.ResNet(stage_sizes=...)``.

    Handles any bottleneck stage layout (conv1/bn1, layer{i}.{j}.conv{1..3}
    + optional downsample, fc). ``num_classes > 0`` also converts the fc
    head into the Flax ``Dense_0``.
    """
    sd = _Tracked(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["Conv_0"] = _conv(sd, "conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn1")

    b = 0
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"Bottleneck_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(3):
                bp[f"Conv_{c}"] = _conv(sd, f"{t}.conv{c + 1}")
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = _bn(sd, f"{t}.bn{c + 1}")
            if f"{t}.downsample.0.weight" in sd:
                bp["Conv_3"] = _conv(sd, f"{t}.downsample.0")
                bp["BatchNorm_3"], bs["BatchNorm_3"] = _bn(sd, f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
            b += 1

    if num_classes:
        params["Dense_0"] = {
            "kernel": _np(sd["fc.weight"]).T,
            "bias": _np(sd["fc.bias"]),
        }
    sd.check_consumed(["fc.weight", "fc.bias"])
    return params, stats


def convert_torchvision_densenet(
    state_dict: Mapping[str, Any],
    block_sizes: Sequence[int] = (6, 12, 24, 16),
    num_classes: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision DenseNet state_dict -> (params, batch_stats) for
    ``models.densenet.DenseNet(block_sizes=...)``.

    torchvision layout: features.conv0/norm0, denseblock{b}.denselayer{l}
    (norm1/conv1/norm2/conv2), transition{t} (norm/conv), norm5,
    classifier. The siamese backbone of the reference is pretrained
    torchvision densenet121 (backend/siamese/siamese_pt/model.py:9-21).
    """
    sd = _Tracked(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["Conv_0"] = _conv(sd, "features.conv0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "features.norm0")

    dl = 0  # global DenseLayer index (Flax names them across all blocks)
    for b, n_layers in enumerate(block_sizes):
        for l in range(n_layers):
            t = f"features.denseblock{b + 1}.denselayer{l + 1}"
            f = f"DenseLayer_{dl}"
            lp: Dict[str, Any] = {}
            ls: Dict[str, Any] = {}
            lp["BatchNorm_0"], ls["BatchNorm_0"] = _bn(sd, f"{t}.norm1")
            lp["Conv_0"] = _conv(sd, f"{t}.conv1")
            lp["BatchNorm_1"], ls["BatchNorm_1"] = _bn(sd, f"{t}.norm2")
            lp["Conv_1"] = _conv(sd, f"{t}.conv2")
            params[f] = lp
            stats[f] = ls
            dl += 1
        if b != len(block_sizes) - 1:
            t = f"features.transition{b + 1}"
            f = f"Transition_{b}"
            tp: Dict[str, Any] = {}
            ts: Dict[str, Any] = {}
            tp["BatchNorm_0"], ts["BatchNorm_0"] = _bn(sd, f"{t}.norm")
            tp["Conv_0"] = _conv(sd, f"{t}.conv")
            params[f] = tp
            stats[f] = ts

    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "features.norm5")
    if num_classes:
        params["Dense_0"] = {
            "kernel": _np(sd["classifier.weight"]).T,
            "bias": _np(sd["classifier.bias"]),
        }
    sd.check_consumed(["classifier.weight", "classifier.bias"])
    return params, stats


def _gn(sd, key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}


def convert_hf_bit(
    state_dict: Mapping[str, Any],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
) -> Tuple[Dict[str, Any], None]:
    """HuggingFace ``BitModel`` (preactivation, e.g. ``google/bit-50``)
    state_dict -> params for ``models.bit.BiT(stage_sizes=...)``.

    HF layout: embedder.convolution, encoder.stages.{i}.layers.{j} with
    norm1/conv1/norm2/conv2/norm3/conv3 (+ downsample.conv on each
    stage's first layer), top-level norm. Raw (unstandardized) kernels
    transfer directly — both sides standardize at forward time. BiT has
    no BatchNorm, so batch_stats is None (stateless inference).
    Accepts both bare BitModel keys and BitForImageClassification's
    ``bit.``-prefixed ones.
    """
    if any(k.startswith("bit.") for k in state_dict):
        state_dict = {k[len("bit."):]: v for k, v in state_dict.items()
                      if k.startswith("bit.")}
    sd = _Tracked(state_dict)
    params: Dict[str, Any] = {}

    params["StdConv_0"] = _conv(sd, "embedder.convolution")

    b = 0
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"encoder.stages.{i}.layers.{j}"
            bp: Dict[str, Any] = {}
            has_down = f"{t}.downsample.conv.weight" in sd
            c = 0
            if has_down:
                bp[f"StdConv_{c}"] = _conv(sd, f"{t}.downsample.conv")
                c += 1
            bp["GroupNorm_0"] = _gn(sd, f"{t}.norm1")
            bp[f"StdConv_{c}"] = _conv(sd, f"{t}.conv1")
            bp["GroupNorm_1"] = _gn(sd, f"{t}.norm2")
            bp[f"StdConv_{c + 1}"] = _conv(sd, f"{t}.conv2")
            bp["GroupNorm_2"] = _gn(sd, f"{t}.norm3")
            bp[f"StdConv_{c + 2}"] = _conv(sd, f"{t}.conv3")
            params[f"PreActBottleneck_{b}"] = bp
            b += 1

    params["GroupNorm_0"] = _gn(sd, "norm")
    sd.check_consumed(["pooler.weight", "pooler.bias"])
    return params, None


def load_torch_state_dict(path: str | Path) -> Dict[str, Any]:
    """Load a .pth/.pt checkpoint on CPU and unwrap common nestings
    ({'state_dict': ...} / {'model': ...} / bare state_dict)."""
    import torch

    blob = torch.load(str(path), map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(blob, dict) and key in blob and isinstance(blob[key], dict):
            blob = blob[key]
    # strip DataParallel-style "module." prefixes
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in blob.items()}


def variables_from_torch(
    path: str | Path, model_name: str = "resnet50"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Checkpoint file -> (params, batch_stats) for the named backbone."""
    sd = load_torch_state_dict(path)
    if model_name in RESNET_STAGES:
        return convert_torchvision_resnet(sd, RESNET_STAGES[model_name])
    if model_name in DENSENET_BLOCKS:
        return convert_torchvision_densenet(sd, DENSENET_BLOCKS[model_name])
    if model_name in BIT_STAGES:
        return convert_hf_bit(sd, BIT_STAGES[model_name])
    raise ValueError(
        f"torch import supports "
        f"{sorted(RESNET_STAGES) + sorted(DENSENET_BLOCKS) + sorted(BIT_STAGES)}, "
        f"got {model_name!r}"
    )

