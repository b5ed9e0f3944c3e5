"""BiT (Big Transfer) ResNet-v2 in Flax.

The reference's alternative CNN embedder — HuggingFace ``google/bit-50``
(backend/descriptors.py:170-172). BiT is a pre-activation ResNet-v2 with
GroupNorm + Weight Standardization instead of BatchNorm (no running stats
-> stateless inference, which is also friendlier to pjit data
parallelism).

Geometry matches HF ``BitModel(layer_type="preactivation",
global_padding="SAME")`` exactly so converted ``google/bit-50`` weights
reproduce HF outputs to float tolerance (tests/test_torch_import.py):

  * every conv and the stem max-pool use TF-style SAME padding (XLA's
    "SAME" is TF SAME — asymmetric for stride 2), matching HF's
    DynamicPad2d;
  * weight standardization runs at forward time with eps=1e-8 over the
    per-output-channel (H, W, I) axes (HF WeightStandardizedConv2d);
  * GroupNorm eps=1e-5 (HF BitGroupNormActivation), groups from config;
  * the shortcut downsample consumes the PRE-ACTIVATED input (norm+relu
    applied), as in HF's BitPreActivationBottleneckLayer;
  * a final GroupNorm+relu precedes pooling (HF BitModel.norm).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class StdConv(nn.Conv):
    """Conv with Weight Standardization (BiT's trick; HF eps=1e-8)."""

    def param(self, name, init_fn, *args):
        p = super().param(name, init_fn, *args)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) / jnp.sqrt(var + 1e-8)
        return p


class PreActBottleneck(nn.Module):
    filters: int
    strides: int = 1
    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(StdConv, use_bias=False, padding="SAME", dtype=self.dtype)
        gn = partial(nn.GroupNorm, num_groups=self.num_groups, epsilon=1e-5,
                     dtype=self.dtype)
        y = nn.relu(gn()(x))
        residual = x
        if x.shape[-1] != self.filters * 4 or self.strides != 1:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides))(y)
        y = conv(self.filters, (1, 1))(y)
        y = nn.relu(gn()(y))
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides))(y)
        y = nn.relu(gn()(y))
        y = conv(self.filters * 4, (1, 1))(y)
        return residual + y


def _max_pool_same_zeropad(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """TF-SAME max pool that pads ZEROS, not -inf: HF's BitMaxPool2d runs
    DynamicPad2d(value=0) then a VALID pool, so border maxima over
    negative activations clamp at 0 — XLA's "SAME" pools over -inf pads
    and differs there."""
    pads = []
    for dim in (1, 2):
        size = x.shape[dim]
        total = max((-(-size // s) - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    return nn.max_pool(x, (k, k), strides=(s, s), padding="VALID")


class BiT(nn.Module):
    stage_sizes: Sequence[int]
    width_factor: int = 1
    num_classes: int = 0
    num_groups: int = 32
    pooling: str = "avg"  # "avg" (HF pooler) | "flatten" (reference's
    # last_hidden_state.flatten(), backend/descriptors.py:186-189)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # stateless (GroupNorm)
        w = 64 * self.width_factor
        x = StdConv(w, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = _max_pool_same_zeropad(x, 3, 2)
        for i, n_blocks in enumerate(self.stage_sizes):
            filters = w * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = PreActBottleneck(filters, strides=strides,
                                     num_groups=self.num_groups,
                                     dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                                 dtype=self.dtype)(x))
        if self.pooling == "flatten":
            # the reference flattens the full (H, W, C) last_hidden_state
            # as the descriptor; transpose to channel-first so flattened
            # order matches torch's (C, H, W).flatten()
            feats = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
            feats = feats.astype(jnp.float32)
        else:
            feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, C)
        if self.num_classes:
            return nn.Dense(self.num_classes, dtype=self.dtype)(feats).astype(jnp.float32), feats
        return feats


BiT50 = partial(BiT, stage_sizes=(3, 4, 6, 3))
BiTTiny = partial(BiT, stage_sizes=(1, 1), width_factor=1)  # tests
