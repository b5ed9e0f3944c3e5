"""BiT (Big Transfer) ResNet-v2 in Flax.

The reference's alternative CNN embedder — HuggingFace ``google/bit-50``
``last_hidden_state`` (backend/descriptors.py:170-172). BiT is a
pre-activation ResNet-v2 with GroupNorm + Weight Standardization instead
of BatchNorm (no running stats -> stateless inference, which is also
friendlier to pjit data parallelism).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class StdConv(nn.Conv):
    """Conv with Weight Standardization (BiT's trick)."""

    def param(self, name, init_fn, *args):
        p = super().param(name, init_fn, *args)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) / jnp.sqrt(var + 1e-10)
        return p


class PreActBottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(StdConv, use_bias=False, dtype=self.dtype)
        gn = partial(nn.GroupNorm, num_groups=32, dtype=self.dtype)
        y = nn.relu(gn()(x))
        residual = x
        if x.shape[-1] != self.filters * 4 or self.strides != 1:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides))(y)
        y = conv(self.filters, (1, 1))(y)
        y = nn.relu(gn()(y))
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding=1)(y)
        y = nn.relu(gn()(y))
        y = conv(self.filters * 4, (1, 1))(y)
        return residual + y


class BiT(nn.Module):
    stage_sizes: Sequence[int]
    width_factor: int = 1
    num_classes: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # stateless (GroupNorm)
        w = 64 * self.width_factor
        x = StdConv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n_blocks in enumerate(self.stage_sizes):
            filters = w * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = PreActBottleneck(filters, strides=strides, dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype)(x))
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048*w)
        if self.num_classes:
            return nn.Dense(self.num_classes, dtype=self.dtype)(feats).astype(jnp.float32), feats
        return feats


BiT50 = partial(BiT, stage_sizes=(3, 4, 6, 3))
BiTTiny = partial(BiT, stage_sizes=(1, 1), width_factor=1)  # tests
