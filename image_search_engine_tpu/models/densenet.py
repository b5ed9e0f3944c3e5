"""DenseNet (Huang et al.) in Flax.

The reference's siamese backbone in both frameworks — Keras DenseNet121
(backend/siamese/siamese_tf/model.py:23-45) and torchvision densenet121
(backend/siamese/siamese_pt/model.py:9-21). DenseNet-121 = growth 32,
blocks (6, 12, 24, 16), 1024-D final features.

Dense connectivity is concatenation-heavy; on TPU the concats are free
(layout only) and the 1x1/3x3 convs fuse with BN+ReLU under XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        y = nn.relu(norm()(x))
        y = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        )
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_sizes: Sequence[int]
    growth_rate: int = 32
    num_classes: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(2 * self.growth_rate, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        features = 2 * self.growth_rate
        for i, n_layers in enumerate(self.block_sizes):
            for _ in range(n_layers):
                x = DenseLayer(self.growth_rate, dtype=self.dtype)(x, train=train)
                features += self.growth_rate
            if i != len(self.block_sizes) - 1:
                features //= 2
                x = Transition(features, dtype=self.dtype)(x, train=train)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        )
        x = jnp.mean(x, axis=(1, 2))  # (B, 1024) for DenseNet-121
        feats = x.astype(jnp.float32)
        if self.num_classes:
            return nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32), feats
        return feats


DenseNet121 = partial(DenseNet, block_sizes=(6, 12, 24, 16))
DenseNetTiny = partial(DenseNet, block_sizes=(2, 2), growth_rate=8)  # tests
