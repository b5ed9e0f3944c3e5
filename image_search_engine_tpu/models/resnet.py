"""ResNet-v1.5 in Flax.

The global-feature embedder of the reference's DNN path — there a
torchvision ``resnet50(IMAGENET1K_V2)`` truncated at the ``flatten`` node
for 2048-D embeddings (backend/descriptors.py:161-168). Here the backbone
is a first-party Flax module whose ``features`` output is that same
post-GAP 2048-D vector; the classification head is optional.

TPU notes: NHWC layout, bf16-friendly (pass ``dtype=jnp.bfloat16``), BN in
inference mode uses stored running stats; conv+BN+ReLU chains fuse under
XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        residual = x
        y = conv(self.filters, (1, 1))(x)
        y = nn.relu(norm()(y))
        # v1.5: stride lives on the 3x3 conv. Explicit (1,1) padding matches
        # torchvision exactly; SAME would pad (0,1) at stride 2, which
        # shifts the sampling grid and breaks imported-weight parity.
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)])(y)
        y = nn.relu(norm()(y))
        y = conv(self.filters * 4, (1, 1))(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides))(
                residual
            )
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 0  # 0 -> no classifier head, return embeddings
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(filters, strides=strides, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        feats = x.astype(jnp.float32)
        if self.num_classes:
            logits = nn.Dense(self.num_classes, dtype=self.dtype)(x)
            return logits.astype(jnp.float32), feats
        return feats


ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3))
ResNet18Thin = partial(ResNet, stage_sizes=(1, 1, 1, 1))  # tiny config for tests
