"""Siamese embedding model: DenseNet-121 backbone + projection head.

The reference builds this twice — Keras (siamese_tf/model.py:23-63:
DenseNet121 frozen by default + Dense 1024->512->256->128 head with
dropout+BN, wrapped as a 3-input shared-weight net) and Torch
(siamese_pt/model.py:9-21: densenet121 with classifier -> Linear(128)).
One Flax module covers both: shared weights are automatic (one ``apply``
vmapped over the tuple), the backbone-freeze switch becomes a
``stop_gradient`` boundary, and the head width/depth is configurable.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_search_engine_tpu.models.densenet import DenseNet, DenseNet121, DenseNetTiny


class EmbeddingNet(nn.Module):
    """backbone -> (optional stop_gradient) -> MLP head -> D-dim embedding."""

    embedding_dim: int = 128  # reference siamese/config.py:95
    head_widths: Sequence[int] = (1024, 512, 256)  # siamese_tf/model.py:31-43
    dropout_rate: float = 0.3
    freeze_backbone: bool = True  # reference default (siamese/config.py:110)
    backbone: str = "densenet121"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = {"densenet121": DenseNet121, "densenet-tiny": DenseNetTiny}[
            self.backbone
        ](dtype=self.dtype)
        feats = backbone(x, train=train and not self.freeze_backbone)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        y = feats
        for w in self.head_widths:
            y = nn.Dense(w, dtype=self.dtype)(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(y)
        y = nn.Dense(self.embedding_dim, dtype=self.dtype)(y)
        return y.astype(jnp.float32)


def apply_siamese(model: EmbeddingNet, variables, triple, train: bool = False,
                  rngs=None, mutable=False):
    """Shared-weight application over (anchor, positive[, negative]) — the
    3-head wrapper of siamese_tf/model.py:48-63, done the JAX way: one
    parameter set, one batched forward over the stacked inputs."""
    stacked = jnp.concatenate(triple, axis=0)
    out = model.apply(variables, stacked, train=train, rngs=rngs, mutable=mutable)
    if mutable:
        emb, updates = out
        return tuple(jnp.split(emb, len(triple), axis=0)), updates
    return tuple(jnp.split(out, len(triple), axis=0))
