"""Batched CNN embedding extractor.

The reference's CNNDescriptor runs one image at a time through torchvision
ResNet-50 / HF BiT with a host loop (backend/descriptors.py:181-204,
``describe`` called per image, batch size 1 — flagged in SURVEY.md §3.2).
Here embedding extraction is a fixed-batch jitted program: preprocessing
(resize + ImageNet normalize) fuses with the backbone forward, batches are
padded to a static size (one compilation), and with a mesh the batch is
sharded over the data axis so inference data-parallelizes across ICI.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_engine_tpu.models.bit import BiT50, BiTTiny
from image_search_engine_tpu.models.densenet import DenseNet121, DenseNetTiny
from image_search_engine_tpu.models.resnet import ResNet18Thin, ResNet50
from image_search_engine_tpu.ops.image_ops import preprocess_for_cnn, to_unit_f32

# name -> (ctor, embedding dim, input normalization). BiT uses HF
# BitImageProcessor's (x-0.5)/0.5; torchvision backbones use ImageNet
# stats (reference descriptors.py:153-159 vs :170-172).
MODEL_REGISTRY = {
    "resnet50": (ResNet50, 2048, "imagenet"),
    "bit-50": (BiT50, 2048, "unit"),
    "densenet121": (DenseNet121, 1024, "imagenet"),
    # tiny variants for tests / smoke runs
    "resnet-tiny": (ResNet18Thin, 2048, "imagenet"),
    "bit-tiny": (BiTTiny, 512, "unit"),
    "densenet-tiny": (DenseNetTiny, 32, "imagenet"),
}


class CNNEmbedder:
    """Global-feature embedder: images -> (N, D) float32 embeddings."""

    def __init__(
        self,
        model_name: str = "resnet50",
        image_size: int = 224,
        batch_size: int = 64,
        dtype=jnp.bfloat16,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
        seed: int = 0,
        params=None,
        batch_stats=None,
        torch_weights: Optional[str | Path] = None,
    ):
        if model_name not in MODEL_REGISTRY:
            raise ValueError(f"unknown model {model_name!r}; want {sorted(MODEL_REGISTRY)}")
        if torch_weights is not None:
            if params is not None or batch_stats is not None:
                raise ValueError(
                    "pass either params/batch_stats or torch_weights, not both"
                )
            from image_search_engine_tpu.models.torch_import import variables_from_torch

            params, batch_stats = variables_from_torch(torch_weights, model_name)
        ctor, self.dim, self.norm_name = MODEL_REGISTRY[model_name]
        self.model_name = model_name
        self.model = ctor(dtype=dtype)
        self.image_size = image_size
        self.batch_size = batch_size
        self.mesh = mesh
        self.axis = axis

        if params is None:
            dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy, train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats")
        self.params = params
        self.batch_stats = batch_stats
        if mesh is not None:
            # replicate params across the mesh; batches get sharded per call
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            if self.batch_stats is not None:
                self.batch_stats = jax.device_put(self.batch_stats, NamedSharding(mesh, P()))

        @jax.jit
        def _forward(params, batch_stats, images):
            # uint8 batches upload 4x fewer bytes and cast here, on device
            x = preprocess_for_cnn(to_unit_f32(images), self.image_size,
                                   norm=self.norm_name)
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            return self.model.apply(variables, x, train=False)

        self._forward = _forward

    # -- embedding ----------------------------------------------------------
    def embed_batch(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) float [0,1] or uint8 -> (B, D) f32 embeddings.

        uint8 input is uploaded as-is (4x fewer bytes than f32) and cast
        to [0,1] on device inside the jitted forward."""
        images = np.asarray(images)
        b = images.shape[0]
        bs = self.batch_size
        out = np.empty((b, self.dim), np.float32)
        for s in range(0, b, bs):
            chunk = images[s : s + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            x = jnp.asarray(chunk)
            if self.mesh is not None:
                x = jax.device_put(x, NamedSharding(self.mesh, P(self.axis)))
            emb = self._forward(self.params, self.batch_stats, x)
            out[s : s + bs - pad] = np.asarray(emb)[: bs - pad]
        return out

    def embed_iter(self, batches: Iterable[np.ndarray]) -> np.ndarray:
        return np.concatenate([self.embed_batch(b) for b in batches])

    # -- persistence (flax msgpack; replaces torch/keras checkpoint load) ----
    def save(self, path: str | Path) -> None:
        blob = flax.serialization.to_bytes(
            {"params": self.params, "batch_stats": self.batch_stats}
        )
        Path(path).write_bytes(blob)

    def load(self, path: str | Path) -> "CNNEmbedder":
        target = {"params": self.params, "batch_stats": self.batch_stats}
        state = flax.serialization.from_bytes(target, Path(path).read_bytes())
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        return self
