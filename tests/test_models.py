"""Flax backbones + batched embedder (reference CNNDescriptor,
backend/descriptors.py:142-204; siamese backbones model.py:23-45)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_tpu.models.bit import BiTTiny
from image_search_engine_tpu.models.densenet import DenseNetTiny
from image_search_engine_tpu.models.resnet import ResNet18Thin
from image_search_engine_tpu.models.embedder import CNNEmbedder


@pytest.mark.parametrize("ctor,dim", [(ResNet18Thin, 2048), (BiTTiny, 512), (DenseNetTiny, 32)])
def test_backbone_forward_shapes(ctor, dim):
    m = ctor()
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, dim)
    assert out.dtype == jnp.float32


def test_resnet_train_mode_updates_batch_stats():
    m = ResNet18Thin()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape[0] == 2
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    ), "train mode must update running stats"


def test_embedder_batched_and_padded(rng):
    emb = CNNEmbedder("resnet-tiny", image_size=32, batch_size=4, dtype=jnp.float32)
    imgs = rng.random((6, 40, 40, 3)).astype(np.float32)  # 6 % 4 != 0 -> padding
    out = emb.embed_batch(imgs)
    assert out.shape == (6, 2048)
    # per-image results must not depend on batch packing
    out2 = np.concatenate([emb.embed_batch(imgs[:3]), emb.embed_batch(imgs[3:])])
    np.testing.assert_allclose(out, out2, rtol=1e-4, atol=1e-5)


def test_embedder_uint8_and_float_agree(rng):
    emb = CNNEmbedder("densenet-tiny", image_size=32, batch_size=2, dtype=jnp.float32)
    img8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    a = emb.embed_batch(img8)
    b = emb.embed_batch(img8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_embedder_save_load_roundtrip(rng, tmp_path):
    emb = CNNEmbedder("bit-tiny", image_size=32, batch_size=2, dtype=jnp.float32, seed=3)
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    ref = emb.embed_batch(imgs)
    p = tmp_path / "weights.msgpack"
    emb.save(p)
    emb2 = CNNEmbedder("bit-tiny", image_size=32, batch_size=2, dtype=jnp.float32, seed=9)
    assert not np.allclose(emb2.embed_batch(imgs), ref)  # different init
    emb2.load(p)
    np.testing.assert_allclose(emb2.embed_batch(imgs), ref, rtol=1e-5)


def test_embedder_sharded_matches_single(rng):
    from image_search_engine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    imgs = rng.random((8, 32, 32, 3)).astype(np.float32)
    e1 = CNNEmbedder("resnet-tiny", image_size=32, batch_size=8, dtype=jnp.float32, seed=0)
    e2 = CNNEmbedder(
        "resnet-tiny", image_size=32, batch_size=8, dtype=jnp.float32, seed=0, mesh=mesh
    )
    np.testing.assert_allclose(e1.embed_batch(imgs), e2.embed_batch(imgs), rtol=1e-4, atol=1e-5)
