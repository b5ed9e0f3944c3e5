"""Torch -> Flax weight import: forward parity against a minimal torch
ResNet twin (torchvision state_dict layout, no torchvision dependency)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from image_search_engine_tpu.models.resnet import ResNet  # noqa: E402
from image_search_engine_tpu.models.torch_import import (  # noqa: E402
    convert_torchvision_resnet,
)


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck: names conv1/bn1..conv3/bn3, downsample.{0,1}."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    """torchvision ResNet skeleton (conv1/bn1/layer{1..4}/avgpool)."""

    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        inplanes = 64
        for i, n_blocks in enumerate(stage_sizes):
            planes = 64 * 2**i
            blocks = []
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(TorchBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            if hasattr(self, f"layer{i + 1}"):
                x = getattr(self, f"layer{i + 1}")(x)
        return torch.flatten(self.avgpool(x), 1)


def test_forward_parity_thin():
    torch.manual_seed(0)
    stage_sizes = (1, 1, 1, 1)
    tm = TorchResNet(stage_sizes)
    # make running stats non-trivial so eval mode actually uses them
    tm.train()
    with torch.no_grad():
        for _ in range(3):
            tm(torch.randn(4, 3, 64, 64))
    tm.eval()

    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = convert_torchvision_resnet(tm.state_dict(), stage_sizes)
    import jax.numpy as jnp

    fm = ResNet(stage_sizes=stage_sizes)
    out = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_full_resnet50_tree_shapes():
    # the real 50-layer mapping: converted tree must match the Flax init
    # tree exactly in structure and shapes (forward skipped for speed)
    import jax
    import jax.numpy as jnp

    stage_sizes = (3, 4, 6, 3)
    tm = TorchResNet(stage_sizes)
    params, stats = convert_torchvision_resnet(tm.state_dict(), stage_sizes)

    fm = ResNet(stage_sizes=stage_sizes)
    variables = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    want_p = jax.tree.map(lambda a: a.shape, variables["params"])
    want_s = jax.tree.map(lambda a: a.shape, variables["batch_stats"])
    got_p = jax.tree.map(lambda a: np.asarray(a).shape, params)
    got_s = jax.tree.map(lambda a: np.asarray(a).shape, stats)
    assert got_p == want_p
    assert got_s == want_s


def test_checkpoint_file_roundtrip(tmp_path):
    from image_search_engine_tpu.models.torch_import import variables_from_torch

    tm = TorchResNet((1, 1, 1, 1))
    p = tmp_path / "ckpt.pth"
    torch.save({"state_dict": tm.state_dict()}, p)
    params, stats = variables_from_torch(p, "resnet-tiny")
    assert "Bottleneck_3" in params and "Conv_0" in params


def test_embedder_with_torch_weights(tmp_path):
    import jax.numpy as jnp

    from image_search_engine_tpu.models.embedder import CNNEmbedder

    tm = TorchResNet((1, 1, 1, 1))
    p = tmp_path / "backbone.pth"
    torch.save(tm.state_dict(), p)
    emb = CNNEmbedder("resnet-tiny", image_size=32, batch_size=2,
                      dtype=jnp.float32, torch_weights=p)
    out = emb.embed_batch(np.random.default_rng(0).random((3, 32, 32, 3)).astype(np.float32))
    assert out.shape == (3, 2048)
    assert np.isfinite(out).all()


class TorchDenseLayer(tnn.Module):
    def __init__(self, in_ch, growth):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_ch)
        self.conv1 = tnn.Conv2d(in_ch, 4 * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(4 * growth)
        self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, x):
        y = self.conv1(self.relu(self.norm1(x)))
        y = self.conv2(self.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TorchDenseNet(tnn.Module):
    """torchvision DenseNet skeleton with its state_dict key layout."""

    def __init__(self, block_sizes, growth=32):
        super().__init__()
        from collections import OrderedDict

        feats = OrderedDict()
        feats["conv0"] = tnn.Conv2d(3, 2 * growth, 7, stride=2, padding=3, bias=False)
        feats["norm0"] = tnn.BatchNorm2d(2 * growth)
        feats["relu0"] = tnn.ReLU(inplace=True)
        feats["pool0"] = tnn.MaxPool2d(3, stride=2, padding=1)
        ch = 2 * growth
        for b, n_layers in enumerate(block_sizes):
            block = tnn.Sequential(OrderedDict(
                (f"denselayer{l + 1}", TorchDenseLayer(ch + l * growth, growth))
                for l in range(n_layers)))
            feats[f"denseblock{b + 1}"] = block
            ch += n_layers * growth
            if b != len(block_sizes) - 1:
                trans = tnn.Sequential(OrderedDict([
                    ("norm", tnn.BatchNorm2d(ch)),
                    ("relu", tnn.ReLU(inplace=True)),
                    ("conv", tnn.Conv2d(ch, ch // 2, 1, bias=False)),
                    ("pool", tnn.AvgPool2d(2, stride=2)),
                ]))
                feats[f"transition{b + 1}"] = trans
                ch //= 2
        feats["norm5"] = tnn.BatchNorm2d(ch)
        self.features = tnn.Sequential(feats)

    def forward(self, x):
        x = torch.relu(self.features(x))
        return torch.flatten(tnn.functional.adaptive_avg_pool2d(x, 1), 1)


def test_densenet_forward_parity_tiny():
    from image_search_engine_tpu.models.densenet import DenseNet
    from image_search_engine_tpu.models.torch_import import convert_torchvision_densenet

    torch.manual_seed(0)
    block_sizes, growth = (2, 2), 8  # DenseNetTiny config
    tm = TorchDenseNet(block_sizes, growth)
    tm.train()
    with torch.no_grad():
        for _ in range(3):
            tm(torch.randn(4, 3, 64, 64))
    tm.eval()

    x = np.random.default_rng(2).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params, stats = convert_torchvision_densenet(tm.state_dict(), block_sizes)
    import jax.numpy as jnp

    fm = DenseNet(block_sizes=block_sizes, growth_rate=growth)
    out = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_densenet121_tree_shapes():
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.models.densenet import DenseNet121
    from image_search_engine_tpu.models.torch_import import convert_torchvision_densenet

    tm = TorchDenseNet((6, 12, 24, 16), growth=32)
    params, stats = convert_torchvision_densenet(tm.state_dict(), (6, 12, 24, 16))
    fm = DenseNet121()
    variables = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    assert jax.tree.map(lambda a: np.asarray(a).shape, params) == \
        jax.tree.map(lambda a: a.shape, variables["params"])
    assert jax.tree.map(lambda a: np.asarray(a).shape, stats) == \
        jax.tree.map(lambda a: a.shape, variables["batch_stats"])


def test_siamese_trainer_with_torch_backbone(tmp_path):
    # graft a converted torchvision backbone under the siamese head and
    # take one forward: must run and differ from the random init
    import jax
    import jax.numpy as jnp

    from image_search_engine_tpu.training.siamese.config import SiameseConfig
    from image_search_engine_tpu.training.siamese.train import Trainer

    tm = TorchDenseNet((2, 2), growth=8)
    p = tmp_path / "dn.pth"
    torch.save(tm.state_dict(), p)
    cfg = SiameseConfig(backbone="densenet-tiny", image_size=(32, 32),
                        embedding_dim=8, ckpt_dir=tmp_path,
                        log_file=tmp_path / "m.jsonl", torch_weights=p)
    tr = Trainer(cfg)
    name = next(k for k in tr.params if k.startswith("DenseNet"))
    got = np.asarray(tr.params[name]["Conv_0"]["kernel"])
    want = tm.state_dict()["features.conv0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    emb = tr.embed(x) if hasattr(tr, "embed") else None
    if emb is not None:
        assert np.isfinite(np.asarray(emb)).all()


# ---------------------------------------------------------------------------
# BiT (HF google/bit-50 layout) import
# ---------------------------------------------------------------------------


def _hf_bit_tiny():
    transformers = pytest.importorskip("transformers")
    cfg = transformers.BitConfig(
        num_channels=3, embedding_size=64, hidden_sizes=[256, 512],
        depths=[1, 1], layer_type="preactivation", global_padding="SAME",
        num_groups=32, embedding_dynamic_padding=True, hidden_act="relu",
    )
    m = transformers.BitModel(cfg)
    m.eval()
    return m


def test_bit_forward_parity_tiny():
    """Converted HF BitModel weights must reproduce HF outputs through our
    Flax BiT — pooled AND the reference's flattened last_hidden_state
    (backend/descriptors.py:186-189) — including the TF-SAME asymmetric
    padding on stride-2 convs."""
    import jax.numpy as jnp

    from image_search_engine_tpu.models.bit import BiT
    from image_search_engine_tpu.models.torch_import import convert_hf_bit

    tm = _hf_bit_tiny()
    params, stats = convert_hf_bit(tm.state_dict(), stage_sizes=(1, 1))
    assert stats is None  # stateless (GroupNorm)

    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_pooled = out.pooler_output.squeeze(-1).squeeze(-1).numpy()
    ref_flat = out.last_hidden_state.flatten(1).numpy()

    model = BiT(stage_sizes=(1, 1))
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_pooled, rtol=2e-4, atol=2e-4)

    flat_model = BiT(stage_sizes=(1, 1), pooling="flatten")
    got_flat = np.asarray(flat_model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got_flat, ref_flat, rtol=2e-4, atol=2e-4)


def test_bit50_tree_shapes():
    """The full google/bit-50 layout converts into the exact BiT50 param
    tree (shape-checked via eval_shape; no full init needed)."""
    import jax
    import jax.numpy as jnp

    transformers = pytest.importorskip("transformers")
    from image_search_engine_tpu.models.bit import BiT50
    from image_search_engine_tpu.models.torch_import import convert_hf_bit

    cfg = transformers.BitConfig(
        num_channels=3, embedding_size=64,
        hidden_sizes=[256, 512, 1024, 2048], depths=[3, 4, 6, 3],
        layer_type="preactivation", global_padding="SAME", num_groups=32,
        embedding_dynamic_padding=True, hidden_act="relu",
    )
    with torch.device("meta"):
        tm = transformers.BitModel(cfg)
    params, _ = convert_hf_bit(
        {k: np.zeros(v.shape, np.float32) for k, v in tm.state_dict().items()}
    )
    model = BiT50()
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.float32))
    )["params"]
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    want_shapes = jax.tree.map(lambda a: a.shape, expected)
    assert got_shapes == want_shapes


def test_bit_rejects_wrong_depth():
    from image_search_engine_tpu.models.torch_import import convert_hf_bit

    tm = _hf_bit_tiny()
    with pytest.raises((ValueError, KeyError)):
        convert_hf_bit(tm.state_dict(), stage_sizes=(1, 1, 1))


def test_embedder_with_bit_torch_weights(tmp_path):
    from image_search_engine_tpu.models.embedder import CNNEmbedder

    tm = _hf_bit_tiny()
    p = tmp_path / "bit_tiny.pth"
    torch.save(tm.state_dict(), p)
    emb = CNNEmbedder("bit-tiny", image_size=64, batch_size=2, torch_weights=p)
    x = np.random.default_rng(1).random((3, 64, 64, 3)).astype(np.float32)
    out = emb.embed_batch(x)
    assert out.shape == (3, 512) and np.isfinite(out).all()
    # embeddings follow the converted weights, not a random init
    emb_rand = CNNEmbedder("bit-tiny", image_size=64, batch_size=2)
    assert not np.allclose(out, emb_rand.embed_batch(x), atol=1e-3)
