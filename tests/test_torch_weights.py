"""Weight conversion + activation parity vs a torch ResNet (SURVEY.md §4:
"load reference-trained R-50 weights, assert per-layer activation
closeness"). torchvision is not installed, so the canonical torchvision
ResNet-50 is reconstructed in torch here; weights flow torch -> converter ->
flax and the C2..C5 activations must match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from detectron_tpu.models.resnet import ResNet  # noqa: E402
from detectron_tpu.utils.torch_weights import (  # noqa: E402
    convert_resnet_state_dict,
    load_resnet_backbone,
    torch_key_to_flax_path,
)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    """torchvision-resnet50-compatible (v1.5) with identical key names."""

    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, blocks[0], 1)
        self.layer2 = self._make_layer(128, blocks[1], 2)
        self.layer3 = self._make_layer(256, blocks[2], 2)
        self.layer4 = self._make_layer(512, blocks[3], 2)

    def _make_layer(self, planes, n, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(n - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def _randomize_bn_stats(model, rng):
    """Give BN layers nontrivial running stats so parity is meaningful."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.tensor(rng.randn(n), dtype=torch.float32) * 0.1)
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, n), dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.uniform(0.8, 1.2, n), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.randn(n), dtype=torch.float32) * 0.1)


def test_key_mapping():
    assert torch_key_to_flax_path("conv1.weight") == ("conv1", "kernel")
    assert torch_key_to_flax_path("layer3.5.bn2.running_mean") == (
        "layer3_5", "bn2", "running_mean")
    assert torch_key_to_flax_path("layer1.0.downsample.0.weight") == (
        "layer1_0", "downsample_conv", "kernel")
    assert torch_key_to_flax_path("fc.weight") is None
    assert torch_key_to_flax_path("bn1.num_batches_tracked") is None
    with pytest.raises(KeyError):
        torch_key_to_flax_path("unknown.thing")


def test_full_conversion_covers_model():
    tm = TorchResNet50()
    converted = convert_resnet_state_dict(tm.state_dict())
    fm = ResNet(depth="resnet50")
    params = fm.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params["params"])
    assert set(converted.keys()) == set(flat.keys())
    for k in flat:
        assert converted[k].shape == flat[k].shape, k


def test_activation_parity_c2_to_c5():
    rng = np.random.RandomState(0)
    with torch.no_grad():
        tm = TorchResNet50()
        tm.eval()
        _randomize_bn_stats(tm, rng)
        x = rng.randn(1, 3, 64, 64).astype(np.float32)
        t_feats = tm(torch.tensor(x))

    fm = ResNet(depth="resnet50", frozen_stages=0)
    params = fm.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    params = load_resnet_backbone(
        {"params": {"backbone": params["params"]}}, tm.state_dict()
    )
    feats = fm.apply({"params": params["params"]["backbone"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    for name, tf in zip(("c2", "c3", "c4", "c5"), t_feats):
        ours = np.asarray(feats[name]).transpose(0, 3, 1, 2)
        ref = tf.numpy()
        assert ours.shape == ref.shape, name
        err = np.abs(ours - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert err < 2e-3, (name, err)


def test_maybe_load_pretrained_driver_wiring(tmp_path):
    """cfg.model.weights -> backbone subtree replaced (train.py/eval.py path),
    for both .pth and .npz state dicts; "" is a no-op."""
    from detectron_tpu.config import get_config
    from detectron_tpu.utils.torch_weights import maybe_load_pretrained

    tm = TorchResNet50()
    pth = tmp_path / "r50.pth"
    torch.save(tm.state_dict(), str(pth))
    npz = tmp_path / "r50.npz"
    np.savez(npz, **{k: v.numpy() for k, v in tm.state_dict().items()})

    fm = ResNet(depth="resnet50")
    bb = fm.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    head = np.ones((4, 4), np.float32)
    params = {"params": {"backbone": bb["params"], "head": {"w": head}}}

    cfg = get_config()
    assert maybe_load_pretrained(cfg, params) is params  # weights="" no-op

    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    for path in (pth, npz):
        cfg.model.weights = str(path)
        out = maybe_load_pretrained(cfg, params)
        got = np.asarray(out["params"]["backbone"]["conv1"]["kernel"])
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # non-backbone params untouched
        np.testing.assert_array_equal(out["params"]["head"]["w"], head)
