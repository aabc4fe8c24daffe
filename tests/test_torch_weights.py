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


class TorchBoxHead(tnn.Module):
    """Lineage-named box head: fc6/fc7 on CHW-flattened pooled features."""

    def __init__(self, c=32, p=7, hidden=64, k=4):
        super().__init__()
        self.fc6 = tnn.Linear(c * p * p, hidden)
        self.fc7 = tnn.Linear(hidden, hidden)
        self.cls_score = tnn.Linear(hidden, k)
        self.bbox_pred = tnn.Linear(hidden, k * 4)

    def forward(self, x):  # x: (R, C, P, P)
        x = torch.relu(self.fc6(x.flatten(1)))
        x = torch.relu(self.fc7(x))
        return self.cls_score(x), self.bbox_pred(x)


class TorchMaskHead(tnn.Module):
    """Lineage-named mask head with a K+1-channel predictor (bg first)."""

    def __init__(self, c=16, k=3):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"mask_fcn{i}", tnn.Conv2d(c, c, 3, padding=1))
        self.conv5_mask = tnn.ConvTranspose2d(c, c, 2, stride=2)
        self.mask_fcn_logits = tnn.Conv2d(c, k + 1, 1)

    def forward(self, x):  # (R, C, H, W)
        for i in range(1, 5):
            x = torch.relu(getattr(self, f"mask_fcn{i}")(x))
        x = torch.relu(self.conv5_mask(x))
        return self.mask_fcn_logits(x)


class TorchRPN(tnn.Module):
    """Lineage RPN: 3x3 conv + 2A-channel bg/fg softmax cls (bg first [K])
    + 4A bbox conv."""

    def __init__(self, c=32, a=3):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)
        self.cls_score = tnn.Conv2d(c, 2 * a, 1)
        self.bbox_pred = tnn.Conv2d(c, 4 * a, 1)

    def forward(self, x):
        h = torch.relu(self.conv(x))
        return self.cls_score(h), self.bbox_pred(h)


def test_box_head_import_activation_parity():
    """fc6/fc7 import must permute fc1's input dim from the torch CHW
    flatten to our HWC flatten — logits must match exactly."""
    from detectron_tpu.models.heads import BoxHead
    from detectron_tpu.utils.torch_weights import load_detector

    rng = np.random.RandomState(0)
    c, p, k = 32, 7, 4
    with torch.no_grad():
        tm = TorchBoxHead(c=c, p=p, k=k)
        pooled = rng.randn(5, c, p, p).astype(np.float32)
        t_cls, t_reg = tm(torch.tensor(pooled))

    fm = BoxHead(num_classes=k, hidden=64)
    x = jnp.asarray(pooled.transpose(0, 2, 3, 1))[None]  # [1, R, P, P, C]
    params = fm.init(jax.random.key(0), x)
    loaded = load_detector(
        {"params": {"box_head": params["params"]}}, tm.state_dict(),
        pooled_hw=(p, p))
    cls, reg = fm.apply({"params": loaded["params"]["box_head"]}, x)
    np.testing.assert_allclose(np.asarray(cls[0]), t_cls.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg[0]).reshape(5, -1),
                               t_reg.numpy(), atol=1e-5)


def test_mask_head_import_activation_parity():
    """Deconv needs layout + spatial flip; the K+1-channel lineage predictor
    drops its bg channel. Mask logits must match the torch fg channels."""
    from detectron_tpu.models.heads import MaskHead
    from detectron_tpu.utils.torch_weights import load_detector

    rng = np.random.RandomState(1)
    c, k = 16, 3
    with torch.no_grad():
        tm = TorchMaskHead(c=c, k=k)
        feat = rng.randn(2, c, 14, 14).astype(np.float32)
        t_out = tm(torch.tensor(feat)).numpy()  # (2, k+1, 28, 28)

    fm = MaskHead(num_classes=k + 1, channels=c)
    x = jnp.asarray(feat.transpose(0, 2, 3, 1))[None]  # [1, R, 14, 14, C]
    params = fm.init(jax.random.key(0), x)
    loaded = load_detector(
        {"params": {"mask_head": params["params"]}}, tm.state_dict())
    out = fm.apply({"params": loaded["params"]["mask_head"]}, x)
    ours = np.asarray(out[0]).transpose(0, 3, 1, 2)  # (2, k, 28, 28)
    np.testing.assert_allclose(ours, t_out[:, 1:], atol=1e-5)


def test_rpn_import_objectness_posterior_parity():
    """2A bg/fg softmax -> A sigmoid via fg-bg: the objectness PROBABILITY
    must match the source softmax fg probability exactly."""
    from detectron_tpu.models.heads import RPNHead
    from detectron_tpu.utils.torch_weights import load_detector

    rng = np.random.RandomState(2)
    c, a = 32, 3
    with torch.no_grad():
        tm = TorchRPN(c=c, a=a)
        feat = rng.randn(1, c, 8, 8).astype(np.float32)
        t_cls, t_reg = tm(torch.tensor(feat))
        t_prob = torch.softmax(
            t_cls.reshape(1, 2, a, 8, 8), dim=1)[:, 1].numpy()

    fm = RPNHead(num_anchors=a, channels=c)
    x = jnp.asarray(feat.transpose(0, 2, 3, 1))
    params = fm.init(jax.random.key(0), x)
    sd = {f"rpn.{k}": v for k, v in tm.state_dict().items()}
    loaded = load_detector({"params": {"rpn": params["params"]}}, sd)
    logits, deltas = fm.apply({"params": loaded["params"]["rpn"]}, x)
    ours = 1.0 / (1.0 + np.exp(-np.asarray(logits).reshape(1, 8, 8, a)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), t_prob, atol=1e-5)
    # torch channels are (h, w)-major after transpose; ours (h, w, a, 4)
    want = t_reg.numpy().transpose(0, 2, 3, 1).reshape(1, -1, 4)
    np.testing.assert_allclose(np.asarray(deltas), want, atol=1e-5)


def test_full_detector_state_dict_covers_mask_rcnn(tmp_path):
    """A full lineage-named detector dict loads into the zoo Mask R-CNN via
    the maybe_load_pretrained driver path: every source tensor lands, heads
    change, and a backbone-only dict still takes the backbone-only path."""
    from detectron_tpu.config import get_config
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.utils.torch_weights import maybe_load_pretrained

    cfg = get_config()
    cfg.model.name = "mask_rcnn"
    cfg.model.num_classes = 4
    cfg.model.fpn_channels = 32
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (64, 64))

    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    rng = np.random.RandomState(3)

    def t_conv(path):  # HWIO model shape -> torch OIHW tensor
        kh, kw, ci, co = flat[path].shape
        return rng.randn(co, ci, kh, kw).astype(np.float32)

    sd = {}
    tm = TorchResNet50()
    for k, v in tm.state_dict().items():
        sd[f"resnet.{k}"] = v.numpy()
    for lvl in (2, 3, 4, 5):
        for nm in (f"lateral{lvl}", f"smooth{lvl}"):
            sd[f"fpn.{nm}.weight"] = t_conv(("params", "fpn", nm, "kernel"))
            sd[f"fpn.{nm}.bias"] = np.asarray(
                flat[("params", "fpn", nm, "bias")])
    sd["rpn.conv.weight"] = t_conv(("params", "rpn", "conv", "kernel"))
    sd["rpn.conv.bias"] = rng.randn(32).astype(np.float32)
    a = flat[("params", "rpn", "objectness", "kernel")].shape[-1]
    sd["rpn.cls_score.weight"] = rng.randn(2 * a, 32, 1, 1).astype(np.float32)
    sd["rpn.cls_score.bias"] = rng.randn(2 * a).astype(np.float32)
    sd["rpn.bbox_pred.weight"] = t_conv(("params", "rpn", "deltas", "kernel"))
    sd["rpn.bbox_pred.bias"] = rng.randn(4 * a).astype(np.float32)
    hidden, cpp = (flat[("params", "box_head", "fc1", "kernel")].shape[1],
                   flat[("params", "box_head", "fc1", "kernel")].shape[0])
    sd["fc6.weight"] = rng.randn(hidden, cpp).astype(np.float32)
    sd["fc6.bias"] = rng.randn(hidden).astype(np.float32)
    sd["fc7.weight"] = rng.randn(hidden, hidden).astype(np.float32)
    sd["fc7.bias"] = rng.randn(hidden).astype(np.float32)
    for nm in ("cls_score", "bbox_pred"):
        i, o = flat[("params", "box_head", nm, "kernel")].shape
        sd[f"{nm}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{nm}.bias"] = rng.randn(o).astype(np.float32)
    mc = flat[("params", "mask_head", "conv0", "kernel")].shape[-1]
    for i in range(1, 5):
        sd[f"mask_fcn{i}.weight"] = t_conv(
            ("params", "mask_head", f"conv{i - 1}", "kernel"))
        sd[f"mask_fcn{i}.bias"] = rng.randn(mc).astype(np.float32)
    sd["conv5_mask.weight"] = rng.randn(mc, mc, 2, 2).astype(np.float32)
    sd["conv5_mask.bias"] = rng.randn(mc).astype(np.float32)
    sd["mask_fcn_logits.weight"] = rng.randn(4, mc, 1, 1).astype(np.float32)
    sd["mask_fcn_logits.bias"] = rng.randn(4).astype(np.float32)

    npz = tmp_path / "detector.npz"
    np.savez(npz, **sd)
    cfg.model.weights = str(npz)
    out = maybe_load_pretrained(cfg, params)
    got = traverse_util.flatten_dict(out)
    # heads replaced (not the init values), shapes intact
    assert not np.allclose(got[("params", "box_head", "fc1", "kernel")],
                           flat[("params", "box_head", "fc1", "kernel")])
    assert not np.allclose(got[("params", "rpn", "objectness", "kernel")],
                           flat[("params", "rpn", "objectness", "kernel")])
    assert not np.allclose(
        got[("params", "mask_head", "mask_logits", "kernel")],
        flat[("params", "mask_head", "mask_logits", "kernel")])
    for k in flat:
        assert got[k].shape == flat[k].shape, k
    # forward still runs with the imported weights
    from detectron_tpu.data.synthetic import make_batch
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), 1, (64, 64),
                   cfg.model.num_classes))
    ib = {k: v for k, v in batch.items()
          if k not in ("gt_boxes", "gt_classes", "gt_masks")}
    dets, masks = det.predict_fn(out, ib)
    assert np.isfinite(np.asarray(dets.scores, np.float32)).all()


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
