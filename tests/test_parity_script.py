"""scripts/parity.py end-to-end on synthetic stand-ins (VERDICT r3 item 6).

The one-command parity harness must work BEFORE real reference artifacts
exist: here it runs against a generated torch-layout backbone state dict
(saved as .npz, exactly the file format a converted checkpoint would use)
and the committed COCO fixture — exercising state-dict loading, the
torch-vs-flax activation diff, weight import into the detector, the full
eval.py path, and the JSON summary contract.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.fixture_coco import make_fixture

pytestmark = pytest.mark.slow  # jit compiles + full eval protocol

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, "scripts", "parity.py")


@pytest.fixture(scope="module")
def synthetic_weights(tmp_path_factory):
    """torchvision-key resnet50 state dict with randomized BN stats, via
    parity.py's own torch reference model (so keys are the real layout)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import torch

    from parity import _build_torch_resnet

    tm = _build_torch_resnet("resnet50")
    rng = np.random.RandomState(0)
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean"):
                mod.running_mean.copy_(
                    torch.tensor(rng.randn(*mod.running_mean.shape) * 0.1))
                mod.running_var.copy_(torch.tensor(
                    1.0 + 0.2 * rng.rand(*mod.running_var.shape)))
    path = tmp_path_factory.mktemp("w") / "backbone.npz"
    np.savez(str(path), **{k: v.numpy() for k, v in tm.state_dict().items()
                           if not k.endswith("num_batches_tracked")})
    return str(path)


@pytest.fixture(scope="module")
def full_detector_weights(tmp_path_factory, synthetic_weights):
    """Backbone + FPN + RPN + box-head state dict in torch layout, with the
    lineage's 2A bg/fg RPN softmax head (exercises the fg-bg import
    adapter) and CHW-flatten fc1 (exercises the permute)."""
    sd = dict(np.load(synthetic_weights))
    rng = np.random.RandomState(1)
    ch, a, hidden, k, p = 32, 3, 64, 4, 7

    def w(*s):
        return (rng.randn(*s) * 0.05).astype(np.float32)

    heads = {}
    for l, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        heads[f"fpn.lateral{l}.weight"] = w(ch, cin, 1, 1)
        heads[f"fpn.lateral{l}.bias"] = w(ch)
        heads[f"fpn.smooth{l}.weight"] = w(ch, ch, 3, 3)
        heads[f"fpn.smooth{l}.bias"] = w(ch)
    heads["rpn.conv.weight"] = w(ch, ch, 3, 3)
    heads["rpn.conv.bias"] = w(ch)
    heads["rpn.cls_score.weight"] = w(2 * a, ch, 1, 1)  # bg/fg softmax
    heads["rpn.cls_score.bias"] = w(2 * a)
    heads["rpn.bbox_pred.weight"] = w(4 * a, ch, 1, 1)
    heads["rpn.bbox_pred.bias"] = w(4 * a)
    heads["box_head.fc1.weight"] = w(hidden, ch * p * p)
    heads["box_head.fc1.bias"] = w(hidden)
    heads["box_head.fc2.weight"] = w(hidden, hidden)
    heads["box_head.fc2.bias"] = w(hidden)
    heads["box_head.cls_score.weight"] = w(k, hidden)
    heads["box_head.cls_score.bias"] = w(k)
    heads["box_head.bbox_pred.weight"] = w(4 * k, hidden)
    heads["box_head.bbox_pred.bias"] = w(4 * k)
    path = tmp_path_factory.mktemp("w") / "detector.npz"
    np.savez(str(path), **sd, **heads)
    return str(path)


def test_parity_detector_stage_diffs(full_detector_weights, tmp_path):
    """VERDICT r4 item 7: the torch executor covers FPN + RPN + box head,
    and every converted stage diffs < 2e-3 on a full-detector state dict."""
    proc = subprocess.run(
        [sys.executable, PARITY, "--platform", "cpu",
         "--weights", full_detector_weights, "--skip-eval"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] is True
    acts = summary["activations"]
    assert set(acts) == {"c2", "c3", "c4", "c5", "p2", "p3", "p4", "p5",
                         "p6", "rpn_obj", "rpn_deltas", "box_cls", "box_reg"}
    for name, row in acts.items():
        assert row["rel_max_diff"] < 2e-3, (name, row)


def test_parity_one_command(synthetic_weights, tmp_path):
    root = make_fixture(str(tmp_path / "coco"))
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, PARITY, "--platform", "cpu",
         "--weights", synthetic_weights,
         "--data-root", root, "--split", "val",
         "--out-dir", out_dir,
         "--cfg",
         "data.dataset=coco", "data.short_side=96", "data.max_size=128",
         "data.image_size=[128,128]",
         "model.name=faster_rcnn", "model.num_classes=4",
         "model.fpn_channels=32", "model.frozen_stages=0",
         "train.batch_size=2", "train.max_gt_boxes=8",
         "parallel.num_devices=1",
         "rpn.pre_nms_topk_test=128", "rpn.post_nms_topk_test=32",
         "test.detections_per_image=10"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] is True
    # activation table: all four stages compared, all inside tolerance
    acts = summary["activations"]
    assert set(acts) == {"c2", "c3", "c4", "c5"}
    for row in acts.values():
        assert row["rel_max_diff"] < 2e-3
    # eval stage ran through the real pipeline and produced the protocol
    # metrics (random-head weights -> tiny AP, but keys must be there)
    assert {"AP", "AP50", "AR100"} <= set(summary["eval"])
    assert os.path.exists(os.path.join(out_dir, "eval_results.json"))


def test_parity_detects_converter_divergence(synthetic_weights, monkeypatch):
    """The activation diff guards the CONVERTER: the same state dict runs
    through the torch executor and through load_resnet_backbone→Flax, so a
    conversion bug (wrong key map, wrong transpose...) shows as divergence.
    Emulate one in-process: perturb a single conv kernel AFTER conversion
    and assert the bar trips at that stage and downstream."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import parity as parity_mod
    from detectron_tpu.config import get_config
    from detectron_tpu.utils import torch_weights

    sd = dict(np.load(synthetic_weights))
    cfg = get_config(None, ["model.frozen_stages=0"])

    clean = parity_mod.activation_diff(sd, cfg, size=64)
    assert all(r["rel_max_diff"] < 2e-3 for r in clean.values())

    orig = torch_weights.load_resnet_backbone

    def corrupting(variables, bb_sd):
        out = orig(variables, bb_sd)
        # nudge one res4 conv kernel (a converter mis-map of a single
        # tensor is exactly this shape of bug)
        conv = out["params"]["backbone"]["layer3_0"]["conv2"]
        conv["kernel"] = conv["kernel"] + 0.05
        return out

    monkeypatch.setattr(torch_weights, "load_resnet_backbone", corrupting)
    bad = parity_mod.activation_diff(sd, cfg, size=64)
    assert bad["c2"]["rel_max_diff"] < 2e-3  # upstream of the corruption
    assert bad["c4"]["rel_max_diff"] > 2e-3  # at it
    assert bad["c5"]["rel_max_diff"] > 2e-3  # and downstream


def test_parity_rejects_malformed_checkpoint(synthetic_weights, tmp_path):
    """A checkpoint whose key layout doesn't match the torch reference
    (e.g. a missing tensor — the classic file-format surprise) must exit
    non-zero with an explanatory summary, not silently pass."""
    sd = dict(np.load(synthetic_weights))
    del sd["layer3.0.conv2.weight"]
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **sd)
    proc = subprocess.run(
        [sys.executable, PARITY, "--platform", "cpu",
         "--weights", bad, "--skip-eval"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 1, proc.stdout[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] is False
    assert "skipped" in summary["activations"]
