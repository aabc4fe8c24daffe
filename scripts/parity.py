#!/usr/bin/env python
"""One-command real-weight parity harness (VERDICT r3 item 6).

For the day a real reference checkpoint and/or real COCO annotations
appear: ONE command that takes a ``.pth``/``.npz`` state dict plus a
COCO-layout dataset and emits (a) the backbone activation-diff table
(our Flax ResNet vs a self-contained torch reference executing the same
weights) and (b) the detector's mAP through the full eval.py path.

  python scripts/parity.py --weights ref.pth --data-root /data/coco \
      [--split val2017] [--cfg model.name=mask_rcnn ...] [--limit 100] \
      [--expect-ap 0.37 --ap-tol 0.005]

Either stage can be skipped (--skip-activations / --skip-eval). Exits
non-zero if the activation diff exceeds --act-tol (default 2e-3, the bar
the synthetic-weights parity tests already enforce) or if --expect-ap is
given and missed. The last stdout line is one JSON summary.

Smoke-tested end-to-end on synthetic stand-ins (a generated torch-layout
state dict + the committed COCO fixture) by tests/test_parity_script.py,
so the path is exercised BEFORE real artifacts exist (reference workflow:
load_pretrained + test.py mAP check; SURVEY.md §4 "Parity", §5.4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


# --------------------------------------------------------------------------
# Minimal torch ResNet with torchvision key names (torchvision itself is not
# installed in this image). Only used for the activation diff; weights come
# from the checkpoint, so this is an EXECUTOR of reference weights, not a
# reimplementation of reference code.
# --------------------------------------------------------------------------
def _build_torch_resnet(depth: str):
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    class TorchResNet(tnn.Module):
        def __init__(self, blocks):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            inplanes = 64
            for li, (planes, n) in enumerate(
                    zip((64, 128, 256, 512), blocks), start=1):
                stride = 1 if li == 1 else 2
                down = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )
                layers = [Bottleneck(inplanes, planes, stride, down)]
                inplanes = planes * 4
                layers += [Bottleneck(inplanes, planes)
                           for _ in range(n - 1)]
                setattr(self, f"layer{li}", tnn.Sequential(*layers))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            feats = []
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
                feats.append(x)
            return feats

    return TorchResNet(STAGE_BLOCKS[depth])


def _backbone_subdict(sd: dict) -> dict:
    """Extract bare torchvision-style backbone keys from a (possibly
    prefixed, possibly full-detector) state dict."""
    import re

    out = {}
    pre = re.compile(r"^(?:resnet\.|backbone\.)?")
    bb = re.compile(r"^(conv1|bn1|layer\d)\.")
    for k, v in sd.items():
        bare = pre.sub("", k)
        if bb.match(bare) and not k.endswith("num_batches_tracked"):
            out[bare] = v
    return out


def activation_diff(sd: dict, cfg, size: int = 64) -> dict:
    """Run the SAME backbone weights through torch and through our Flax
    ResNet on one random input; return per-stage relative max |diff|."""
    import torch

    import jax
    import jax.numpy as jnp

    from detectron_tpu.models.resnet import ResNet
    from detectron_tpu.utils.torch_weights import load_resnet_backbone

    bb_sd = _backbone_subdict(sd)
    if not bb_sd:
        return {"skipped": "no backbone keys in state dict"}
    depth = cfg.model.backbone
    tm = _build_torch_resnet(depth)
    tsd = {k: torch.as_tensor(np.asarray(v)) for k, v in bb_sd.items()}
    try:
        missing, unexpected = tm.load_state_dict(tsd, strict=False)
    except RuntimeError as e:  # e.g. size mismatch: report, don't crash
        return {"skipped": f"torch load failed: {e}"}
    missing = [m for m in missing if not m.endswith("num_batches_tracked")]
    if missing:
        return {"skipped": f"torch reference missing keys: {missing[:5]}..."}
    tm.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, size, size).astype(np.float32)
    with torch.no_grad():
        t_feats = tm(torch.tensor(x))

    fm = ResNet(depth=depth, frozen_stages=0, norm=cfg.model.norm)
    params = fm.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    params = load_resnet_backbone(
        {"params": {"backbone": params["params"]}}, bb_sd)
    feats = fm.apply({"params": params["params"]["backbone"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    table = {}
    for name, tf in zip(("c2", "c3", "c4", "c5"), t_feats):
        ours = np.asarray(feats[name]).transpose(0, 3, 1, 2)
        ref = tf.numpy()
        if ours.shape != ref.shape:
            table[name] = {"error": f"shape {ours.shape} vs {ref.shape}"}
            continue
        table[name] = {
            "shape": list(ref.shape),
            "rel_max_diff": float(np.abs(ours - ref).max()
                                  / max(np.abs(ref).max(), 1e-6)),
        }
    return table


# --------------------------------------------------------------------------
# Detector-stage executors (VERDICT r4 item 7): FPN / RPN / box head run in
# torch from the SAME state dict, each stage fed the torch reference's own
# input so a diff implicates only that stage's conversion. Same stance as
# the backbone: these are executors of reference weights, not
# reimplementations of reference code.
# --------------------------------------------------------------------------
_DETECTOR_ALIASES = [
    # lineage spellings -> canonical executor names (mirrors the accepted
    # patterns of utils/torch_weights._DETECTOR_RULES)
    (r"(?:fpn\.)?fpn_inner(\d)\.(weight|bias)", r"fpn.lateral\1.\2"),
    (r"(?:fpn\.)?fpn_output(\d)\.(weight|bias)", r"fpn.smooth\1.\2"),
    (r"rpn_conv\.(weight|bias)", r"rpn.conv.\1"),
    (r"(?:rpn\.objectness|rpn_cls_score)\.(weight|bias)", r"rpn.cls_score.\1"),
    (r"(?:rpn\.deltas|rpn_bbox_pred)\.(weight|bias)", r"rpn.bbox_pred.\1"),
    (r"(?:box_head\.)?fc6\.(weight|bias)", r"box_head.fc1.\1"),
    (r"(?:box_head\.)?fc7\.(weight|bias)", r"box_head.fc2.\1"),
    (r"^cls_score\.(weight|bias)", r"box_head.cls_score.\1"),
    (r"^bbox_pred\.(weight|bias)", r"box_head.bbox_pred.\1"),
]


def _normalize_detector_keys(sd: dict) -> dict:
    import re

    out = {}
    for k, v in sd.items():
        for pat, repl in _DETECTOR_ALIASES:
            k2 = re.sub(pat, repl, k)
            if k2 != k:
                k = k2
                break
        out[k] = v
    return out


def _rel_max_diff(ours: np.ndarray, ref: np.ndarray) -> float:
    return float(np.abs(ours - ref).max() / max(np.abs(ref).max(), 1e-6))


def detector_activation_diff(sd: dict, cfg, size: int = 64) -> dict:
    """Per-stage activation diff for FPN + RPN + box head: torch executes the
    source state dict, our Flax modules execute ``convert_detector_state_dict``
    output, both on identical inputs. Returns {stage: row} like
    ``activation_diff``; empty if the dict has no detector keys."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from detectron_tpu.models.fpn import FPN
    from detectron_tpu.models.heads import BoxHead, RPNHead
    from detectron_tpu.models.resnet import ResNet
    from detectron_tpu.utils.torch_weights import load_detector

    # mask head parity is covered module-for-module by
    # tests/test_torch_weights.py; VERDICT r4 item 7 scopes this executor to
    # FPN + RPN + box head
    sd = {k: v for k, v in _normalize_detector_keys(sd).items()
          if "mask" not in k}
    t = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
         for k, v in sd.items()}
    table = {}
    rng = np.random.RandomState(1)

    has_fpn = "fpn.lateral2.weight" in t
    has_rpn = "rpn.conv.weight" in t
    has_box = "box_head.fc1.weight" in t
    if not (has_fpn or has_rpn or has_box):
        return table

    ch = int(t["fpn.smooth2.weight"].shape[0]) if has_fpn else (
        int(t["rpn.conv.weight"].shape[1]) if has_rpn
        else cfg.model.fpn_channels)
    p_side = int(cfg.roi.pool_size)
    if has_box:
        fc_in = int(t["box_head.fc1.weight"].shape[1])
        p_side = int(round((fc_in / ch) ** 0.5))
    n_anchors = (int(t["rpn.bbox_pred.weight"].shape[0]) // 4
                 if has_rpn else 3)
    hidden = int(t["box_head.fc1.weight"].shape[0]) if has_box else 1024
    k_cls = int(t["box_head.cls_score.weight"].shape[0]) if has_box else 2
    nreg = (int(t["box_head.bbox_pred.weight"].shape[0]) // 4
            if has_box else k_cls)

    # Build a params tree covering every module the state dict provides and
    # run the REAL import path (load_detector), so the channel adapters
    # (rpn 2A softmax -> A sigmoid, fc1 CHW->HWC permute) are the ones
    # under test — not a reimplementation of them.
    key = jax.random.key(0)
    tree = {"params": {}}
    if _backbone_subdict(sd):
        bb = ResNet(depth=cfg.model.backbone, frozen_stages=0,
                    norm=cfg.model.norm)
        tree["params"]["backbone"] = bb.init(
            key, jnp.zeros((1, 64, 64, 3)))["params"]
    cins = ([int(t[f"fpn.lateral{l}.weight"].shape[1]) for l in range(2, 6)]
            if has_fpn else [256, 512, 1024, 2048])
    if has_fpn:
        dummy = {f"c{i + 2}": jnp.zeros((1, 32 // 2 ** i, 32 // 2 ** i, c))
                 for i, c in enumerate(cins)}  # cins reused below for inputs
        tree["params"]["fpn"] = FPN(channels=ch, levels="p2p6").init(
            key, dummy)["params"]
    if has_rpn:
        tree["params"]["rpn"] = RPNHead(
            num_anchors=n_anchors, channels=ch).init(
            key, jnp.zeros((1, 8, 8, ch)))["params"]
    if has_box:
        tree["params"]["box_head"] = BoxHead(
            num_classes=k_cls, hidden=hidden,
            class_agnostic=nreg == 1).init(
            key, jnp.zeros((1, 2, p_side, p_side, ch)))["params"]
    try:
        loaded = load_detector(tree, sd, pooled_hw=(p_side, p_side))["params"]
    except (KeyError, ValueError) as e:
        return {"detector": {"error": f"import failed: {e}"}}

    def flax_params(prefix: str):
        return {"params": loaded[prefix]}

    if has_fpn:
        # inputs: random c2..c5 at the lateral convs' own in-channels
        feats_t, feats_j = [], {}
        for i, cin in enumerate(cins):
            s = size // (4 * 2 ** i)
            x = rng.randn(1, cin, s, s).astype(np.float32)
            feats_t.append(torch.tensor(x))
            feats_j[f"c{i + 2}"] = jnp.asarray(x.transpose(0, 2, 3, 1))
        with torch.no_grad():
            lat = [
                F.conv2d(c, t[f"fpn.lateral{l}.weight"],
                         t[f"fpn.lateral{l}.bias"])
                for l, c in zip(range(2, 6), feats_t)
            ]
            tds = [lat[-1]]
            for x in reversed(lat[:-1]):
                tds.append(x + F.interpolate(tds[-1], scale_factor=2,
                                             mode="nearest"))
            tds = tds[::-1]
            ps = [
                F.conv2d(x, t[f"fpn.smooth{l}.weight"],
                         t[f"fpn.smooth{l}.bias"], padding=1)
                for l, x in zip(range(2, 6), tds)
            ]
            ps.append(F.max_pool2d(ps[-1], 1, 2))  # p6
        ours = FPN(channels=ch, levels="p2p6").apply(flax_params("fpn"),
                                                     feats_j)
        for i, (name, ref) in enumerate(zip(("p2", "p3", "p4", "p5", "p6"),
                                            ps)):
            o = np.asarray(ours[i]).transpose(0, 3, 1, 2)
            table[name] = {"shape": list(ref.shape),
                           "rel_max_diff": _rel_max_diff(o, ref.numpy())}

    if has_rpn:
        s = size // 16
        x = rng.randn(1, ch, s, s).astype(np.float32)
        with torch.no_grad():
            h = F.relu(F.conv2d(torch.tensor(x), t["rpn.conv.weight"],
                                t["rpn.conv.bias"], padding=1))
            cls = F.conv2d(h, t["rpn.cls_score.weight"],
                           t["rpn.cls_score.bias"])
            reg = F.conv2d(h, t["rpn.bbox_pred.weight"],
                           t["rpn.bbox_pred.bias"])
        if cls.shape[1] == 2 * n_anchors:
            # lineage 2A bg/fg softmax (bg block first): fg posterior
            bg, fg = cls[:, :n_anchors], cls[:, n_anchors:]
            ref_obj = torch.sigmoid(fg - bg).permute(0, 2, 3, 1).reshape(1, -1)
        else:
            ref_obj = torch.sigmoid(cls).permute(0, 2, 3, 1).reshape(1, -1)
        ref_reg = reg.permute(0, 2, 3, 1).reshape(1, -1, 4)
        logits, deltas = RPNHead(num_anchors=n_anchors, channels=ch).apply(
            flax_params("rpn"), jnp.asarray(x.transpose(0, 2, 3, 1)))
        table["rpn_obj"] = {
            "shape": list(ref_obj.shape),
            "rel_max_diff": _rel_max_diff(
                np.asarray(jax.nn.sigmoid(logits)), ref_obj.numpy()),
        }
        table["rpn_deltas"] = {
            "shape": list(ref_reg.shape),
            "rel_max_diff": _rel_max_diff(np.asarray(deltas), ref_reg.numpy()),
        }

    if has_box:
        x = rng.randn(4, ch, p_side, p_side).astype(np.float32)
        with torch.no_grad():
            h = F.relu(F.linear(torch.tensor(x).reshape(4, -1),
                                t["box_head.fc1.weight"],
                                t["box_head.fc1.bias"]))
            h = F.relu(F.linear(h, t["box_head.fc2.weight"],
                                t["box_head.fc2.bias"]))
            ref_cls = F.linear(h, t["box_head.cls_score.weight"],
                               t["box_head.cls_score.bias"])
            ref_reg = F.linear(h, t["box_head.bbox_pred.weight"],
                               t["box_head.bbox_pred.bias"])
        cls, reg = BoxHead(
            num_classes=k_cls, hidden=hidden, class_agnostic=nreg == 1,
        ).apply(flax_params("box_head"),
                jnp.asarray(x.transpose(0, 2, 3, 1))[None])
        table["box_cls"] = {
            "shape": list(ref_cls.shape),
            "rel_max_diff": _rel_max_diff(np.asarray(cls)[0],
                                          ref_cls.numpy()),
        }
        table["box_reg"] = {
            "shape": list(ref_reg.shape),
            "rel_max_diff": _rel_max_diff(
                np.asarray(reg)[0].reshape(4, -1), ref_reg.numpy()),
        }
    return table


def run_eval(args, extra_cfg: list) -> dict:
    """Drive the full eval.py path in-process with the checkpoint wired via
    cfg.model.weights (+ --no-restore): loader -> jitted predict ->
    unmapping -> paste/RLE -> COCO protocol -> eval_results.json."""
    import eval as eval_driver

    out_dir = args.out_dir or os.path.join(REPO, "parity_out")
    argv = ["eval.py", "--no-restore"]
    if args.config:
        argv += ["--config", args.config]
    if args.limit:
        argv += ["--limit", str(args.limit)]
    argv += ["--cfg",
             f"data.root={args.data_root}",
             f"data.val_split={args.split}",
             f"model.weights={args.weights}",
             f"output_dir={out_dir}"] + list(extra_cfg)
    old_argv = sys.argv
    try:
        sys.argv = argv
        eval_driver.main()
    finally:
        sys.argv = old_argv
    with open(os.path.join(out_dir, "eval_results.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help=".pth or .npz torch-layout state dict")
    ap.add_argument("--data-root", default="",
                    help="COCO-layout dataset root (annotations/ + split/)")
    ap.add_argument("--split", default="val2017")
    ap.add_argument("--config", default=None)
    ap.add_argument("--cfg", nargs="*", default=[])
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--act-size", type=int, default=64)
    ap.add_argument("--act-tol", type=float, default=2e-3)
    ap.add_argument("--expect-ap", type=float, default=None,
                    help="assert bbox AP within --ap-tol of this")
    ap.add_argument("--ap-tol", type=float, default=0.005)
    ap.add_argument("--skip-activations", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--platform", default="",
                    help="pin jax platform (e.g. cpu). The container's "
                         "sitecustomize ignores JAX_PLATFORMS, so tests "
                         "must pin through jax.config before device use")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache (same layout as bench.py / tests/conftest.py:
    # the CPU backend gets its own directory)
    cache = ".jax_cache_cpu" if args.platform == "cpu" else ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from detectron_tpu.config import get_config
    from detectron_tpu.utils.torch_weights import load_pth

    cfg = get_config(args.config, args.cfg)
    if args.weights.endswith(".npz"):
        sd = dict(np.load(args.weights))
    else:
        sd = load_pth(args.weights)
    print(f"parity: loaded {len(sd)} tensors from {args.weights}")

    summary = {"weights": args.weights, "ok": True}
    if not args.skip_activations:
        table = activation_diff(sd, cfg, size=args.act_size)
        det_table = detector_activation_diff(sd, cfg, size=args.act_size)
        if (table.get("skipped") == "no backbone keys in state dict"
                and det_table):
            table = {}  # head-only checkpoint: detector stages are the story
            # any OTHER backbone skip reason (torch load failure, missing
            # keys) stays in the table and fails the run — a full-detector
            # checkpoint whose backbone could not be verified must not
            # report ok=true on head stages alone
        table.update(det_table)
        summary["activations"] = table
        print(f"{'stage':<8}{'shape':<24}{'rel max |diff|':<16}verdict")
        for name, row in table.items():
            if "rel_max_diff" not in row:
                print(f"{name:<8}{row}")
                summary["ok"] = False
                continue
            ok = row["rel_max_diff"] < args.act_tol
            summary["ok"] &= ok
            print(f"{name:<8}{str(tuple(row['shape'])):<24}"
                  f"{row['rel_max_diff']:<16.2e}"
                  f"{'OK' if ok else 'FAIL (> %.0e)' % args.act_tol}")

    if not args.skip_eval:
        if not args.data_root:
            print("parity: --data-root not given; skipping eval stage")
        else:
            res = run_eval(args, args.cfg)
            summary["eval"] = {k: v for k, v in res.items()}
            for k, v in res.items():
                if isinstance(v, float):
                    print(f"  {k:<12} {v:.4f}")
            if args.expect_ap is not None:
                got = res.get("AP")
                ok = got is not None and abs(got - args.expect_ap) <= args.ap_tol
                summary["ok"] &= ok
                print(f"parity: AP {got} vs expected {args.expect_ap} "
                      f"(tol {args.ap_tol}): {'OK' if ok else 'FAIL'}")

    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
