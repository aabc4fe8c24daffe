#!/usr/bin/env python
"""Demo: run a detector on image files and write visualizations.

Equivalent of the reference's demo/vis scripts (SURVEY.md §4: "run a
checkpoint on sample images and draw boxes/masks"). Without --images, runs
on a synthetic sample so the demo works out of the box.

Usage:
  python demo.py --config configs/mask_rcnn_r50_fpn_coco.yaml \
      [--images a.jpg b.jpg] [--out /tmp/vis] [--no-restore]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--cfg", nargs="*", default=[])
    ap.add_argument("--images", nargs="*", default=[])
    ap.add_argument("--out", default="/tmp/detectron_tpu_demo")
    ap.add_argument("--no-restore", action="store_true")
    ap.add_argument("--score-threshold", type=float, default=0.5)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.data.transforms import preprocess_example
    from detectron_tpu.models.mask_rcnn import paste_masks_numpy
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.train import checkpoint as ckpt
    from detectron_tpu.utils.visualize import draw_detections

    cfg = get_config(args.config, args.cfg)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0))
    if not args.no_restore:
        # params-only restore (no need to reconstruct the train-time
        # optimizer structure; see checkpoint.restore_params)
        mgr = ckpt.make_manager(cfg.output_dir)
        params, step = ckpt.restore_params(mgr, params)
        if step is not None:
            print(f"restored step {step}")

    os.makedirs(args.out, exist_ok=True)
    predict = jax.jit(lambda p, b: det.predict_fn(p, b))

    if args.images:
        raws = []
        for path in args.images:
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(path)
            raws.append((os.path.basename(path), img[:, :, ::-1]))
    else:
        b = make_batch(np.random.RandomState(0), 2, cfg.data.image_size,
                       cfg.model.num_classes)
        mean = np.asarray(cfg.data.pixel_mean)
        std = np.asarray(cfg.data.pixel_std)
        raws = [
            (f"synthetic_{i}.jpg",
             np.clip(b["image"][i] * std + mean, 0, 255).astype(np.uint8))
            for i in range(2)
        ]

    for name, rgb in raws:
        ex = preprocess_example(
            rgb.astype(np.float32), np.zeros((0, 4), np.float32),
            np.zeros((0,), np.int32), cfg, train=False,
        )
        batch = {
            "image": jnp.asarray(ex["image"])[None],
            "image_hw": jnp.asarray(ex["image_hw"])[None],
        }
        dets, masks = predict(params, batch)
        scale = float(ex["image_hw"][0]) / rgb.shape[0]
        boxes = np.asarray(dets.boxes[0]) / max(scale, 1e-9)
        valid = np.asarray(dets.valid[0])
        full_masks = None
        if masks is not None:
            full_masks = paste_masks_numpy(
                np.asarray(masks[0]), boxes, valid, rgb.shape[:2],
                threshold=cfg.mask.paste_threshold,
            )
        vis = draw_detections(
            rgb, boxes, np.asarray(dets.scores[0]), np.asarray(dets.classes[0]),
            valid=valid, masks=full_masks,
            score_threshold=args.score_threshold,
        )
        out_path = os.path.join(args.out, name)
        cv2.imwrite(out_path, vis[:, :, ::-1])
        n = int((np.asarray(dets.scores[0]) >= args.score_threshold
                 )[valid].sum()) if valid.any() else 0
        print(f"{name}: {n} detections >= {args.score_threshold} -> {out_path}")


if __name__ == "__main__":
    main()
