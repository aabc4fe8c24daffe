"""Compiled-kernel smoke on the REAL TPU chip (VERDICT r1 weak #7).

CI (tests/) pins CPU and exercises Pallas kernels in interpret mode only —
a Mosaic lowering regression would pass all tests. This driver compiles and
runs every hardware-only path on small shapes (minutes, cached afterwards)
and asserts against the jnp oracles ON DEVICE:

  1. greedy NMS: tiled == fixpoint == loop == Pallas kernel keep sets;
  2. RoIAlign forward: gather == windowed == Pallas kernel (bit tolerance);
  3. RoIAlign backward: Pallas scatter-add kernel == jnp VJP;
  4. a tiny fused-flags Mask R-CNN predict step runs finite.

Run: python scripts/tpu_smoke.py    (exits nonzero on any mismatch)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def check_nms():
    from detectron_tpu.ops.nms import nms_numpy, nms_padded
    from detectron_tpu.ops.nms_pallas import nms_pallas

    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 150, (512, 2))
    wh = rng.uniform(5, 60, (512, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(size=512).astype(np.float32)
    want = nms_numpy(np.concatenate([boxes, scores[:, None]], 1), 0.5)
    b, s = jnp.asarray(boxes), jnp.asarray(scores)
    for name, fn in [
        ("tiled", lambda: nms_padded(b, s, 0.5, 512, algo="tiled")),
        ("fixpoint", lambda: nms_padded(b, s, 0.5, 512, algo="fixpoint")),
        ("loop", lambda: nms_padded(b, s, 0.5, 512, algo="loop")),
        ("pallas", lambda: nms_pallas(b, s, 0.5, 512)),
    ]:
        idx, valid = jax.jit(fn)()
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == want, f"NMS[{name}] keep set mismatch"
        print(f"nms[{name}]: ok ({len(got)} kept)")


def check_roialign():
    from detectron_tpu.ops.roi_align import (
        multilevel_roi_align, multilevel_roi_align_windowed)
    from detectron_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_pallas, multilevel_roi_align_pallas_bwd)

    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(1, s, s, 128), jnp.float32)
             for s in (64, 32, 16, 8)]
    rois = rng.uniform(8, 180, (1, 32, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(16, 60, (1, 32, 2))
    # band-top elongated boxes: exact only via span-aware level promotion
    rois[0, 0] = [20.0, 10.0, 200.0, 60.0]
    rois[0, 1] = [10.0, 30.0, 40.0, 250.0]
    rois[0, 2] = [5.0, 120.0, 250.0, 140.0]
    rois = jnp.asarray(rois)
    strides = (4, 8, 16, 32)

    ref = jax.jit(lambda f, r: multilevel_roi_align(f, r, list(strides)))(
        feats, rois)
    win = jax.jit(lambda f, r: multilevel_roi_align_windowed(
        f, r, list(strides)))(feats, rois)
    pal = jax.jit(lambda f, r: multilevel_roi_align_pallas(
        f, r, strides=strides))(list(feats), rois)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
    print("roialign fwd [gather == windowed == pallas]: ok")

    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    _, vjp = jax.vjp(
        lambda f: multilevel_roi_align(list(f), rois, list(strides)),
        tuple(feats))
    want = vjp(g)[0]
    got = jax.jit(lambda gg, f, r: multilevel_roi_align_pallas_bwd(
        gg, f, r, strides=strides))(g, list(feats), rois)
    for w, o in zip(want, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)
    print("roialign bwd [pallas scatter-add == jnp VJP]: ok")

    # hazard stress for the pipelined backward: a dense cluster of mutually
    # overlapping RoIs (every consecutive pair aliases -> the write-back of
    # program n-1 MUST land before program n reads; a race shows up as a
    # lost accumulation). Plus a few disjoint ones to exercise the
    # no-hazard fast path in the same launch.
    ov = rng.uniform(40, 60, (1, 48, 4)).astype(np.float32)
    ov[..., 2:] = ov[..., :2] + rng.uniform(30, 50, (1, 48, 2))
    ov[0, -4:] = [[8, 8, 40, 40], [160, 8, 200, 40],
                  [8, 160, 40, 200], [160, 160, 200, 200]]
    ov = jnp.asarray(ov)
    g2 = jnp.asarray(rng.randn(1, 48, *ref.shape[2:]), jnp.float32)
    _, vjp2 = jax.vjp(
        lambda f: multilevel_roi_align(list(f), ov, list(strides)),
        tuple(feats))
    want2 = vjp2(g2)[0]
    got2 = jax.jit(lambda gg, f, r: multilevel_roi_align_pallas_bwd(
        gg, f, r, strides=strides))(g2, list(feats), ov)
    for w, o in zip(want2, got2):
        np.testing.assert_allclose(np.asarray(o), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)
    print("roialign bwd [overlap hazard stress]: ok")

    # the matmul-free schedule (d_win precomputed in XLA) must produce the
    # same scatter-add, including under the overlap hazard stress
    got3 = jax.jit(lambda gg, f, r: multilevel_roi_align_pallas_bwd(
        gg, f, r, strides=strides, matmul_order="xla"))(g2, list(feats), ov)
    for w, o in zip(want2, got3):
        np.testing.assert_allclose(np.asarray(o), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)
    print("roialign bwd [matmul_order=xla == jnp VJP, hazard stress]: ok")


def check_fused_predict():
    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = "mask_rcnn"
    cfg.model.dtype = "bfloat16"
    cfg.model.fused_nms = "on"
    cfg.model.fused_roi_align = "on"
    cfg.model.fpn_channels = 256
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (256, 256))
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        np.random.RandomState(0), 1, (256, 256), cfg.model.num_classes
    ).items() if k not in ("gt_boxes", "gt_classes", "gt_masks")}
    dets, masks = jax.jit(lambda p, b: det.predict_fn(p, b))(params, batch)
    assert np.isfinite(np.asarray(dets.scores)).all()
    assert np.isfinite(np.asarray(masks, dtype=np.float32)).all()
    print("fused-flags predict step: finite ok")


def main():
    plat = jax.devices()[0].platform
    print("platform:", plat, jax.devices()[0])
    if plat != "tpu":
        print("NOT a TPU — this smoke only means something on hardware")
        sys.exit(2)
    check_nms()
    check_roialign()
    check_fused_predict()
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
