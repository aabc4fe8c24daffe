"""A/B exact top_k vs approx_max_k candidate selection on the REAL TPU.

The CPU test (tests/test_models.py::test_retinanet_exact_vs_approx_topk_
same_detections) is vacuous on CPU where approx lowers to exact; this script
replays the comparison on the real chip, where `lax.approx_max_k` uses the
TPU-specific partial-reduction algorithm (recall target 0.99), and reports
whether the final detection sets differ.

Run: python scripts/drive_topk_ab.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.config import get_config
from detectron_tpu.models import retinanet as retina


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = get_config()
    cfg.model.num_classes = 5
    k = cfg.model.num_classes - 1
    cfg.retinanet.pre_nms_topk = 100
    gen = retina.retinanet_anchor_generator(cfg)
    anchors_pl = gen.grid_anchors((128, 128))
    rng = np.random.RandomState(7)
    outs = []
    for hw_l in [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]:
        cls_l = rng.normal(-8.0, 0.5, (1, *hw_l, 9 * k)).astype(np.float32)
        box_l = rng.normal(0.0, 0.1, (1, *hw_l, 9 * 4)).astype(np.float32)
        outs.append((jnp.asarray(cls_l), jnp.asarray(box_l)))
    for _ in range(30):
        li = rng.randint(3)
        c, b = outs[li]
        h, w = c.shape[1:3]
        c = c.at[0, rng.randint(h), rng.randint(w), rng.randint(9 * k)].set(
            float(rng.uniform(2.0, 6.0)))
        outs[li] = (c, b)
    hw = jnp.array([[128.0, 128.0]])

    results = {}
    for exact in (True, False):
        cfg.retinanet.exact_topk = exact
        d = jax.jit(
            lambda o, h: retina.retinanet_inference(o, anchors_pl, h, cfg)
        )(outs, hw)
        v = np.asarray(d.valid[0])
        order = np.lexsort((np.asarray(d.boxes[0])[v][:, 0],
                            -np.asarray(d.scores[0])[v]))
        results[exact] = (np.asarray(d.boxes[0])[v][order],
                         np.asarray(d.scores[0])[v][order],
                         np.asarray(d.classes[0])[v][order])

    ne, na = len(results[True][1]), len(results[False][1])
    print(f"exact dets: {ne}, approx dets: {na}")
    same = ne == na and all(
        np.allclose(a, b, atol=1e-6)
        for a, b in zip(results[True], results[False])
    )
    print("IDENTICAL detection sets" if same else "DIFFER:")
    if not same:
        for name, r in (("exact", results[True]), ("approx", results[False])):
            print(name, "scores:", np.round(r[1], 4))
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
