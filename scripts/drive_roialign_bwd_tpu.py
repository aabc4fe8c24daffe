"""Drive the Pallas RoIAlign BACKWARD kernel on the real TPU chip.

Interpret-mode tests can't catch Mosaic lowering issues or DMA bugs (an OOB
DMA wedges the chip for the whole process) — this validates the compiled
kernel against the jnp VJP on hardware before it ships in the fused path.

Run: python scripts/drive_roialign_bwd_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from detectron_tpu.ops.roi_align import multilevel_roi_align
from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.RandomState(0)
    b, c, base = 2, 256, 256
    feats = [jnp.asarray(rng.randn(b, base >> i, base >> i, c), jnp.float32)
             for i in range(4)]
    rois = np.array(
        [[10, 10, 60, 50], [0, 0, 200, 180], [0, 0, 900, 900],
         [-20, -20, 100, 90], [300, 300, 1000, 1000], [5, 5, 6.5, 8]],
        np.float32,
    )
    rois = jnp.asarray(np.stack([rois + 3.0 * i for i in range(b)]))
    ok = True
    for pool in (7, 14):
        g = jnp.asarray(rng.randn(b, rois.shape[1], pool, pool, c),
                        jnp.float32)
        got = multilevel_roi_align_pallas_bwd(
            g, feats, rois, strides=(4, 8, 16, 32), output_size=pool)
        _, vjp = jax.vjp(
            lambda f: multilevel_roi_align(
                list(f), rois, (4, 8, 16, 32), output_size=pool),
            tuple(feats),
        )
        want = vjp(g)[0]
        for li, (a, w) in enumerate(zip(got, want)):
            err = float(jnp.max(jnp.abs(a - w)))
            rel = err / max(float(jnp.max(jnp.abs(w))), 1e-9)
            status = "OK" if rel < 1e-3 else "FAIL"
            ok &= rel < 1e-3
            print(f"pool={pool} level={li}: max_abs_err={err:.3e} "
                  f"rel={rel:.3e} {status}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
