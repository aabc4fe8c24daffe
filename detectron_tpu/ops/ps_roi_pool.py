"""Position-sensitive RoI pooling (R-FCN).

SURVEY.md §2.1 flags PSRoIPooling as a possible extra native op in the
reference's lineage (sibling repos of the same author ship it); provided
here for full capability coverage. Input features carry ``P*P`` channel
groups; output bin (i, j) average-pools *its own* group's channels over
the bin's spatial extent.

Implementation: the per-bin channel routing folds into the gather index —
features reshape to a ``[H*W*P*P, K]`` table and every sample point at
grid position (a, b) reads row ``pixel * P*P + (a//S)*P + (b//S)``, so the
whole op is 4 flat-table corner gathers over all ``P*S × P*S`` points at
once (the RoIAlign flat-gather pattern). The earlier formulation — a
static Python loop emitting 4 gathers per bin, 196 total — serialized on
device (rfcn 256² bench: 2.6 img/s) and its 1024² program crashed this
container's TPU compile worker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from detectron_tpu.ops.roi_align import _bilinear_1d, _sample_coords


def ps_roi_pool(
    feature: jnp.ndarray,  # [B, H, W, P*P*K]
    rois: jnp.ndarray,  # [B, R, 4]
    stride: int,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Returns [B, R, P, P, K]."""
    b, h, w, cin = feature.shape
    p, s = output_size, sampling_ratio
    assert cin % (p * p) == 0, "channels must be divisible by P*P"
    k = cin // (p * p)
    # [H*W*P*P, K] table: row pixel*P*P + group
    table = feature.reshape(b, h * w * p * p, k)
    # static per-grid-position group offset: point (a, b) of the P*S x P*S
    # sample grid belongs to bin (a//S, b//S) and reads channel group
    # (a//S)*P + (b//S)
    grid_group = (
        (np.arange(p * s)[:, None] // s) * p + np.arange(p * s)[None, :] // s
    )
    grid_group = jnp.asarray(grid_group, jnp.int32)  # [PS, PS]

    def per_image(tbl, rois_i):
        scale = 1.0 / stride
        x1 = rois_i[:, 0] * scale
        y1 = rois_i[:, 1] * scale
        rw = jnp.maximum(rois_i[:, 2] * scale - x1, 1.0)
        rh = jnp.maximum(rois_i[:, 3] * scale - y1, 1.0)
        xs = _sample_coords(x1, rw, p, s)  # [R, P*S]
        ys = _sample_coords(y1, rh, p, s)
        x0, x1i, wx0, wx1, xin = _bilinear_1d(xs, w)
        y0, y1i, wy0, wy1, yin = _bilinear_1d(ys, h)

        def corner(yi, xi, wy, wx):
            pix = yi[:, :, None] * w + xi[:, None, :]  # [R, PS, PS]
            row = pix * (p * p) + grid_group[None]
            vals = tbl[row.reshape(-1)].reshape(row.shape + (k,))
            return vals * (wy[:, :, None] * wx[:, None, :])[..., None]

        acc = (
            corner(y0, x0, wy0, wx0)
            + corner(y0, x1i, wy0, wx1)
            + corner(y1i, x0, wy1, wx0)
            + corner(y1i, x1i, wy1, wx1)
        )
        inb = (yin[:, :, None] & xin[:, None, :])[..., None]
        acc = jnp.where(inb, acc, 0.0)
        r = acc.shape[0]
        # bin average: mean over each bin's S x S sample block
        return acc.reshape(r, p, s, p, s, k).mean(axis=(2, 4))

    return jax.vmap(per_image)(table, rois)
