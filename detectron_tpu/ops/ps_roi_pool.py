"""Position-sensitive RoI pooling (R-FCN).

SURVEY.md §2.1 flags PSRoIPooling as a possible extra native op in the
reference's lineage (sibling repos of the same author ship it); provided
here for full capability coverage. Input features carry ``P*P`` channel
groups; output bin (i, j) average-pools *its own* group's channels over the
bin's spatial extent — implemented as a static unrolled loop over the P*P
bins, each a small bilinear-sampled gather (same machinery as RoIAlign).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    flat = feature.reshape(b, h * w, cin)

    def per_image(feat_flat, rois_i):
        scale = 1.0 / stride
        x1 = rois_i[:, 0] * scale
        y1 = rois_i[:, 1] * scale
        rw = jnp.maximum(rois_i[:, 2] * scale - x1, 1.0)
        rh = jnp.maximum(rois_i[:, 3] * scale - y1, 1.0)
        xs = _sample_coords(x1, rw, p, s)  # [R, P*S]
        ys = _sample_coords(y1, rh, p, s)
        x0, x1i, wx0, wx1, xin = _bilinear_1d(xs, w)
        y0, y1i, wy0, wy1, yin = _bilinear_1d(ys, h)

        outs = []
        for bi in range(p):
            for bj in range(p):
                c0 = (bi * p + bj) * k
                ysl = slice(bi * s, (bi + 1) * s)
                xsl = slice(bj * s, (bj + 1) * s)

                def corner(yi, xi, wy, wx):
                    idx = yi[:, ysl, None] * w + xi[:, None, xsl]  # [R,S,S]
                    vals = feat_flat[idx.reshape(-1), c0 : c0 + k].reshape(
                        idx.shape + (k,)
                    )
                    return vals * (wy[:, ysl, None] * wx[:, None, xsl])[..., None]

                acc = (
                    corner(y0, x0, wy0, wx0)
                    + corner(y0, x1i, wy0, wx1)
                    + corner(y1i, x0, wy1, wx0)
                    + corner(y1i, x1i, wy1, wx1)
                )
                inb = (yin[:, ysl, None] & xin[:, None, xsl])[..., None]
                acc = jnp.where(inb, acc, 0.0)
                outs.append(jnp.mean(acc, axis=(1, 2)))  # [R, K]
        out = jnp.stack(outs, axis=1)  # [R, P*P, K]
        return out.reshape(-1, p, p, k)

    return jax.vmap(per_image)(flat, rois)
