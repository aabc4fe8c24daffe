"""Feature Pyramid Network neck.

Equivalent of the reference's pyramid module (reference: libs/nets/ FPN code
in the model files, SURVEY.md §2.2): lateral 1x1 -> 256ch, top-down x2
nearest upsample + add, 3x3 smoothing conv -> P2..P5. Extra levels:
  * two-stage (Faster/Mask R-CNN): P6 = stride-2 max-pool of P5;
  * RetinaNet: P6 = 3x3/2 conv on C5, P7 = 3x3/2 conv on relu(P6).

Nearest upsample is expressed as a broadcast-reshape (no resize gather), which
XLA fuses with the add.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Input: {"c2".."c5"}; output: list of pyramid levels, finest first.

    levels: "p2p6" (two-stage RPN) or "p3p7" (RetinaNet).
    """

    channels: int = 256
    levels: str = "p2p6"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict) -> list:
        cs = [feats["c2"], feats["c3"], feats["c4"], feats["c5"]]
        lateral = [
            nn.Conv(self.channels, (1, 1), name=f"lateral{i + 2}", dtype=self.dtype)(c)
            for i, c in enumerate(cs)
        ]
        # top-down pathway
        tds = [lateral[-1]]
        for lat in reversed(lateral[:-1]):
            tds.append(lat + upsample2x_nearest(tds[-1]))
        tds = tds[::-1]  # finest first: [p2', p3', p4', p5']
        ps = [
            nn.Conv(
                self.channels, (3, 3), padding="SAME", name=f"smooth{i + 2}",
                dtype=self.dtype,
            )(t)
            for i, t in enumerate(tds)
        ]
        if self.levels == "p2p6":
            p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
            return ps + [p6]  # [P2, P3, P4, P5, P6]
        elif self.levels == "p3p7":
            p6 = nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding="SAME", name="p6",
                dtype=self.dtype,
            )(feats["c5"])
            p7 = nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding="SAME", name="p7",
                dtype=self.dtype,
            )(nn.relu(p6))
            return ps[1:] + [p6, p7]  # [P3, P4, P5, P6, P7]
        raise ValueError(self.levels)
