"""Detection heads: RPN, Fast R-CNN box head, mask head.

Equivalents of the reference's head modules (reference: RPN wiring and the
2xFC-1024 box head in libs/nets/model.py / maskrcnn.py; the 4xconv + deconv
mask head in libs/nets/maskrcnn.py; SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    """3x3 conv + sibling 1x1 convs (objectness logit + 4 deltas per anchor).

    Shared across FPN levels (call the same instance per level). The
    reference used a 2-way softmax for objectness; we use the equivalent
    single sigmoid logit.
    """

    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = nn.relu(
            nn.Conv(self.channels, (3, 3), padding="SAME", name="conv",
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01))(x)
        )
        logits = nn.Conv(
            self.num_anchors, (1, 1), name="objectness", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(t)
        deltas = nn.Conv(
            self.num_anchors * 4, (1, 1), name="deltas", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(t)
        b = x.shape[0]
        return logits.reshape(b, -1), deltas.reshape(b, -1, 4)


class BoxHead(nn.Module):
    """2x FC-1024 on pooled RoI features -> (cls logits K+1, box deltas).

    class_agnostic=False gives per-class regression (4*(K+1), the
    reference's layout with background row unused).
    """

    num_classes: int  # incl. background
    hidden: int = 1024
    class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, R, P, P, C]
        b, r = x.shape[0], x.shape[1]
        x = x.reshape(b, r, -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2", dtype=self.dtype)(x))
        cls = nn.Dense(
            self.num_classes, name="cls_score", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        nreg = 1 if self.class_agnostic else self.num_classes
        reg = nn.Dense(
            nreg * 4, name="bbox_pred", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return cls, reg.reshape(b, r, nreg, 4)


class MaskHead(nn.Module):
    """4x conv-256 + 2x deconv upsample + 1x1 -> K sigmoid masks (28x28).

    Input is 14x14 RoIAlign features; output [B, R, 28, 28, K-1] logits
    (foreground classes only, like the reference).
    """

    num_classes: int  # incl. background; output has num_classes-1 channels
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, R, 14, 14, C]
        b, r, h, w, c = x.shape
        x = x.reshape(b * r, h, w, c)
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding="SAME", name=f"conv{i}",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.variance_scaling(
                            2.0, "fan_out", "normal"))(x)
            )
        x = nn.relu(
            nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             name="deconv", dtype=self.dtype)(x)
        )
        x = nn.Conv(
            self.num_classes - 1, (1, 1), name="mask_logits", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return x.reshape(b, r, 2 * h, 2 * w, self.num_classes - 1)
