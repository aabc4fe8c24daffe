"""ResNet-50/101 backbone in Flax (NHWC), torchvision-compatible layout.

Equivalent of the reference backbone (reference: libs/nets/resnet.py —
torchvision-style Bottleneck blocks with frozen BatchNorm and frozen
conv1+res2 during fine-tune, SURVEY.md §2.2).

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU MXU);
  * BatchNorm is always *frozen*: a pure affine transform folded from
    pretrained statistics — no batch stats, no cross-replica sync, fully
    fusable into the preceding conv by XLA. Its params live in ``params``
    but are excluded from optimization by the trainable-mask in
    ``detectron_tpu.train.state`` (matching the reference's frozen-BN
    fine-tune semantics);
  * stage freezing is expressed with ``jax.lax.stop_gradient`` on the stage
    boundary (plus the optimizer mask), so XLA prunes the dead backward ops;
  * compute dtype configurable (bfloat16 inference path).

Module names mirror torchvision (``conv1``, ``bn1``, ``layer1..4``,
``layerN.<i>.conv1..3 / bn1..3 / downsample``) so the weight converter in
``detectron_tpu.utils.torch_weights`` is a pure name map.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    """BatchNorm frozen at (pretrained) statistics: y = (x - mean)/sqrt(var+eps)*w + b."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jax.lax.rsqrt(var + self.eps)
        bias = b - mean * scale
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
         dilation=1):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )


class StemConvS2D(nn.Module):
    """The ResNet 7x7/2 stem conv, reformulated space-to-depth.

    A 7x7 stride-2 convolution over 3 channels runs the MXU at ~2%
    occupancy (3 input channels against a 128-wide systolic dim) — it was
    5.2 ms of the bs=8 1024^2 train step (profiled). The classic MLPerf
    reformulation: zero-pad the kernel to 8x8 (one leading row/col),
    block the input 2x2 -> [H/2, W/2, 12], and run the EXACT same
    arithmetic as a 4x4 stride-1 conv with 12 input channels (the
    leading pad row multiplies the added zero taps, so results are
    identical up to float reassociation). The parameter keeps the
    reference [7, 7, 3, 64] layout, so torchvision weight import and
    checkpoints are unchanged.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, 3, self.features),
        )
        f = self.features
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # taps -4..3
        wb = (
            w8.reshape(4, 2, 4, 2, 3, f)
            .transpose(0, 2, 1, 3, 4, 5)  # (bh, bw, r, s, c, F)
            .reshape(4, 4, 12, f)
        )
        b, h, wd, c = x.shape
        xb = (
            x.reshape(b, h // 2, 2, wd // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, r, s, c)
            .reshape(b, h // 2, wd // 2, 4 * c)
        )
        # original pad (3,3): window rows 2i-4..2i+3 -> blocked rows
        # i-2..i+1 -> blocked pad (2, 1)
        return jax.lax.conv_general_dilated(
            xb.astype(self.dtype), wb.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def make_norm(kind: str, features: int, name: str, dtype):
    """Normalization factory: "frozen_bn" (reference fine-tune semantics) or
    "gn" (trainable GroupNorm-32, the train-from-scratch/GN variant). GN
    modules are named gn*/downsample_gn so `resnet_param_is_frozen`'s
    "bn"-substring rule keeps frozen-BN params out of the optimizer while
    GN scale/bias stay trainable."""
    if kind == "gn":
        return nn.GroupNorm(num_groups=32, dtype=dtype,
                            name=name.replace("bn", "gn"))
    return FrozenBatchNorm(features, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1, expansion 4."""

    features: int
    stride: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv(self.features, 1, 1, "conv1", self.dtype)(x)
        out = make_norm(self.norm, self.features, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features, 3, self.stride, "conv2", self.dtype,
                   dilation=self.dilation)(out)
        out = make_norm(self.norm, self.features, "bn2", self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features * 4, 1, 1, "conv3", self.dtype)(out)
        out = make_norm(self.norm, self.features * 4, "bn3", self.dtype)(out)
        if self.downsample:
            residual = conv(
                self.features * 4, 1, self.stride, "downsample_conv", self.dtype
            )(x)
            residual = make_norm(
                self.norm, self.features * 4, "downsample_bn", self.dtype
            )(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns feature maps {"c2", "c3", "c4", "c5"} (strides 4/8/16/32)."""

    depth: str = "resnet50"
    frozen_stages: int = 1  # 1 = freeze conv1 + res2 like the reference
    norm: str = "frozen_bn"  # frozen_bn | gn (trainable GroupNorm-32)
    stem: str = "conv"  # conv (7x7/2) | s2d (space-to-depth 4x4/12ch, exact)
    # a-trous res5 (the R-FCN paper trunk): stage 4 keeps stride 16 and
    # dilates its 3x3 convs by 2 — c5 comes out at c4's resolution. Weight
    # shapes are unchanged, so torchvision import works as-is.
    dilate_c5: bool = False
    # rematerialize non-frozen bottleneck blocks in the backward pass
    # (jax.checkpoint via nn.remat): stores only each block's input and
    # recomputes the three in-block activations when grads flow, trading
    # ~1.5x of the backbone's activation HBM for a second forward of the
    # block convs — the lever for larger train batches. Param tree is
    # unchanged (remat is transparent to params), so checkpoints and
    # torchvision import are unaffected. Frozen stages are never wrapped:
    # stop_gradient already prunes their backward, and remat's prevent_cse
    # would block XLA from eliding the pointless recompute.
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.depth]
        if self.stem == "s2d" and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = StemConvS2D(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv(64, 7, 2, "conv1", self.dtype)(x)
        x = make_norm(self.norm, 64, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        features = 64
        for stage, num_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.dilate_c5:
                # paper-faithful a trous (py-R-FCN lineage): stride 1 +
                # dilation 2 on EVERY res5 3x3 (torchvision's
                # replace_stride_with_dilation leaves the first block at
                # dilation 1; weights are identical either way)
                stride, dilation = 1, 2
            block_cls = (
                nn.remat(Bottleneck)
                if self.remat and stage + 1 > self.frozen_stages
                else Bottleneck
            )
            for i in range(num_blocks):
                x = block_cls(
                    features,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    norm=self.norm,
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            feats[f"c{stage + 2}"] = x
            features *= 2
        return feats


def resnet_param_is_frozen(path: Sequence[str], frozen_stages: int = 1) -> bool:
    """Trainable-mask helper: True for params the reference keeps frozen —
    all FrozenBatchNorm params, conv1/bn1, and stages <= frozen_stages."""
    flat = "/".join(str(p) for p in path)
    if "bn" in flat or "downsample_bn" in flat:
        return True
    if "conv1" in flat and "layer" not in flat:
        return True
    for stage in range(1, frozen_stages + 1):
        if f"layer{stage}_" in flat:
            return True
    return False
