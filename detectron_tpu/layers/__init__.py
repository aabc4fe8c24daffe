"""Per-iteration detection layers (target assignment, proposals, sampling).

These are the reference's ``libs/layers/`` equivalents, redesigned as
static-shape, vmapped, on-device ops (SURVEY.md §1 L2).
"""

from detectron_tpu.layers.anchor_target import (  # noqa: F401
    AnchorTargets,
    anchor_target,
    anchor_target_single,
)
