"""detectron_tpu: a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
CharlesShang/Detectron-PYTORCH (Faster R-CNN, Mask R-CNN, RetinaNet with
ResNet-50/101 + FPN backbones on COCO/VOC), built TPU-first:

* every per-iteration detection stage (anchor/proposal targets, proposal
  generation, NMS, RoIAlign, detection post-processing) is a static-shape,
  padded, on-device op traced into a single compiled XLA program;
* hot gather-heavy primitives (RoIAlign, NMS suppression) have Pallas TPU
  kernels;
* scaling is expressed with `jax.sharding.Mesh` + `jit`-with-shardings data
  parallelism over ICI, not host-side replicate/scatter loops.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
