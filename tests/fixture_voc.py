"""Deterministic Pascal-VOC-layout fixture dataset generator.

Mirrors tests/fixture_coco.py for the VOC path (reference: the
VOC2007-layout trees consumed by libs/datasets/ adapters): JPEGImages/,
Annotations/*.xml with 1-based inclusive boxes and `difficult` flags, and
ImageSets/Main/test.txt. Synthesized at test time so the repo stays
text-only.
"""

from __future__ import annotations

import os

import numpy as np

# (height, width) per image
IMAGE_SIZES = [(120, 160), (160, 120), (128, 128), (100, 140)]
# class names must come from detectron_tpu.data.voc.VOC_CLASSES
CLASS_NAMES = ("person", "car", "dog")

_XML = """<annotation>
  <filename>{fid}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
{objects}</annotation>
"""

_OBJ = """  <object>
    <name>{name}</name>
    <difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
"""


def objects_for_image(i, h, w):
    """Deterministic rectangles; object j=0 of every other image is
    difficult (must be excluded from the AP protocol)."""
    rng = np.random.RandomState(200 + i)
    n = 1 + i % 3
    objs = []
    for j in range(n):
        bw = int(rng.randint(w // 5, w // 2))
        bh = int(rng.randint(h // 5, h // 2))
        x = int(rng.randint(0, w - bw))
        y = int(rng.randint(0, h - bh))
        name = CLASS_NAMES[(i + j) % len(CLASS_NAMES)]
        difficult = 1 if (j == 0 and i % 2 == 1) else 0
        objs.append((x, y, bw, bh, name, difficult))
    return objs


def make_fixture(root: str) -> str:
    import cv2

    img_dir = os.path.join(root, "JPEGImages")
    ann_dir = os.path.join(root, "Annotations")
    set_dir = os.path.join(root, "ImageSets", "Main")
    for d in (img_dir, ann_dir, set_dir):
        os.makedirs(d, exist_ok=True)

    ids = []
    for i, (h, w) in enumerate(IMAGE_SIZES):
        fid = f"{i:06d}"
        ids.append(fid)
        img = np.full((h, w, 3), 80, np.uint8)
        objects = []
        for (x, y, bw, bh, name, difficult) in objects_for_image(i, h, w):
            img[y : y + bh, x : x + bw] = (40 * (1 + len(objects))) % 255
            # 1-based inclusive VOC coords
            objects.append(_OBJ.format(
                name=name, difficult=difficult,
                x1=x + 1, y1=y + 1, x2=x + bw, y2=y + bh,
            ))
        cv2.imwrite(os.path.join(img_dir, fid + ".jpg"), img)
        with open(os.path.join(ann_dir, fid + ".xml"), "w") as f:
            f.write(_XML.format(fid=fid, h=h, w=w, objects="".join(objects)))
    with open(os.path.join(set_dir, "test.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return root
