"""Data pipeline tests: transforms, config YAMLs, loader, adapters."""

import json
import os

import numpy as np
import pytest

from detectron_tpu.config import get_config
from detectron_tpu.data import transforms as T
from detectron_tpu.data.coco import CocoDataset, polygons_to_boxframe_mask
from detectron_tpu.data.loader import Loader
from detectron_tpu.data.voc import VocDataset


def test_resize_shortest_side_and_cap():
    img = np.zeros((200, 400, 3), np.uint8)
    out, scale = T.resize_shortest_side(img, 100, 1000)
    assert out.shape[:2] == (100, 200) and abs(scale - 0.5) < 1e-6
    # max_size cap kicks in
    out2, scale2 = T.resize_shortest_side(img, 300, 450)
    assert max(out2.shape[:2]) <= 450


def test_hflip_boxes():
    img = np.zeros((10, 20, 3), np.float32)
    boxes = np.array([[2.0, 1.0, 8.0, 5.0]])
    _, fb = T.hflip(img, boxes)
    np.testing.assert_allclose(fb, [[12.0, 1.0, 18.0, 5.0]])


def test_preprocess_example_static_shapes():
    cfg = get_config()
    cfg.data.image_size = (256, 256)
    cfg.data.short_side = 200
    cfg.data.max_size = 250
    cfg.train.max_gt_boxes = 10
    img = (np.random.RandomState(0).uniform(0, 255, (100, 150, 3))).astype(np.uint8)
    boxes = np.array([[10.0, 10.0, 50.0, 60.0]], np.float32)
    out = T.preprocess_example(img, boxes, np.array([3]), cfg, train=False)
    assert out["image"].shape == (256, 256, 3)
    assert out["gt_boxes"].shape == (10, 4)
    assert out["gt_classes"][0] == 3 and out["gt_classes"][1] == 0
    # scale capped by max_size: 250/150 = 5/3 (not short_side 200/100 = 2)
    s = 250 / 150
    np.testing.assert_allclose(
        out["gt_boxes"][0], np.array([10, 10, 50, 60]) * s, atol=1e-3
    )
    np.testing.assert_allclose(out["image_hw"], [round(100 * s), 250])


def test_scale_jitter_multi_scale_training():
    """train_scales jitters the resized content per example while the padded
    canvas (and therefore the compiled-program count) stays fixed
    (reference: TRAIN.SCALES multi-scale training; SURVEY.md §1 L4)."""
    cfg = get_config()
    cfg.data.image_size = (256, 256)
    cfg.data.short_side = 200
    cfg.data.train_scales = (100, 150, 200)
    cfg.data.max_size = 256
    cfg.data.hflip_prob = 0.0
    cfg.train.max_gt_boxes = 10
    img = np.full((100, 150, 3), 90, np.uint8)
    boxes = np.array([[10.0, 10.0, 50.0, 60.0]], np.float32)

    rng = np.random.RandomState(0)
    hw, canvas = set(), set()
    for _ in range(24):
        out = T.preprocess_example(img, boxes, np.array([3]), cfg,
                                   rng=rng, train=True)
        hw.add(tuple(int(v) for v in out["image_hw"]))
        canvas.add(out["image"].shape)
        # boxes scale with the image: box height / image height is invariant
        ih = out["image_hw"][0]
        np.testing.assert_allclose(
            (out["gt_boxes"][0, 3] - out["gt_boxes"][0, 1]) / ih,
            50.0 / 100.0, rtol=1e-2)
    assert canvas == {(256, 256, 3)}  # one compiled program
    assert len(hw) == 3  # all three scales drawn
    assert (100, 150) in hw and (150, 225) in hw

    # eval path ignores train_scales
    out = T.preprocess_example(img, boxes, np.array([3]), cfg,
                               rng=rng, train=False)
    assert tuple(int(v) for v in out["image_hw"]) == (171, 256)  # max_size cap


def test_polygon_rasterization():
    # square polygon covering left half of its gt box
    box = [0.0, 0.0, 20.0, 20.0]
    poly = [[0.0, 0.0, 10.0, 0.0, 10.0, 20.0, 0.0, 20.0]]
    m = polygons_to_boxframe_mask(poly, box, 28)
    assert m.shape == (28, 28)
    assert m[:, :13].mean() > 0.95 and m[:, 15:].mean() < 0.05


@pytest.fixture
def tiny_coco(tmp_path):
    import cv2

    root = tmp_path / "coco"
    (root / "val").mkdir(parents=True)
    imgs, anns = [], []
    for i in range(3):
        img = np.full((60 + 10 * i, 80, 3), 128, np.uint8)
        cv2.imwrite(str(root / "val" / f"{i:012d}.jpg"), img)
        imgs.append({"id": i, "file_name": f"{i:012d}.jpg",
                     "height": img.shape[0], "width": 80})
        anns.append({
            "id": i, "image_id": i, "category_id": 17 if i % 2 else 2,
            "bbox": [5, 5, 30, 20], "area": 600, "iscrowd": 0,
            "segmentation": [[5, 5, 35, 5, 35, 25, 5, 25]],
        })
    ann_dir = root / "annotations"
    ann_dir.mkdir()
    with open(ann_dir / "instances_val.json", "w") as f:
        json.dump({
            "images": imgs, "annotations": anns,
            "categories": [{"id": 2, "name": "car"}, {"id": 17, "name": "cat"}],
        }, f)
    return str(root)


def test_coco_dataset_and_loader(tiny_coco):
    ds = CocoDataset(tiny_coco, "val", with_masks=True)
    assert len(ds) == 3 and ds.num_classes == 3
    ex = ds.example(0)
    assert ex["image"].shape == (60, 80, 3)
    np.testing.assert_allclose(ex["boxes"][0], [5, 5, 35, 25])
    assert ex["classes"][0] == 1  # cat id 2 -> contiguous 1
    assert ex["masks"][0].mean() > 0.9  # box-filling polygon

    cfg = get_config()
    cfg.data.image_size = (128, 128)
    cfg.data.short_side = 100
    cfg.data.max_size = 128
    cfg.train.batch_size = 2
    cfg.train.max_gt_boxes = 5
    cfg.model.name = "mask_rcnn"
    loader = Loader(ds, cfg, train=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 3 images padded to 4
    b = batches[0]
    assert b["image"].shape == (2, 128, 128, 3)
    assert b["gt_masks"].shape == (2, 5, 28, 28)


@pytest.fixture
def tiny_voc(tmp_path):
    import cv2

    root = tmp_path / "voc"
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        (root / sub).mkdir(parents=True)
    xml = """<annotation><size><width>80</width><height>60</height><depth>3</depth></size>
    <object><name>dog</name><difficult>0</difficult>
      <bndbox><xmin>11</xmin><ymin>11</ymin><xmax>41</xmax><ymax>31</ymax></bndbox></object>
    <object><name>person</name><difficult>1</difficult>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox></object>
    </annotation>"""
    cv2.imwrite(str(root / "JPEGImages" / "000001.jpg"),
                np.full((60, 80, 3), 99, np.uint8))
    (root / "Annotations" / "000001.xml").write_text(xml)
    (root / "ImageSets" / "Main" / "test.txt").write_text("000001\n")
    return str(root)


def test_voc_dataset(tiny_voc):
    ds = VocDataset(tiny_voc, "test")
    assert len(ds) == 1 and ds.num_classes == 21
    ex = ds.example(0)
    # difficult object excluded from training boxes
    assert len(ex["boxes"]) == 1
    np.testing.assert_allclose(ex["boxes"][0], [10, 10, 40, 30])
    assert ex["classes"][0] == 12  # dog
    assert len(ex["all_boxes"]) == 2


def test_orientation_buckets(tiny_coco):
    """Portrait/landscape images land in separate fixed canvases."""
    import cv2

    # add a portrait image to the fixture dir
    cv2.imwrite(os.path.join(tiny_coco, "val", "000000000099.jpg"),
                np.full((160, 60, 3), 77, np.uint8))
    ann = json.load(open(os.path.join(tiny_coco, "annotations",
                                      "instances_val.json")))
    ann["images"].append({"id": 99, "file_name": "000000000099.jpg",
                          "height": 160, "width": 60})
    json.dump(ann, open(os.path.join(tiny_coco, "annotations",
                                     "instances_val.json"), "w"))

    cfg = get_config()
    cfg.data.image_size = (96, 128)
    cfg.data.orientation_buckets = True
    cfg.data.short_side = 60
    cfg.data.max_size = 128
    cfg.train.batch_size = 1
    cfg.train.max_gt_boxes = 5
    ds = CocoDataset(tiny_coco, "val")
    shapes = {tuple(b["image"].shape[1:3])
              for b in Loader(ds, cfg, train=False, num_workers=1)}
    assert shapes == {(96, 128), (128, 96)}


def test_multihost_loader_shards_are_disjoint(tiny_coco):
    """Each process's Loader slice is disjoint; the union covers the dataset
    (multi-host data parallelism, SURVEY.md §5.8 — simulated by running the
    per-host loaders of a 2-process job in one test)."""
    ds = CocoDataset(tiny_coco, "val")
    cfg = get_config()
    cfg.data.image_size = (128, 128)
    cfg.data.short_side = 100
    cfg.data.max_size = 128
    cfg.train.batch_size = 2  # global; 1 per host
    cfg.train.max_gt_boxes = 5

    # eval mode: strided split, terminating
    ids = []
    for rank in range(2):
        got = set()
        for b in Loader(ds, cfg, train=False, num_workers=1,
                        process_shard=(rank, 2)):
            assert b["image"].shape[0] == 1  # local batch = global/2
            got.update(int(i) for i in b["_image_id"])
        ids.append(got)
    assert ids[0] & ids[1] == set()
    assert ids[0] | ids[1] == {0, 1, 2}

    # train mode: identical seeded permutation, per-host stride; the first
    # epoch's examples across hosts tile the dataset exactly
    seen = []
    for rank in range(2):
        it = iter(Loader(ds, cfg, train=True, seed=3, num_workers=1,
                         process_shard=(rank, 2)))
        n_epoch = (len(ds) + (1 - rank)) // 2  # host0: 2 of 3, host1: 1
        got = [int(next(it)["_image_id"][0]) for _ in range(n_epoch)]
        seen.append(set(got))
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == {0, 1, 2}
