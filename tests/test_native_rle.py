"""Native C++ RLE codec tests (encode/decode roundtrip, area, IoU, merge,
COCO string form) against dense numpy references."""

import numpy as np
import pytest

from detectron_tpu.native import RLE, have_native, rle_iou, rle_merge


def random_mask(rng, h, w, p=0.3):
    return (rng.uniform(size=(h, w)) < p).astype(np.uint8)


def test_native_library_builds():
    assert have_native(), "g++ build of rle.cpp failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_and_area(seed):
    rng = np.random.RandomState(seed)
    m = random_mask(rng, 37, 53)
    r = RLE.encode(m)
    np.testing.assert_array_equal(r.decode(), m.astype(bool))
    assert r.area() == int(m.sum())


def test_empty_and_full():
    z = np.zeros((10, 7), np.uint8)
    f = np.ones((10, 7), np.uint8)
    assert RLE.encode(z).area() == 0
    assert RLE.encode(f).area() == 70
    np.testing.assert_array_equal(RLE.encode(z).decode(), z.astype(bool))
    np.testing.assert_array_equal(RLE.encode(f).decode(), f.astype(bool))


def test_iou_matches_dense():
    rng = np.random.RandomState(3)
    a = [RLE.encode(random_mask(rng, 40, 40)) for _ in range(4)]
    b = [RLE.encode(random_mask(rng, 40, 40)) for _ in range(3)]
    got = rle_iou(a, b)
    for i in range(4):
        ma = a[i].decode()
        for j in range(3):
            mb = b[j].decode()
            inter = np.logical_and(ma, mb).sum()
            union = np.logical_or(ma, mb).sum()
            want = inter / max(union, 1e-9)
            assert abs(got[i, j] - want) < 1e-9


def test_iou_crowd_rule():
    big = np.zeros((20, 20), np.uint8)
    big[:10] = 1  # 200 px
    small = np.zeros((20, 20), np.uint8)
    small[:5, :10] = 1  # 50 px, fully inside big
    a = [RLE.encode(small)]
    b = [RLE.encode(big)]
    # crowd: inter / area(a) = 50/50 = 1
    assert abs(rle_iou(a, b, iscrowd=[1])[0, 0] - 1.0) < 1e-9
    assert abs(rle_iou(a, b, iscrowd=[0])[0, 0] - 50 / 200) < 1e-9


def test_merge():
    rng = np.random.RandomState(4)
    m1, m2 = random_mask(rng, 25, 30), random_mask(rng, 25, 30)
    u = rle_merge(RLE.encode(m1), RLE.encode(m2))
    i = rle_merge(RLE.encode(m1), RLE.encode(m2), intersect=True)
    np.testing.assert_array_equal(u.decode(), np.logical_or(m1, m2))
    np.testing.assert_array_equal(i.decode(), np.logical_and(m1, m2))


def test_coco_string_roundtrip():
    rng = np.random.RandomState(5)
    m = random_mask(rng, 64, 48)
    r = RLE.encode(m)
    s = r.to_string()
    assert isinstance(s, str) and len(s) > 0
    r2 = RLE.from_string(s, 64, 48)
    np.testing.assert_array_equal(r.counts, r2.counts)
    np.testing.assert_array_equal(r2.decode(), m.astype(bool))


def test_coco_string_known_value():
    # canonical LEB-ish encoding sanity: a simple 2-run mask
    m = np.zeros((3, 2), np.uint8)
    m[2, 1] = 1  # column-major: 5 zeros then 1 one
    r = RLE.encode(m)
    assert list(r.counts) == [5, 1]
    r2 = RLE.from_string(r.to_string(), 3, 2)
    assert list(r2.counts) == [5, 1]
