"""Anchor generation golden tests (SURVEY.md §4: canonical 9-anchor table)."""

import numpy as np

from detectron_tpu.ops import anchors as anchor_ops

# The canonical py-faster-rcnn 9-anchor table for base 16, ratios (.5,1,2),
# scales (8,16,32), legacy +1 convention — printed by the reference's
# generate_anchors smoke main (reference: libs/boxes/anchor.py __main__).
GOLDEN_9 = np.array(
    [
        [-84.0, -40.0, 99.0, 55.0],
        [-176.0, -88.0, 191.0, 103.0],
        [-360.0, -184.0, 375.0, 199.0],
        [-56.0, -56.0, 71.0, 71.0],
        [-120.0, -120.0, 135.0, 135.0],
        [-248.0, -248.0, 263.0, 263.0],
        [-36.0, -80.0, 51.0, 95.0],
        [-80.0, -168.0, 95.0, 183.0],
        [-168.0, -344.0, 183.0, 359.0],
    ]
)


def test_golden_nine_anchor_table():
    got = anchor_ops.generate_base_anchors(
        base_size=16, ratios=(0.5, 1.0, 2.0), scales=(8.0, 16.0, 32.0), offset=1.0
    )
    np.testing.assert_allclose(got, GOLDEN_9, atol=1e-4)


def test_modern_anchors_centered_and_area():
    got = anchor_ops.generate_base_anchors(16, ratios=(1.0,), scales=(8.0,))
    (a,) = got
    w, h = a[2] - a[0], a[3] - a[1]
    assert abs(w - 128.0) < 1e-4 and abs(h - 128.0) < 1e-4
    # centered on the cell center (base_size/2 = 8 with offset 0... center at 8)
    cx, cy = (a[0] + a[2]) / 2, (a[1] + a[3]) / 2
    assert abs(cx - 8.0) < 1e-4 and abs(cy - 8.0) < 1e-4


def test_shift_anchors_layout():
    base = anchor_ops.generate_base_anchors(16, ratios=(1.0,), scales=(1.0,))
    grid = anchor_ops.shift_anchors(base, stride=16, height=2, width=3)
    assert grid.shape == (6, 4)
    # row-major (y, x): second anchor is shifted by stride in x
    np.testing.assert_allclose(grid[1] - grid[0], [16, 0, 16, 0])
    # fourth anchor (start of second row) is shifted by stride in y
    np.testing.assert_allclose(grid[3] - grid[0], [0, 16, 0, 16])


def test_generator_counts_rpn_and_retinanet():
    rpn = anchor_ops.AnchorGenerator(
        strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0), base_scale=8.0
    )
    per_level = rpn.grid_anchors((256, 256))
    sizes = [a.shape[0] for a in per_level]
    assert sizes == [64 * 64 * 3, 32 * 32 * 3, 16 * 16 * 3, 8 * 8 * 3, 4 * 4 * 3]

    retina = anchor_ops.AnchorGenerator(
        strides=(8, 16, 32, 64, 128),
        ratios=(0.5, 1.0, 2.0),
        octave_scales=(1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
        base_scale=4.0,
    )
    assert retina.num_anchors_per_cell == 9
    a3 = retina.base_anchors_for_level(8)
    # middle anchor of ratio 1.0, octave 0 has side base_scale*stride = 32
    sides = a3[:, 2] - a3[:, 0]
    areas = sides * (a3[:, 3] - a3[:, 1])
    assert np.isclose(sorted(areas)[0], 32.0 * 32.0, rtol=1e-5)


def test_nonsquare_image_grid():
    gen = anchor_ops.AnchorGenerator(strides=(32,), ratios=(1.0,), base_scale=1.0)
    anchors = gen.all_anchors((160, 96))  # 5 x 3 grid
    assert anchors.shape == (15, 4)
