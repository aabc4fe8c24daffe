"""Evaluator tests with hand-computed expectations (SURVEY.md §4)."""

import numpy as np

from detectron_tpu.eval.coco_eval import box_iou_matrix, evaluate, mask_iou_matrix
from detectron_tpu.eval.voc_eval import evaluate_voc, voc_ap


def gt(boxes, classes, ignore=None, masks=None):
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "classes": np.asarray(classes, np.int32),
        "ignore": np.asarray(ignore, bool) if ignore is not None else None,
        "masks": masks,
    }


def det(boxes, scores, classes, masks=None):
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "scores": np.asarray(scores, np.float32),
        "classes": np.asarray(classes, np.int32),
        "masks": masks,
    }


def test_perfect_detections_ap_one():
    g = [gt([[0, 0, 10, 10], [20, 20, 40, 40]], [1, 2])]
    d = [det([[0, 0, 10, 10], [20, 20, 40, 40]], [0.9, 0.8], [1, 2])]
    r = evaluate(g, d, num_classes=3)
    assert abs(r["AP"] - 1.0) < 1e-6
    assert abs(r["AP50"] - 1.0) < 1e-6


def test_missed_gt_halves_recall():
    # 2 gts of one class, only 1 detected perfectly -> AP ~ 0.5
    g = [gt([[0, 0, 10, 10], [20, 20, 30, 30]], [1, 1])]
    d = [det([[0, 0, 10, 10]], [0.9], [1])]
    r = evaluate(g, d, num_classes=2)
    # precision 1 up to recall 0.5, then 0 -> 101-pt AP ≈ 51/101
    assert abs(r["AP"] - 51 / 101) < 0.01


def test_false_positive_lowers_precision():
    g = [gt([[0, 0, 10, 10]], [1])]
    d = [det([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.95], [1, 1])]
    # higher-scored FP first: precision at recall>0 is 1/2
    r = evaluate(g, d, num_classes=2)
    assert abs(r["AP50"] - 0.5) < 0.01


def test_localization_quality_affects_high_iou_thresholds():
    # det overlaps gt with IoU ~0.6: counts at .5/.55/.6 but not above
    g = [gt([[0, 0, 10, 10]], [1])]
    d = [det([[0, 0, 10, 6.0]], [0.9], [1])]
    iou = box_iou_matrix(d[0]["boxes"], g[0]["boxes"])[0, 0]
    assert 0.55 < iou < 0.65
    r = evaluate(g, d, num_classes=2)
    assert abs(r["AP50"] - 1.0) < 1e-6
    assert r["AP75"] == 0.0
    n_pass = int(np.floor((iou - 0.5) / 0.05)) + 1
    assert abs(r["AP"] - n_pass / 10) < 0.01


def test_crowd_ignore_absorbs_detection():
    # a det on an ignore gt is neither TP nor FP
    g = [gt([[0, 0, 10, 10], [20, 20, 30, 30]], [1, 1], ignore=[True, False])]
    d = [det([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [1, 1])]
    r = evaluate(g, d, num_classes=2)
    assert abs(r["AP"] - 1.0) < 1e-6


def test_area_range_buckets():
    # small gt (16 area) and large gt (200^2)
    g = [gt([[0, 0, 4, 4], [100, 100, 300, 300]], [1, 1])]
    d = [det([[0, 0, 4, 4], [100, 100, 300, 300]], [0.9, 0.8], [1, 1])]
    r = evaluate(g, d, num_classes=2)
    assert abs(r["APs"] - 1.0) < 1e-6
    assert abs(r["APl"] - 1.0) < 1e-6


def test_mask_iou_and_segm_eval():
    m_gt = np.zeros((20, 20), bool)
    m_gt[0:10, 0:10] = True
    m_det_good = m_gt.copy()
    m_det_half = np.zeros((20, 20), bool)
    m_det_half[0:10, 0:5] = True
    iou = mask_iou_matrix([m_det_half], [m_gt])[0, 0]
    assert abs(iou - 0.5) < 1e-6
    g = [gt([[0, 0, 10, 10]], [1], masks=[m_gt])]
    d = [det([[0, 0, 10, 10]], [0.9], [1], masks=[m_det_good])]
    r = evaluate(g, d, num_classes=2, iou_type="segm")
    assert abs(r["AP"] - 1.0) < 1e-6


def test_voc_ap_metrics():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 0.5])
    # AUC: 0.5*1.0 + 0.5*0.5 = 0.75
    assert abs(voc_ap(recall, precision) - 0.75) < 1e-6
    # 11-point: r in {0,...,0.5} -> p=1 (6 pts), r in {0.6..1.0} -> 0.5 (5)
    want = (6 * 1.0 + 5 * 0.5) / 11
    assert abs(voc_ap(recall, precision, use_07_metric=True) - want) < 1e-6


def test_voc_eval_difficult_excluded():
    g = [
        {
            "boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32),
            "classes": np.array([1, 1]),
            "difficult": np.array([0, 1]),
        }
    ]
    d = [det([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [1, 1])]
    r = evaluate_voc(g, d, num_classes=2)
    # difficult gt doesn't count as positive; its detection is discarded
    assert abs(r["mAP"] - 1.0) < 1e-6


def test_voc_duplicate_detection_is_fp():
    g = [
        {
            "boxes": np.array([[0, 0, 10, 10]], np.float32),
            "classes": np.array([1]),
            "difficult": np.array([0]),
        }
    ]
    d = [det([[0, 0, 10, 10], [1, 0, 11, 10]], [0.9, 0.8], [1, 1])]
    r = evaluate_voc(g, d, num_classes=2)
    assert abs(r["mAP"] - 1.0) < 1e-6  # recall 1 at rank 1; dup FP after


def test_segm_eval_with_rle_masks():
    """evaluate(iou_type='segm') dispatches to the native RLE codec."""
    from detectron_tpu.native import RLE

    m_gt = np.zeros((20, 20), bool)
    m_gt[0:10, 0:10] = True
    g = [gt([[0, 0, 10, 10]], [1], masks=[RLE.encode(m_gt)])]
    d = [det([[0, 0, 10, 10]], [0.9], [1], masks=[RLE.encode(m_gt)])]
    r = evaluate(g, d, num_classes=2, iou_type="segm")
    assert abs(r["AP"] - 1.0) < 1e-6


def test_crowd_rle_absorbs_detection_in_segm_eval():
    """A detection fully inside a crowd RLE region is absorbed (ignored, not
    an FP) in segm eval — the COCO iscrowd rule with intersection/det-area
    IoU (VERDICT item 5; reference: pycocotools iscrowd matching)."""
    from detectron_tpu.native import RLE

    m_real = np.zeros((30, 30), bool)
    m_real[0:10, 0:10] = True
    m_crowd = np.zeros((30, 30), bool)
    m_crowd[15:30, 15:30] = True  # big crowd region
    m_det_in_crowd = np.zeros((30, 30), bool)
    m_det_in_crowd[18:24, 18:24] = True  # small det inside the crowd

    g = [gt([[0, 0, 10, 10], [15, 15, 30, 30]], [1, 1], ignore=[False, True],
            masks=[RLE.encode(m_real), RLE.encode(m_crowd)])]
    # the crowd det outranks the real one, so if NOT absorbed it is a
    # leading FP that caps precision at every recall point
    d = [det([[0, 0, 10, 10], [18, 18, 24, 24]], [0.8, 0.9], [1, 1],
             masks=[RLE.encode(m_real), RLE.encode(m_det_in_crowd)])]
    r = evaluate(g, d, num_classes=2, iou_type="segm")
    assert abs(r["AP"] - 1.0) < 1e-6  # crowd det absorbed, real det TP

    # with the crowd gt as an EMPTY mask (the old placeholder behavior) the
    # same detections would score AP < 1 (the crowd det becomes an FP)
    g_empty = [gt([[0, 0, 10, 10], [15, 15, 30, 30]], [1, 1],
                  ignore=[False, True],
                  masks=[RLE.encode(m_real),
                         RLE.encode(np.zeros((30, 30), bool))])]
    r2 = evaluate(g_empty, d, num_classes=2, iou_type="segm")
    assert r2["AP"] < 0.99


def test_segmentation_to_rle_formats(tmp_path):
    """segmentation_to_rle handles polygons, uncompressed RLE dicts, and
    compressed RLE strings, all agreeing on the decoded mask."""
    from detectron_tpu.data.coco import CocoDataset
    from detectron_tpu.native import RLE

    hw = (16, 16)
    mask = np.zeros(hw, bool)
    mask[4:12, 4:12] = True
    ref = RLE.encode(mask)

    # polygon raster (cv2.fillPoly is boundary-inclusive: 9x9 vs the 8x8
    # half-open slice) — check coverage, not exact pixels
    poly = [[4, 4, 12, 4, 12, 12, 4, 12]]
    pm = CocoDataset.segmentation_to_rle(poly, hw).decode()
    assert pm[mask].all() and 64 <= pm.sum() <= 81

    unc = {"size": [16, 16], "counts": ref.counts.tolist()}
    np.testing.assert_array_equal(
        CocoDataset.segmentation_to_rle(unc, hw).decode(), mask)

    comp = {"size": [16, 16], "counts": ref.to_string()}
    np.testing.assert_array_equal(
        CocoDataset.segmentation_to_rle(comp, hw).decode(), mask)

    assert CocoDataset.segmentation_to_rle(None, hw).area() == 0


# --------------------------------------------------------------------------
# Vectorized matcher vs the scalar pycocotools-style oracle loop
# --------------------------------------------------------------------------

def _match_image_oracle(det_scores, ious, gt_ignore, iou_thresholds, max_dets):
    """The original scalar triple loop (pycocotools evaluateImg semantics),
    kept verbatim as the oracle for the vectorized coco_eval._match_image."""
    gt_ignore = np.asarray(gt_ignore, bool)
    d = min(len(det_scores), max_dets)
    order = np.argsort(-det_scores, kind="stable")[:d]
    g_order = np.argsort(gt_ignore, kind="stable")  # real gts first
    t = len(iou_thresholds)
    g = ious.shape[1]
    matched = np.zeros((t, d), bool)
    ignored = np.zeros((t, d), bool)
    gt_used = np.zeros((t, g), bool)
    for ti, thr in enumerate(iou_thresholds):
        for di, dd in enumerate(order):
            best = min(thr, 1.0 - 1e-10)
            m = -1
            for gi in g_order:
                if gt_used[ti, gi] and not gt_ignore[gi]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[gi]:
                    break
                if ious[dd, gi] < best:
                    continue
                best = ious[dd, gi]
                m = gi
            if m == -1:
                continue
            if gt_ignore[m]:
                ignored[ti, di] = True
            else:
                matched[ti, di] = True
                gt_used[ti, m] = True
    n_valid = int((~gt_ignore).sum())
    return matched, ignored, order, n_valid


def test_vectorized_matcher_agrees_with_oracle():
    from detectron_tpu.eval.coco_eval import IOU_THRESHOLDS, _match_image

    rng = np.random.RandomState(0)
    for trial in range(200):
        n_det = rng.randint(0, 12)
        n_gt = rng.randint(0, 10)
        scores = rng.uniform(size=n_det)
        # quantized IoUs force plenty of exact ties to exercise the tie rule
        ious = np.round(rng.uniform(size=(n_det, n_gt)) * 8) / 8.0
        ignore = rng.uniform(size=n_gt) < 0.3
        max_dets = rng.choice([3, 100])
        got = _match_image(scores, ious, ignore, IOU_THRESHOLDS, max_dets)
        want = _match_image_oracle(scores, ious, ignore, IOU_THRESHOLDS, max_dets)
        for a, b, name in zip(got[:3], want[:3], ["matched", "ignored", "order"]):
            assert np.array_equal(a, b), (trial, name, a, b)
        assert got[3] == want[3]


def test_matcher_throughput():
    """The VERDICT bar: >=100 images/s/class on realistic per-image sizes."""
    import time

    from detectron_tpu.eval.coco_eval import IOU_THRESHOLDS, _match_image

    rng = np.random.RandomState(1)
    cases = [
        (rng.uniform(size=20), rng.uniform(size=(20, 8)),
         rng.uniform(size=8) < 0.2)
        for _ in range(300)
    ]
    t0 = time.perf_counter()
    for scores, ious, ignore in cases:
        _match_image(scores, ious, ignore, IOU_THRESHOLDS, 100)
    dt = time.perf_counter() - t0
    assert 300 / dt > 100, f"matcher too slow: {300 / dt:.0f} images/s/class"
