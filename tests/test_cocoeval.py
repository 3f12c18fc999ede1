"""The vendored COCO bbox metric (eval/cocoeval.py) against analytically
known values: exact-match AP, score-ordered FP penalties, IoU-threshold
cutoffs, crowd/area/maxDet ignore rules. These pin the standard protocol
without needing pycocotools installed."""

import numpy as np

from ssd_keras_tpu.eval.cocoeval import COCOEvalBBox, coco_bbox_iou


def _gt(annotations, cats=(1,), imgs=None):
    if imgs is None:
        imgs = sorted({a["image_id"] for a in annotations})
    return {
        "images": [{"id": i} for i in imgs],
        "categories": [{"id": c, "name": str(c)} for c in cats],
        "annotations": [
            {"id": k + 1, **a} for k, a in enumerate(annotations)
        ],
    }


def test_iou_matrix_plain_and_crowd():
    dt = [[0, 0, 10, 10]]
    gt = [[0, 0, 10, 10], [5, 5, 10, 10], [0, 0, 100, 100]]
    iou = coco_bbox_iou(dt, gt)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0)
    np.testing.assert_allclose(iou[0, 2], 100.0 / 10000.0)
    # Crowd union = detection area: fully-contained det scores 1.
    iou_c = coco_bbox_iou(dt, gt, iscrowd=[False, False, True])
    np.testing.assert_allclose(iou_c[0, 2], 1.0)


def test_perfect_detections_ap1():
    gt = _gt([
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60]},
        {"image_id": 1, "category_id": 1, "bbox": [100, 20, 40, 40]},
        {"image_id": 2, "category_id": 1, "bbox": [5, 5, 80, 80]},
    ])
    results = [
        {"image_id": a["image_id"], "category_id": 1,
         "bbox": a["bbox"], "score": 0.9}
        for a in gt["annotations"]
    ]
    ev = COCOEvalBBox(gt, results)
    m = ev.evaluate()
    assert m["AP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    assert m["AR100"] == 1.0


def test_higher_scored_false_positive_halves_ap():
    """One GT; a perfect det at score 0.9 plus a stray at 0.95: every
    recall level is reached at precision 1/2, so AP = 0.5 at all IoUs."""
    gt = _gt([{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]}])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [500, 500, 10, 10], "score": 0.95},
    ]
    m = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m["AP"], 0.5)
    np.testing.assert_allclose(m["AP50"], 0.5)
    # The lower-scored FP variant doesn't hurt interpolated AP at all.
    results[1]["score"] = 0.1
    m2 = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m2["AP"], 1.0)


def test_iou_threshold_cutoff():
    """A det at IoU exactly 0.5 counts only at the 0.5 threshold:
    AP = 1/10, AP50 = 1, AP75 = 0."""
    gt = _gt([{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]}])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 5], "score": 0.9},
    ]
    m = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m["AP50"], 1.0)
    np.testing.assert_allclose(m["AP75"], 0.0)
    np.testing.assert_allclose(m["AP"], 0.1)


def test_crowd_matches_are_ignored_not_fp():
    """A det inside a crowd region must neither count as TP nor FP."""
    gt = _gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 500, 500],
         "iscrowd": 1},
    ])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.8},
        # Fully inside the crowd, higher score: would halve AP if an FP.
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 20, 20],
         "score": 0.95},
    ]
    m = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m["AP"], 1.0)


def test_area_ranges_partition_gts():
    """A 16x16 GT is 'small', a 200x200 GT is 'large'; each only counts in
    its own range and APmedium stays undefined (-1 excluded from means)."""
    gt = _gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 16, 16]},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 200, 200]},
    ])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 16, 16], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 200, 200],
         "score": 0.8},
    ]
    ev = COCOEvalBBox(gt, results)
    m = ev.evaluate()
    assert m["APsmall"] == 1.0 and m["APlarge"] == 1.0
    assert m["APmedium"] == -1.0  # no medium GT anywhere
    assert m["AP"] == 1.0


def test_max_dets_limits_recall():
    """Three GTs, three perfect dets: AR1 sees only the top-scored det."""
    gt = _gt([
        {"image_id": 1, "category_id": 1, "bbox": [i * 50, 0, 10, 10]}
        for i in range(3)
    ])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [i * 50, 0, 10, 10],
         "score": 0.9 - i * 0.1}
        for i in range(3)
    ]
    m = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m["AR1"], 1.0 / 3.0)
    np.testing.assert_allclose(m["AR10"], 1.0)
    np.testing.assert_allclose(m["AR100"], 1.0)


def test_multiclass_mean_and_missing_class():
    """AP averages over classes with GT; a class with no GT contributes
    nothing (it is not scored as 0)."""
    gt = _gt(
        [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
            {"image_id": 1, "category_id": 2, "bbox": [50, 50, 10, 10]},
        ],
        cats=(1, 2, 3),
    )
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        # Class 2 gets a pure miss (no det) -> AP 0 for that class.
    ]
    m = COCOEvalBBox(gt, results).evaluate()
    np.testing.assert_allclose(m["AP"], 0.5)  # mean of {1.0, 0.0}


def test_summarize_prints_12_lines(capsys):
    gt = _gt([{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]}])
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}
    ]
    ev = COCOEvalBBox(gt, results)
    ev.summarize()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 12
    assert "Average Precision (AP)" in out[0] and "= 1.000" in out[0]
