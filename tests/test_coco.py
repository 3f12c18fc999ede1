"""COCO evaluation bridge (eval/coco.py) — unit coverage.

Parity target: /root/reference/eval_utils/coco_utils.py
(get_coco_category_maps :30-60, predict_all_to_json :62-200): consecutive
class IDs <-> original non-consecutive COCO category IDs, and the results
JSON rows ``{image_id, category_id, bbox [x, y, w, h], score}`` with the
reference's rounding (bbox 1 decimal, score 3).
"""

import json

import numpy as np
import pytest

from ssd_keras_tpu.eval.coco import get_coco_category_maps, predict_all_to_json


@pytest.fixture()
def annotations_file(tmp_path):
    # Non-consecutive category IDs, deliberately unsorted (COCO's real
    # instances files list 80 categories with gaps, e.g. 1..90).
    ann = {
        "categories": [
            {"id": 44, "name": "bottle"},
            {"id": 1, "name": "person"},
            {"id": 18, "name": "dog"},
        ],
        "images": [],
        "annotations": [],
    }
    path = tmp_path / "instances.json"
    path.write_text(json.dumps(ann))
    return str(path)


def test_category_maps(annotations_file):
    cats_to_classes, classes_to_cats, cats_to_names, classes_to_names = (
        get_coco_category_maps(annotations_file)
    )
    # Consecutive IDs follow ascending original-ID order, starting at 1.
    assert cats_to_classes == {1: 1, 18: 2, 44: 3}
    assert classes_to_cats == {1: 1, 2: 18, 3: 44}
    assert cats_to_names == {1: "person", 18: "dog", 44: "bottle"}
    assert classes_to_names == ["background", "person", "dog", "bottle"]


def test_predict_all_to_json_roundtrip(tmp_path, annotations_file):
    """Drive predict_all_to_json with a stub model over an in-memory dataset;
    the written JSON must carry original category IDs and xywh boxes in the
    ORIGINAL image frame (the Resize inverter must be applied)."""
    from PIL import Image

    from ssd_keras_tpu.data.datasets import DataGenerator

    rng = np.random.RandomState(0)
    h0, w0 = 60, 90  # original size != model size -> inverse transform matters
    files = []
    for i in range(3):
        path = str(tmp_path / f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (h0, w0, 3), np.uint8)).save(path)
        files.append(path)
    labels = [np.array([[1, 2.0, 3.0, 20.0, 30.0]], np.float32)] * 3
    gen = DataGenerator(filenames=files, labels=labels,
                        load_images_into_memory=True,
                        image_ids=[101, 102, 103], verbose=False)

    classes_to_cats = get_coco_category_maps(annotations_file)[1]
    n_classes = 3
    img_h = img_w = 48

    def fake_model(batch_x):
        # 'inference'-mode output: (batch, top_k, 6) [class, conf, corners]
        # in MODEL-input pixel coordinates; one detection per image + padding.
        out = np.zeros((batch_x.shape[0], 4, 6), np.float32)
        for b in range(batch_x.shape[0]):
            out[b, 0] = [2, 0.9, 12.0, 6.0, 36.0, 30.0]
        return out

    results = predict_all_to_json(
        str(tmp_path / "results.json"), fake_model, img_h, img_w,
        classes_to_cats, gen, batch_size=2, model_mode="inference",
        verbose=False,
    )
    on_disk = json.loads((tmp_path / "results.json").read_text())
    assert on_disk == results
    assert [r["image_id"] for r in results] == [101, 102, 103]
    for r in results:
        assert r["category_id"] == 18  # consecutive class 2 -> COCO id 18
        # Resize(48x48 <- 60x90) inverter maps x by w0/img_w, y by h0/img_h
        # and ROUNDS to integer pixels (reference Resize inverter semantics).
        x, y, w, h = r["bbox"]
        assert x == pytest.approx(12.0 * w0 / img_w, abs=0.51)
        assert y == pytest.approx(6.0 * h0 / img_h, abs=0.51)
        assert w == pytest.approx(24.0 * w0 / img_w, abs=1.01)
        assert h == pytest.approx(24.0 * h0 / img_h, abs=1.01)
        assert r["score"] == 0.9


def test_predict_all_to_json_training_mode_decodes(tmp_path, annotations_file):
    """model_mode='training' must run the host reference decoder on raw
    predictions (offsets + anchors) before writing results."""
    from PIL import Image

    from ssd_keras_tpu.config import SSDConfig
    from ssd_keras_tpu.data.datasets import DataGenerator
    from ssd_keras_tpu.encoder import SSDInputEncoder
    from ssd_keras_tpu.models import ssd_7

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    _, sizes = ssd_7(cfg)
    encoder = SSDInputEncoder(cfg, sizes)
    anchors8 = np.asarray(encoder.anchors8)  # (n_boxes, 8)
    template = np.concatenate(
        [
            np.zeros((1, encoder.n_boxes_total,
                      cfg.n_classes_with_background + 4), np.float32),
            anchors8[None],
        ],
        axis=2,
    )  # raw y_pred layout: [class probs | 4 offsets | anchors+variances]

    rng = np.random.RandomState(1)
    files = []
    for i in range(2):
        path = str(tmp_path / f"raw{i}.png")
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(path)
        files.append(path)
    labels = [np.array([[1, 2.0, 3.0, 20.0, 30.0]], np.float32)] * 2
    gen = DataGenerator(filenames=files, labels=labels,
                        load_images_into_memory=True,
                        image_ids=[7, 8], verbose=False)
    classes_to_cats = get_coco_category_maps(annotations_file)[1]

    def raw_model(batch_x):
        # Raw 'training'-mode tensor: background-certain everywhere except
        # one anchor pushed to class 1 with zero offsets.
        y = np.tile(template, (batch_x.shape[0], 1, 1)).astype(np.float32)
        y[:, :, 0] = 1.0
        y[:, 10, 0] = 0.0
        y[:, 10, 1] = 1.0
        return y

    results = predict_all_to_json(
        str(tmp_path / "results.json"), raw_model, 48, 48, classes_to_cats,
        gen, batch_size=2, model_mode="training", confidence_thresh=0.5,
        verbose=False,
    )
    assert len(results) == 2  # exactly the one confident box per image
    for r in results:
        assert r["category_id"] == 1  # class 1 -> COCO id 1 ('person')
        assert 0.0 <= r["bbox"][0] <= 48.0


def test_bridge_json_scores_through_vendored_metric(tmp_path, annotations_file):
    """End-to-end: predict_all_to_json output fed to the vendored COCO
    metric. A stub model that reproduces the GT boxes exactly must score
    AP 1.0; jittering one box below IoU 0.5 must drop it."""
    from PIL import Image

    from ssd_keras_tpu.data.datasets import DataGenerator
    from ssd_keras_tpu.eval import COCOEvalBBox

    rng = np.random.RandomState(1)
    img_h = img_w = 48
    files = []
    for i in range(2):
        path = str(tmp_path / f"m{i}.png")
        Image.fromarray(rng.randint(0, 255, (img_h, img_w, 3), np.uint8)).save(path)
        files.append(path)
    # GT: one box per image, class 2 -> COCO category 18. Model-frame ==
    # original-frame (same size) so no inverse-transform scaling.
    gt_boxes = [(6.0, 8.0, 30.0, 28.0), (10.0, 4.0, 24.0, 36.0)]  # xywh
    labels = [
        np.array([[2, x, y, x + w, y + h]], np.float32)
        for (x, y, w, h) in gt_boxes
    ]
    gen = DataGenerator(filenames=files, labels=labels,
                        load_images_into_memory=True,
                        image_ids=[7, 8], verbose=False)
    ann = json.loads(open(annotations_file).read())
    ann["images"] = [{"id": 7}, {"id": 8}]
    ann["annotations"] = [
        {"id": k + 1, "image_id": 7 + k, "category_id": 18,
         "bbox": list(gt_boxes[k])}
        for k in range(2)
    ]
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(ann))

    classes_to_cats = get_coco_category_maps(annotations_file)[1]

    def exact_model(batch_x):
        out = np.zeros((batch_x.shape[0], 4, 6), np.float32)
        for b in range(batch_x.shape[0]):
            x, y, w, h = gt_boxes[exact_model.seen + b]
            out[b, 0] = [2, 0.9, x, y, x + w, y + h]
        exact_model.seen += batch_x.shape[0]
        return out

    exact_model.seen = 0
    predict_all_to_json(
        str(tmp_path / "res.json"), exact_model, img_h, img_w,
        classes_to_cats, gen, batch_size=2, model_mode="inference",
        verbose=False,
    )
    m = COCOEvalBBox(str(gt_file), str(tmp_path / "res.json")).evaluate()
    assert m["AP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)

    # Degrade one detection to IoU < 0.5: AP50 averages {1.0 class-wise
    # recall hit}: one TP + one FP out of 2 GT -> AP50 = 0.5 * (1 + 0)?
    # Precisely: dets scored equally, one matches, one misses ->
    # precision envelope gives AP50 ~ 0.5.
    def off_model(batch_x):
        out = np.zeros((batch_x.shape[0], 4, 6), np.float32)
        for b in range(batch_x.shape[0]):
            x, y, w, h = gt_boxes[off_model.seen + b]
            if off_model.seen + b == 1:
                x += w  # shifted fully off the GT
            out[b, 0] = [2, 0.9, x, y, x + w, y + h]
        off_model.seen += batch_x.shape[0]
        return out

    off_model.seen = 0
    predict_all_to_json(
        str(tmp_path / "res2.json"), off_model, img_h, img_w,
        classes_to_cats, gen, batch_size=2, model_mode="inference",
        verbose=False,
    )
    m2 = COCOEvalBBox(str(gt_file), str(tmp_path / "res2.json")).evaluate()
    assert m2["AP50"] < 1.0
    assert m2["AR100"] == pytest.approx(0.5)
