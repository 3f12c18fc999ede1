"""Evaluator: matching semantics, AP algorithms, end-to-end mAP."""

import numpy as np
import pytest
from PIL import Image

from ssd_keras_tpu.data import DataGenerator
from ssd_keras_tpu.eval import Evaluator


def _dataset(tmp_path, labels, neutral=None, h=64, w=64):
    fns = []
    for i in range(len(labels)):
        fn = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(fn)
        fns.append(str(fn))
    gen = DataGenerator(
        filenames=fns,
        labels=[np.asarray(l, dtype=np.float64) for l in labels],
        image_ids=[str(i) for i in range(len(labels))],
        eval_neutral=neutral,
        load_images_into_memory=True,
    )
    return gen


class _FakeEvaluator(Evaluator):
    """Evaluator with injected predictions (skips the model forward)."""

    def __init__(self, n_classes, data_generator, predictions):
        super().__init__(model=None, n_classes=n_classes, data_generator=data_generator)
        self.prediction_results = predictions


def _run(ev, **kwargs):
    ev.get_num_gt_per_class(verbose=False, **{k: v for k, v in kwargs.items() if k == "ignore_neutral_boxes"})
    ev.match_predictions(verbose=False, **kwargs)
    ev.compute_precision_recall()
    ev.compute_average_precisions()
    return ev.compute_mean_average_precision()


def test_perfect_predictions_map_one(tmp_path):
    labels = [[[1, 10, 10, 30, 30]], [[1, 20, 20, 40, 40], [2, 5, 5, 15, 15]]]
    gen = _dataset(tmp_path, labels)
    preds = [[],
             [("0", 0.9, 10, 10, 30, 30), ("1", 0.8, 20, 20, 40, 40)],
             [("1", 0.95, 5, 5, 15, 15)]]
    ev = _FakeEvaluator(2, gen, preds)
    assert _run(ev) == pytest.approx(1.0)


def test_duplicate_detection_is_fp(tmp_path):
    labels = [[[1, 10, 10, 30, 30]]]
    gen = _dataset(tmp_path, labels)
    preds = [[], [("0", 0.9, 10, 10, 30, 30), ("0", 0.8, 11, 11, 30, 30)]]
    ev = _FakeEvaluator(1, gen, preds)
    _run(ev)
    np.testing.assert_array_equal(ev.true_positives[1], [1, 0])
    np.testing.assert_array_equal(ev.false_positives[1], [0, 1])


def test_low_iou_is_fp(tmp_path):
    labels = [[[1, 10, 10, 30, 30]]]
    gen = _dataset(tmp_path, labels)
    preds = [[], [("0", 0.9, 40, 40, 60, 60)]]
    ev = _FakeEvaluator(1, gen, preds)
    mAP = _run(ev)
    assert mAP == 0.0


def test_neutral_boxes_skipped(tmp_path):
    labels = [[[1, 10, 10, 30, 30], [1, 40, 40, 60, 60]]]
    gen = _dataset(tmp_path, labels, neutral=[[False, True]])
    # A confident detection of the neutral box: neither TP nor FP.
    preds = [[], [("0", 0.9, 40, 40, 60, 60), ("0", 0.8, 10, 10, 30, 30)]]
    ev = _FakeEvaluator(1, gen, preds)
    _run(ev, ignore_neutral_boxes=True)
    np.testing.assert_array_equal(ev.true_positives[1], [0, 1])
    np.testing.assert_array_equal(ev.false_positives[1], [0, 0])
    # Neutral GT is also excluded from the GT count.
    assert ev.num_gt_per_class[1] == 1


def test_sample_vs_integrate_modes(tmp_path):
    labels = [[[1, 10, 10, 30, 30], [1, 40, 40, 60, 60]]]
    gen = _dataset(tmp_path, labels)
    # Both GT boxes detected: recalls [0.5, 1.0], precisions [1.0, 1.0].
    preds = [[], [("0", 0.9, 10, 10, 30, 30), ("0", 0.5, 40, 40, 60, 60)]]
    ev = _FakeEvaluator(1, gen, preds)
    ev.get_num_gt_per_class(verbose=False)
    ev.match_predictions(verbose=False)
    ev.compute_precision_recall()
    ev.compute_average_precisions(mode="sample", num_recall_points=11)
    ap_sample = ev.average_precisions[1]
    ev.compute_average_precisions(mode="integrate")
    ap_int = ev.average_precisions[1]
    # Sample mode: precision 1.0 at every recall level -> AP 1.0.
    assert ap_sample == pytest.approx(1.0)
    # Integrate mode replicates the reference algorithm, which sums
    # rectangles only BETWEEN unique recall values (the 0 -> first-recall
    # segment and the area at the last recall are not counted,
    # average_precision_evaluator.py:862-877): (1.0 - 0.5) * 1.0 = 0.5.
    assert ap_int == pytest.approx(0.5)


def test_write_predictions_to_txt(tmp_path):
    labels = [[[1, 10, 10, 30, 30]]]
    gen = _dataset(tmp_path, labels)
    preds = [[], [("000007", 0.876543, 10.0, 10.0, 30.0, 30.0)]]
    ev = _FakeEvaluator(1, gen, preds)
    prefix = str(tmp_path / "comp3_det_test_")
    ev.write_predictions_to_txt(classes=["bg", "car"], out_file_prefix=prefix)
    content = (tmp_path / "comp3_det_test_car.txt").read_text().strip()
    assert content.startswith("000007 0.8765 ")


def test_end_to_end_with_constant_model(tmp_path):
    """Full __call__ path with a fake 'inference'-mode model."""
    labels = [[[1, 8, 8, 40, 40]], [[1, 16, 16, 48, 48]]]
    gen = _dataset(tmp_path, labels)

    def fake_model(batch):
        # Pretend the model detects each GT perfectly (inference layout).
        out = np.zeros((len(batch), 200, 6), np.float32)
        out[0, 0] = [1, 0.9, 8, 8, 40, 40]
        out[1, 0] = [1, 0.9, 16, 16, 48, 48]
        return out

    ev = Evaluator(model=fake_model, n_classes=1, data_generator=gen,
                   model_mode="inference")
    mAP = ev(img_height=64, img_width=64, batch_size=2, verbose=False)
    assert mAP == pytest.approx(1.0)


def test_device_decode_matches_host_decode_path(tmp_path):
    """Evaluator mAP must be identical with device or host decoding of
    'training'-mode predictions."""
    import jax

    from ssd_keras_tpu.config import SSDConfig
    from ssd_keras_tpu.models import ssd_7

    cfg = SSDConfig.ssd7(n_classes=2, img_height=64, img_width=64)
    model, _ = ssd_7(cfg, mode="training")
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    fwd = jax.jit(lambda x: model.apply(variables, x))

    labels = [[[1, 10, 10, 30, 30]], [[2, 20, 20, 50, 50]]]
    gen = _dataset(tmp_path, labels)

    maps = []
    for device_decode in (True, False):
        ev = Evaluator(
            model=lambda b: np.asarray(fwd(np.asarray(b, np.float32))),
            n_classes=2, data_generator=gen, model_mode="training",
        )
        # Threshold high enough that fewer than nms_max candidates per class
        # are eligible: below that cap the in-graph decode (which, like the
        # reference's DecodeDetections layer, pre-trims to nms_max) and the
        # uncapped host decoder select identically.
        # 'half' border pixels: the in-graph decode's NMS (like the
        # reference's tf.image.non_max_suppression) always uses standard IoU,
        # while the host decoder honors border_pixels.
        ev.predict_on_dataset(
            img_height=64, img_width=64, batch_size=2, verbose=False,
            decoding_confidence_thresh=0.6, device_decode=device_decode,
            decoding_border_pixels="half",
        )
        ev.get_num_gt_per_class(verbose=False)
        ev.match_predictions(verbose=False)
        ev.compute_precision_recall()
        ev.compute_average_precisions()
        maps.append(ev.compute_mean_average_precision())
        n_preds = [len(p) for p in ev.prediction_results]
        maps.append(tuple(n_preds))
    assert maps[0] == pytest.approx(maps[2])
    assert maps[1] == maps[3]  # identical per-class prediction counts
