"""Native C++ host kernels vs their NumPy/Python counterparts."""

import numpy as np
import pytest

from ssd_keras_tpu import native
from ssd_keras_tpu.ops import boxes as box_ops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _random_boxes(rng, n, span=100.0):
    b = rng.rand(n, 4).astype(np.float32) * span
    b[:, 2:] = b[:, :2] + rng.rand(n, 2).astype(np.float32) * 30 + 1
    return b


def test_iou_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    a, b = _random_boxes(rng, 13), _random_boxes(rng, 7)
    for border, d in (("half", 0), ("include", 1), ("exclude", -1)):
        expected = box_ops.iou(a, b, coords="corners", border_pixels=border)
        got = native.iou_matrix(a, b, border_delta=d)
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_greedy_nms_matches_python():
    from ssd_keras_tpu.decoder import greedy_nms

    rng = np.random.RandomState(1)
    for _ in range(10):
        n = rng.randint(1, 60)
        boxes = _random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        rows = np.concatenate([scores[:, None], boxes], axis=1)
        expected = greedy_nms(rows, iou_threshold=0.45)
        keep = native.greedy_nms_indices(scores, boxes, 0.45)
        got = rows[keep]
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_match_predictions_matches_python(tmp_path):
    """The evaluator must produce identical TP/FP with and without native."""
    from PIL import Image

    from ssd_keras_tpu.data import DataGenerator
    from ssd_keras_tpu.eval import Evaluator

    rng = np.random.RandomState(2)
    n_images, n_classes = 6, 3
    labels, fns = [], []
    for i in range(n_images):
        fn = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(fn)
        fns.append(str(fn))
        k = rng.randint(1, 4)
        rows = []
        for _ in range(k):
            x1, y1 = rng.randint(0, 40, 2)
            rows.append([rng.randint(1, n_classes + 1), x1, y1,
                         x1 + rng.randint(5, 20), y1 + rng.randint(5, 20)])
        labels.append(np.array(rows, dtype=np.float64))
    neutral = [[bool(rng.rand() < 0.2) for _ in l] for l in labels]
    gen = DataGenerator(filenames=fns, labels=labels,
                        image_ids=[str(i) for i in range(n_images)],
                        eval_neutral=neutral, load_images_into_memory=True)

    predictions = [[] for _ in range(n_classes + 1)]
    for _ in range(60):
        img = rng.randint(n_images)
        c = rng.randint(1, n_classes + 1)
        # Half near-GT predictions, half random.
        if rng.rand() < 0.5 and len(labels[img]) > 0:
            g = labels[img][rng.randint(len(labels[img]))]
            box = g[1:] + rng.randn(4) * 2
        else:
            x1, y1 = rng.randint(0, 40, 2)
            box = np.array([x1, y1, x1 + rng.randint(5, 20), y1 + rng.randint(5, 20)])
        predictions[c].append(
            (str(img), float(rng.rand()), *[round(float(v), 1) for v in box])
        )

    def run(disable_native):
        import os

        ev = Evaluator(model=None, n_classes=n_classes, data_generator=gen)
        ev.prediction_results = [list(p) for p in predictions]
        if disable_native:
            import ssd_keras_tpu.native as nat

            old = nat._LIB, nat._TRIED
            nat._LIB, nat._TRIED = None, True
            try:
                ev.match_predictions(verbose=False, sorting_algorithm="stable")
            finally:
                nat._LIB, nat._TRIED = old
        else:
            ev.match_predictions(verbose=False, sorting_algorithm="stable")
        return ev.true_positives, ev.false_positives

    tp_n, fp_n = run(disable_native=False)
    tp_p, fp_p = run(disable_native=True)
    for c in range(1, n_classes + 1):
        np.testing.assert_array_equal(tp_n[c], tp_p[c])
        np.testing.assert_array_equal(fp_n[c], fp_p[c])


def test_native_jpeg_batch_decode_matches_pil(tmp_path):
    """The threaded native JPEG decoder must reproduce PIL's pixels (both
    are libjpeg underneath) across mixed sizes, in parallel."""
    import numpy as np
    from PIL import Image

    from ssd_keras_tpu import native

    if not native.jpeg_available():
        import pytest

        pytest.skip("native jpeg decoder unavailable")

    rng = np.random.RandomState(0)
    paths, want = [], []
    for i, (h, w) in enumerate([(64, 80), (128, 96), (48, 48), (200, 150)]):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        path = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img).save(path, quality=92)
        paths.append(path)
        want.append(np.asarray(Image.open(path).convert("RGB")))

    buffers = [open(p, "rb").read() for p in paths]
    got = native.decode_jpeg_batch(buffers, n_threads=4)
    assert got is not None and len(got) == 4
    for g, w_ in zip(got, want):
        assert g.shape == w_.shape
        np.testing.assert_array_equal(g, w_)


def test_native_jpeg_grayscale_matches_pil(tmp_path):
    """Grayscale JPEGs must come back (H, W) — exactly what the PIL fallback
    yields — so generator batch shapes never depend on which decode path ran
    (transform chains handle the 2-D case via ConvertTo3Channels, like the
    reference)."""
    import numpy as np
    import pytest
    from PIL import Image

    from ssd_keras_tpu import native

    if not native.jpeg_available():
        pytest.skip("native jpeg decoder unavailable")

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 255, (56, 72), np.uint8)
    color = rng.randint(0, 255, (56, 72, 3), np.uint8)
    gpath = str(tmp_path / "gray.jpg")
    cpath = str(tmp_path / "color.jpg")
    Image.fromarray(gray, mode="L").save(gpath, quality=92)
    Image.fromarray(color).save(cpath, quality=92)

    buffers = [open(p, "rb").read() for p in (gpath, cpath)]
    got = native.decode_jpeg_batch(buffers)
    want = [np.array(Image.open(p)) for p in (gpath, cpath)]
    assert got[0].shape == want[0].shape == (56, 72)
    assert got[1].shape == want[1].shape == (56, 72, 3)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(g, w_)


def test_native_jpeg_rejects_corrupt(tmp_path):
    import numpy as np
    import pytest
    from PIL import Image

    from ssd_keras_tpu import native

    if not native.jpeg_available():
        pytest.skip("native jpeg decoder unavailable")
    img = np.zeros((32, 32, 3), np.uint8)
    path = str(tmp_path / "ok.jpg")
    Image.fromarray(img).save(path)
    good = open(path, "rb").read()
    with pytest.raises(ValueError):
        native.decode_jpeg_batch([good, b"not a jpeg"])


def test_generator_batch_uses_native_jpeg(tmp_path):
    """A lazy-file DataGenerator over JPEGs yields pixels identical to the
    per-image PIL path (the batch decode is a drop-in)."""
    import numpy as np
    from PIL import Image

    from ssd_keras_tpu.data.datasets import DataGenerator

    rng = np.random.RandomState(1)
    files, labels = [], []
    for i in range(5):
        img = rng.randint(0, 255, (40, 50, 3), np.uint8)
        path = str(tmp_path / f"g{i}.jpg")
        Image.fromarray(img).save(path, quality=95)
        files.append(path)
        labels.append(np.array([[1, 2, 3, 20, 30]], np.float32))

    lazy = DataGenerator(filenames=files, labels=labels, verbose=False)
    eager = DataGenerator(filenames=files, labels=labels,
                          load_images_into_memory=True, verbose=False)
    gl = lazy.generate(batch_size=5, shuffle=False,
                       returns=["processed_images", "processed_labels"])
    ge = eager.generate(batch_size=5, shuffle=False,
                        returns=["processed_images", "processed_labels"])
    bl, be = next(gl), next(ge)
    for a, b in zip(bl[0], be[0]):
        np.testing.assert_array_equal(a, b)


def test_native_jpeg_cmyk_falls_back_per_image(tmp_path):
    """4-component CMYK JPEGs can't be converted to RGB by plain libjpeg;
    the batch decoder must route just those images through PIL (keeping
    PIL's (H, W, 4) shape for them) while the rest decode natively."""
    import numpy as np
    import pytest
    from PIL import Image

    from ssd_keras_tpu import native

    if not native.jpeg_available():
        pytest.skip("native jpeg decoder unavailable")

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 255, (40, 52, 3), np.uint8)
    cmyk = rng.randint(0, 255, (36, 44, 4), np.uint8)
    rgb_path = str(tmp_path / "rgb.jpg")
    cmyk_path = str(tmp_path / "cmyk.jpg")
    Image.fromarray(rgb).save(rgb_path, quality=92)
    Image.fromarray(cmyk, mode="CMYK").save(cmyk_path, quality=92)

    buffers = [open(p, "rb").read() for p in (rgb_path, cmyk_path, rgb_path)]
    got = native.decode_jpeg_batch(buffers)
    want = [
        np.array(Image.open(p)) for p in (rgb_path, cmyk_path, rgb_path)
    ]
    assert got[1].shape == want[1].shape  # PIL's CMYK shape, (36, 44, 4)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(g, w_)

    # All-CMYK batch takes the pure-PIL early return.
    got_all = native.decode_jpeg_batch([buffers[1], buffers[1]])
    np.testing.assert_array_equal(got_all[0], want[1])
    np.testing.assert_array_equal(got_all[1], want[1])
