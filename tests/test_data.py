"""Data pipeline: transforms, validators, patch sampling, parsers, generator."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ssd_keras_tpu.data import (
    BoundGenerator,
    BoxFilter,
    DataGenerator,
    DegenerateBatchError,
    ImageValidator,
)
from ssd_keras_tpu.data.chains import SSDDataAugmentation, SSDPhotometricDistortions
from ssd_keras_tpu.data.geometric import Flip, Resize
from ssd_keras_tpu.data.misc import apply_inverse_transforms
from ssd_keras_tpu.data.patch_sampling import CropPad, Pad, PatchCoordinateGenerator
from ssd_keras_tpu.data.photometric import (
    Brightness,
    ConvertDataType,
    ConvertTo3Channels,
    Contrast,
    Hue,
)

LABELS = np.array([[1, 10, 20, 50, 60], [2, 30, 5, 90, 40]], dtype=np.float64)


def _img(h=100, w=120, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, c), dtype=np.uint8)


# ----------------------------- photometric ------------------------------- #


def test_brightness_clip():
    img = np.full((4, 4, 3), 250.0, np.float32)
    out = Brightness(delta=20)(img)
    assert out.max() == 255.0


def test_contrast_pivot():
    img = np.full((2, 2, 3), 127.5, np.float32)
    out = Contrast(factor=1.7)(img)
    np.testing.assert_allclose(out, 127.5)


def test_hue_wraps_mod_180():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 0] = 175.0
    out = Hue(delta=10)(img)
    np.testing.assert_allclose(out[..., 0], 5.0)


def test_convert_datatype_rounds():
    img = np.full((2, 2, 3), 10.6, np.float32)
    out = ConvertDataType(to="uint8")(img)
    assert out.dtype == np.uint8 and out[0, 0, 0] == 11


def test_convert_to_3_channels():
    assert ConvertTo3Channels()(_img(c=3)).shape[2] == 3
    gray = np.random.randint(0, 255, (10, 10), np.uint8)
    assert ConvertTo3Channels()(gray).shape == (10, 10, 3)
    rgba = np.random.randint(0, 255, (10, 10, 4), np.uint8)
    assert ConvertTo3Channels()(rgba).shape == (10, 10, 3)


def test_photometric_chain_preserves_shape_dtype():
    img, labels = SSDPhotometricDistortions()(_img(), LABELS.copy())
    assert img.shape == (100, 120, 3)
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(labels, LABELS)


# ------------------------------ geometric -------------------------------- #


def test_resize_rescales_labels_and_inverter():
    img, labels, inverter = Resize(50, 60)(_img(), LABELS.copy(), return_inverter=True)
    assert img.shape == (50, 60, 3)
    np.testing.assert_allclose(labels[0, 1], round(10 * 60 / 120))
    preds = np.concatenate(
        [np.ones((2, 1)), np.ones((2, 1)), labels[:, 1:]], axis=1
    )  # [class, conf, xmin, ymin, xmax, ymax]
    restored = inverter(preds)
    np.testing.assert_allclose(restored[:, 2:], LABELS[:, 1:], atol=1.0)


def test_flip_horizontal_mirrors_boxes():
    img, labels = Flip("horizontal")(_img(), LABELS.copy())
    np.testing.assert_array_equal(img, _img()[:, ::-1])
    assert labels[0, 1] == 120 - 50 and labels[0, 3] == 120 - 10


def test_flip_vertical():
    img, labels = Flip("vertical")(_img(), LABELS.copy())
    assert labels[0, 2] == 100 - 60 and labels[0, 4] == 100 - 20


# ------------------------------ validators ------------------------------- #


def test_bound_generator_none_maps_to_unit():
    bg = BoundGenerator(sample_space=((None, None),))
    assert bg() == (0.0, 1.0)


def test_box_filter_degenerate_and_min_area():
    labels = np.array([[1, 10, 10, 10, 50], [1, 0, 0, 3, 3], [1, 0, 0, 50, 50]])
    bf = BoxFilter(check_overlap=False, check_min_area=True, min_area=16)
    kept = bf(labels)
    assert kept.shape[0] == 1 and kept[0, 3] == 50


def test_box_filter_center_point():
    labels = np.array([[1, -30, -30, -10, -10], [1, 10, 10, 30, 30]])
    bf = BoxFilter(check_min_area=False, check_degenerate=False,
                   overlap_criterion="center_point")
    kept = bf(labels, image_height=100, image_width=100)
    assert kept.shape[0] == 1


def test_box_filter_iou_bounds():
    labels = np.array([[1, 0, 0, 100, 100], [1, 0, 0, 10, 10]])
    bf = BoxFilter(check_min_area=False, check_degenerate=False,
                   overlap_criterion="iou", overlap_bounds=(0.5, 1.0))
    kept = bf(labels, image_height=100, image_width=100)
    assert kept.shape[0] == 1 and kept[0, 3] == 100


def test_image_validator_n_boxes_min():
    iv = ImageValidator(overlap_criterion="center_point", n_boxes_min=2)
    labels = np.array([[1, 10, 10, 30, 30], [1, 200, 200, 220, 220]])
    assert not iv(labels, image_height=100, image_width=100)
    assert iv(labels, image_height=300, image_width=300)


# ---------------------------- patch sampling ----------------------------- #


def test_croppad_pure_crop_and_labels():
    img = _img(100, 120)
    cp = CropPad(patch_ymin=10, patch_xmin=20, patch_height=50, patch_width=60,
                 clip_boxes=True)
    out, labels = cp(img, LABELS.copy())
    assert out.shape == (50, 60, 3)
    np.testing.assert_array_equal(out, img[10:60, 20:80])
    assert labels[0, 1] == max(0, 10 - 20) and labels[0, 2] == 20 - 10


def test_croppad_pure_pad_background():
    img = _img(10, 10)
    cp = CropPad(patch_ymin=-5, patch_xmin=-5, patch_height=20, patch_width=20,
                 clip_boxes=False, background=(7, 8, 9))
    out = cp(img, None)
    np.testing.assert_array_equal(out[0, 0], [7, 8, 9])
    np.testing.assert_array_equal(out[5:15, 5:15], img)


def test_croppad_inverter_roundtrip():
    cp = CropPad(patch_ymin=10, patch_xmin=-5, patch_height=80, patch_width=130,
                 clip_boxes=False)
    _, labels, inverter = cp(_img(), LABELS.copy(), return_inverter=True)
    preds = np.concatenate([np.ones((2, 2)), labels[:, 1:]], axis=1)
    restored = inverter(preds)
    np.testing.assert_allclose(restored[:, 2:], LABELS[:, 1:])


def test_pad_convenience():
    out, labels = Pad(5, 6, 7, 8)(_img(10, 10), np.array([[1, 2, 2, 5, 5.0]]))
    assert out.shape == (21, 25, 3)
    assert labels[0, 1] == 9 and labels[0, 2] == 7


def test_patch_coord_generator_ranges():
    gen = PatchCoordinateGenerator(
        img_height=100, img_width=100, must_match="h_w",
        min_scale=0.5, max_scale=0.99,
    )
    np.random.seed(0)
    for _ in range(50):
        ymin, xmin, h, w = gen()
        assert 50 <= h <= 99 and 50 <= w <= 99
        assert 0 <= ymin <= 100 - h and 0 <= xmin <= 100 - w


def test_patch_coord_generator_larger_than_image():
    gen = PatchCoordinateGenerator(
        img_height=100, img_width=100, must_match="h_w",
        min_scale=1.5, max_scale=2.0, scale_uniformly=True,
    )
    np.random.seed(0)
    for _ in range(20):
        ymin, xmin, h, w = gen()
        assert h > 100 and w > 100
        assert ymin <= 0 and ymin + h >= 100  # patch covers the image


def test_ssd_chain_outputs_fixed_size():
    np.random.seed(0)
    chain = SSDDataAugmentation(img_height=64, img_width=64)
    for seed in range(5):
        img, labels = chain(_img(seed=seed), LABELS.copy())
        assert img.shape == (64, 64, 3)
        assert labels.shape[1] == 5


# ------------------------------- parsers --------------------------------- #


def _write_images(tmp_path, n=4, h=40, w=50):
    names = []
    for i in range(n):
        name = f"im{i}.jpg"
        Image.fromarray(_img(h, w, seed=i)).save(tmp_path / name)
        names.append(name)
    return names


def test_parse_csv(tmp_path):
    names = _write_images(tmp_path)
    csv_path = tmp_path / "labels.csv"
    with open(csv_path, "w") as f:
        f.write("frame,xmin,xmax,ymin,ymax,class_id\n")
        for i, name in enumerate(names):
            f.write(f"{name},5,25,6,26,{1 + i % 2}\n")
    gen = DataGenerator()
    gen.parse_csv(
        images_dir=str(tmp_path),
        labels_filename=str(csv_path),
        input_format=["image_name", "xmin", "xmax", "ymin", "ymax", "class_id"],
    )
    assert gen.get_dataset_size() == 4
    assert gen.labels[0].shape == (1, 5)
    np.testing.assert_array_equal(gen.labels[0][0], [1, 5, 6, 25, 26])


def test_parse_xml(tmp_path):
    names = _write_images(tmp_path, n=2)
    ids = [os.path.splitext(n)[0] for n in names]
    (tmp_path / "sets.txt").write_text("\n".join(ids) + "\n")
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    for i, image_id in enumerate(ids):
        difficult = i  # second image difficult
        (ann_dir / f"{image_id}.xml").write_text(
            f"""<annotation><object><name>car</name>
            <truncated>0</truncated><difficult>{difficult}</difficult>
            <bndbox><xmin>4</xmin><ymin>5</ymin><xmax>24</xmax><ymax>25</ymax></bndbox>
            </object></annotation>"""
        )
    gen = DataGenerator()
    gen.parse_xml(
        images_dirs=[str(tmp_path)],
        image_set_filenames=[str(tmp_path / "sets.txt")],
        annotations_dirs=[str(ann_dir)],
        classes=["background", "car"],
    )
    assert gen.get_dataset_size() == 2
    np.testing.assert_array_equal(gen.labels[0][0], [1, 4, 5, 24, 25])
    assert gen.eval_neutral == [[False], [True]]


def test_parse_json_category_remap(tmp_path):
    names = _write_images(tmp_path, n=2)
    coco = {
        "images": [
            {"id": 100, "file_name": names[0]},
            {"id": 200, "file_name": names[1]},
        ],
        "categories": [{"id": 7, "name": "cat"}, {"id": 99, "name": "dog"}],
        "annotations": [
            {"image_id": 100, "category_id": 99, "bbox": [5, 6, 20, 21]},
            {"image_id": 200, "category_id": 7, "bbox": [1, 2, 10, 11]},
        ],
    }
    ann = tmp_path / "coco.json"
    ann.write_text(json.dumps(coco))
    gen = DataGenerator()
    gen.parse_json(
        images_dirs=[str(tmp_path)],
        annotations_filenames=[str(ann)],
        ground_truth_available=True,
    )
    assert gen.cats_to_classes == {7: 1, 99: 2}
    np.testing.assert_array_equal(gen.labels[0][0], [2, 5, 6, 25, 27])


# ------------------------------ HDF5 + generator -------------------------- #


def test_hdf5_roundtrip(tmp_path):
    names = _write_images(tmp_path, n=3)
    gen = DataGenerator(
        filenames=[str(tmp_path / n) for n in names],
        labels=[LABELS.copy() for _ in names],
        image_ids=[f"id{i}" for i in range(3)],
    )
    h5_path = str(tmp_path / "ds.h5")
    gen.create_hdf5_dataset(file_path=h5_path, verbose=False)

    gen2 = DataGenerator(hdf5_dataset_path=h5_path)
    assert gen2.get_dataset_size() == 3
    np.testing.assert_array_equal(gen2.labels[1], LABELS)
    img = gen2._get_image(0)
    assert img.shape == (40, 50, 3)


def test_generator_yields_batches_and_returns_order(tmp_path):
    names = _write_images(tmp_path, n=4)
    gen = DataGenerator(
        filenames=[str(tmp_path / n) for n in names],
        labels=[LABELS.copy() for _ in names],
        load_images_into_memory=True,
    )
    it = gen.generate(
        batch_size=2, shuffle=False, transformations=[Resize(32, 32)],
        label_encoder=None,
        returns=["processed_labels", "processed_images", "filenames"],
    )
    batch = next(it)
    # Canonical order: processed_images first regardless of request order.
    images, labels, filenames = batch
    assert images.shape == (2, 32, 32, 3)
    assert len(labels) == 2 and len(filenames) == 2


def test_generator_inhomogeneous_raises(tmp_path):
    Image.fromarray(_img(40, 50)).save(tmp_path / "a.jpg")
    Image.fromarray(_img(60, 70)).save(tmp_path / "b.jpg")
    gen = DataGenerator(
        filenames=[str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")],
        labels=[LABELS.copy(), LABELS.copy()],
    )
    it = gen.generate(batch_size=2, shuffle=False, transformations=[])
    with pytest.raises(DegenerateBatchError):
        next(it)


def test_apply_inverse_transforms():
    preds = [np.array([[1, 0.9, 10.0, 10, 20, 20]])]

    def shift(p):
        p = np.copy(p)
        p[:, 2:] += 5
        return p

    out = apply_inverse_transforms(preds, [[shift, None, shift]])
    np.testing.assert_allclose(out[0][0, 2:], [20, 20, 30, 30])


def test_constant_input_size_chain():
    from ssd_keras_tpu.data.chains import DataAugmentationConstantInputSize

    np.random.seed(1)
    chain = DataAugmentationConstantInputSize()
    for seed in range(4):
        img, labels = chain(_img(seed=seed), LABELS.copy())
        assert img.shape == (100, 120, 3)  # size-preserving
    with pytest.raises(ValueError):
        DataAugmentationConstantInputSize(random_scale=(1.1, 2.0, 0.5))


def test_variable_input_size_chain():
    from ssd_keras_tpu.data.chains import DataAugmentationVariableInputSize

    np.random.seed(2)
    chain = DataAugmentationVariableInputSize(resize_height=64, resize_width=80)
    for seed in range(4):
        img, labels = chain(_img(90 + seed * 10, 100 + seed * 7, seed=seed),
                            LABELS.copy())
        assert img.shape == (64, 80, 3)


def test_satellite_chain():
    from ssd_keras_tpu.data.chains import DataAugmentationSatellite

    np.random.seed(3)
    chain = DataAugmentationSatellite(resize_height=64, resize_width=64)
    for seed in range(4):
        img, labels = chain(_img(seed=seed), LABELS.copy())
        assert img.shape == (64, 64, 3)


def test_synthvoc_voc_export_roundtrip(tmp_path):
    """SynthVOC's VOC-layout export must round-trip through the real XML
    parser: same boxes, same class ids (workflow parity, SURVEY §2.26)."""
    from ssd_keras_tpu.data.synthvoc import SYNTHVOC_CLASS_NAMES, SynthVOC

    ds = SynthVOC(6, image_size=128, split="val", seed=3)
    images, labels = ds.materialize()
    img_dir, ann_dir, set_path = ds.export_voc(str(tmp_path), images, labels)

    gen = DataGenerator(load_images_into_memory=False)
    gen.parse_xml(
        images_dirs=[img_dir],
        image_set_filenames=[set_path],
        annotations_dirs=[ann_dir],
        classes=SYNTHVOC_CLASS_NAMES,
        verbose=False,
    )
    assert gen.get_dataset_size() == 6
    for i in range(6):
        got = np.asarray(sorted(gen.labels[i].tolist()))
        # export_voc writes 1-based inclusive coords; the parser keeps them.
        want = np.asarray(sorted(
            [[c, x0 + 1, y0 + 1, x1, y1]
             for c, x0, y0, x1, y1 in labels[i].astype(int).tolist()]
        ))
        np.testing.assert_array_equal(got, want)


def test_synthvoc_coco_export_roundtrip(tmp_path):
    """The COCO-JSON export must round-trip through parse_json, including
    the non-consecutive category-id remap."""
    from ssd_keras_tpu.data.synthvoc import SynthVOC

    ds = SynthVOC(5, image_size=128, split="val", seed=4)
    images, labels = ds.materialize()
    img_dir, ann_path = ds.export_coco(str(tmp_path), images, labels)

    gen = DataGenerator(load_images_into_memory=False)
    gen.parse_json(
        images_dirs=[img_dir],
        annotations_filenames=[ann_path],
        ground_truth_available=True,
        verbose=False,
    )
    assert gen.get_dataset_size() == 5
    # Non-consecutive ids (10x) remapped back to consecutive 1..20.
    assert gen.cats_to_classes[10] == 1 and gen.cats_to_classes[200] == 20
    for i in range(5):
        got = np.asarray(sorted(gen.labels[i].tolist()))
        want = np.asarray(sorted(labels[i].astype(int).tolist()))
        np.testing.assert_array_equal(got[:, 0], want[:, 0])
        np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=1)
