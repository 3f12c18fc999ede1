"""Pascal-VOC-style mean-average-precision evaluator.

Capability parity with /root/reference/eval_utils/average_precision_evaluator.py
(``Evaluator`` :36): dataset-wide prediction (resize or pad-then-resize input
modes, inverse-transform mapping back to original coordinates), eval-neutral
("difficult") handling, greedy confidence-descending prediction/GT matching
with duplicate-detection->FP, both the pre-2010 11-point-sample and the
post-2010 integrated AP algorithms, and VOC-format results-file export.

Instead of a Keras model this evaluator takes any ``predict_fn(batch) ->
np.ndarray`` — typically a jitted flax apply — so the TPU forward pass slots
straight in.
"""

from __future__ import annotations

from math import ceil
from typing import Callable

import numpy as np

from ssd_keras_tpu.decoder import decode_detections
from ssd_keras_tpu.data.geometric import Resize
from ssd_keras_tpu.data.misc import apply_inverse_transforms
from ssd_keras_tpu.data.patch_sampling import RandomPadFixedAR
from ssd_keras_tpu.data.photometric import ConvertTo3Channels
from ssd_keras_tpu.ops import boxes as box_ops

__all__ = ["Evaluator"]


class Evaluator:
    """Computes mAP of an SSD predict function over a ``DataGenerator``."""

    def __init__(
        self,
        model: Callable[[np.ndarray], np.ndarray],
        n_classes: int,
        data_generator,
        model_mode: str = "inference",
        pred_format=None,
        gt_format=None,
    ):
        self.model = model
        self.n_classes = n_classes
        self.data_generator = data_generator
        self.model_mode = model_mode
        self.pred_format = dict(
            pred_format
            or {"class_id": 0, "conf": 1, "xmin": 2, "ymin": 3, "xmax": 4, "ymax": 5}
        )
        self.gt_format = dict(
            gt_format or {"class_id": 0, "xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4}
        )
        self.prediction_results = None
        self.num_gt_per_class = None
        self.true_positives = None
        self.false_positives = None
        self.cumulative_true_positives = None
        self.cumulative_false_positives = None
        self.cumulative_precisions = None
        self.cumulative_recalls = None
        self.average_precisions = None
        self.mean_average_precision = None

    # ------------------------------------------------------------------ #

    def __call__(
        self,
        img_height,
        img_width,
        batch_size,
        data_generator_mode="resize",
        round_confidences=False,
        matching_iou_threshold=0.5,
        border_pixels="include",
        sorting_algorithm="quicksort",
        average_precision_mode="sample",
        num_recall_points=11,
        ignore_neutral_boxes=True,
        return_precisions=False,
        return_recalls=False,
        return_average_precisions=False,
        verbose=True,
        decoding_confidence_thresh=0.01,
        decoding_iou_threshold=0.45,
        decoding_top_k=200,
        decoding_pred_coords="centroids",
        decoding_normalize_coords=True,
    ):
        self.predict_on_dataset(
            img_height=img_height,
            img_width=img_width,
            batch_size=batch_size,
            data_generator_mode=data_generator_mode,
            decoding_confidence_thresh=decoding_confidence_thresh,
            decoding_iou_threshold=decoding_iou_threshold,
            decoding_top_k=decoding_top_k,
            decoding_pred_coords=decoding_pred_coords,
            decoding_normalize_coords=decoding_normalize_coords,
            decoding_border_pixels=border_pixels,
            round_confidences=round_confidences,
            verbose=verbose,
        )
        self.get_num_gt_per_class(
            ignore_neutral_boxes=ignore_neutral_boxes, verbose=False
        )
        self.match_predictions(
            ignore_neutral_boxes=ignore_neutral_boxes,
            matching_iou_threshold=matching_iou_threshold,
            border_pixels=border_pixels,
            sorting_algorithm=sorting_algorithm,
            verbose=verbose,
        )
        self.compute_precision_recall()
        self.compute_average_precisions(
            mode=average_precision_mode, num_recall_points=num_recall_points
        )
        mean_ap = self.compute_mean_average_precision()

        out = [mean_ap]
        if return_average_precisions:
            out.append(self.average_precisions)
        if return_precisions:
            out.append(self.cumulative_precisions)
        if return_recalls:
            out.append(self.cumulative_recalls)
        return out[0] if len(out) == 1 else tuple(out)

    # ------------------------------------------------------------------ #

    def predict_on_dataset(
        self,
        img_height,
        img_width,
        batch_size,
        data_generator_mode="resize",
        decoding_confidence_thresh=0.01,
        decoding_iou_threshold=0.45,
        decoding_top_k=200,
        decoding_pred_coords="centroids",
        decoding_normalize_coords=True,
        decoding_border_pixels="include",
        round_confidences=False,
        verbose=True,
        ret=False,
        device_decode=True,
        decoding_compact_pool="auto",
    ):
        """Run the model over the whole dataset and bucket boxes per class.

        With ``device_decode`` (default), 'training'-mode raw predictions are
        decoded by the fixed-shape on-device decoder with the
        DecodeDetections-layer selection semantics, honoring
        ``decoding_border_pixels`` for the NMS IoU — much faster on large
        datasets. Its one approximation vs the reference's host decoder is
        the static NMS candidate pool (top ``nms_max_output_size`` per
        class, see decoder._decode_caffe_batched for the exactness bound).
        Set False for the host NumPy decoder (the reference's training-mode
        evaluation behavior, no candidate cap). ``decoding_compact_pool``
        is the device decoder's cross-class candidate compaction
        (decoder.py; 'auto' = on, M=512 — mAP-validated in
        docs/benchmarks/evaluator_decode_agreement_compact.md).
        """
        pf = self.pred_format
        transformations = [ConvertTo3Channels()]
        if data_generator_mode == "pad":
            transformations.append(
                RandomPadFixedAR(
                    patch_aspect_ratio=img_width / img_height,
                    labels_format=self.gt_format,
                )
            )
        elif data_generator_mode != "resize":
            raise ValueError(
                f"`data_generator_mode` must be 'resize' or 'pad', got {data_generator_mode!r}."
            )
        transformations.append(
            Resize(height=img_height, width=img_width, labels_format=self.gt_format)
        )

        generator = self.data_generator.generate(
            batch_size=batch_size,
            shuffle=False,
            transformations=transformations,
            label_encoder=None,
            returns=[
                "processed_images",
                "image_ids",
                "evaluation-neutral",
                "inverse_transforms",
                "original_labels",
            ],
            keep_images_without_gt=True,
            degenerate_box_handling="remove",
        )

        if self.data_generator.image_ids is None:
            self.data_generator.image_ids = list(
                range(self.data_generator.get_dataset_size())
            )

        results = [[] for _ in range(self.n_classes + 1)]
        n_images = self.data_generator.get_dataset_size()
        n_batches = int(ceil(n_images / batch_size))

        batches = range(n_batches)
        if verbose:
            try:
                from tqdm import trange

                batches = trange(n_batches, desc="Producing predictions batch-wise")
            except ImportError:
                pass
        # Pipelined dispatch/drain: dispatching the (jitted) forward and the
        # on-device decode is asynchronous, so the device computes batch N
        # while the host generator loads/resizes batch N+1 and while N-1's
        # small (B, top_k, 6) result crosses back. The per-batch
        # ``np.asarray`` sync that used to sit inside the loop serialized
        # host prep, dispatch latency, and device compute end-to-end —
        # measured 11.6 img/s device vs 22.8 host on 320 crowded images;
        # pipelining is what makes the device path the fast default.
        # Device-decoded results are tiny, so in-flight depth is bounded
        # only for the paths that keep the raw (B, #boxes, C+12) tensor.
        from collections import deque

        max_in_flight = (
            64 if (self.model_mode == "training" and device_decode) else 4
        )
        pending = deque()

        def _drain_one():
            y_dev, meta = pending.popleft()
            batch_image_ids, batch_inverse_transforms = meta
            if self.model_mode == "training" and device_decode:
                decoded = np.asarray(y_dev)
                y_pred = [item[item[:, 0] != 0] for item in decoded]
            elif self.model_mode == "training":
                y_pred = decode_detections(
                    np.asarray(y_dev),
                    confidence_thresh=decoding_confidence_thresh,
                    iou_threshold=decoding_iou_threshold,
                    top_k=decoding_top_k,
                    input_coords=decoding_pred_coords,
                    normalize_coords=decoding_normalize_coords,
                    img_height=img_height,
                    img_width=img_width,
                    border_pixels=decoding_border_pixels,
                )
            else:
                # Decoded in-graph: drop all-zero padding rows.
                y_pred = np.asarray(y_dev)
                y_pred = [item[item[:, 0] != 0] for item in y_pred]
            y_pred = apply_inverse_transforms(y_pred, batch_inverse_transforms)

            for k, batch_item in enumerate(y_pred):
                image_id = batch_image_ids[k]
                for box in batch_item:
                    confidence = box[pf["conf"]]
                    if round_confidences:
                        confidence = round(confidence, round_confidences)
                    results[int(box[pf["class_id"]])].append(
                        (
                            image_id,
                            confidence,
                            round(float(box[pf["xmin"]]), 1),
                            round(float(box[pf["ymin"]]), 1),
                            round(float(box[pf["xmax"]]), 1),
                            round(float(box[pf["ymax"]]), 1),
                        )
                    )

        for _ in batches:
            (batch_X, batch_image_ids, batch_eval_neutral,
             batch_inverse_transforms, batch_orig_labels) = next(generator)
            # Keep the model output wherever it lives (device for a jitted
            # apply): the raw (B, #boxes, C+12) tensor is large, and pulling
            # it to host just to re-upload for decoding costs more than the
            # whole forward pass. Only decoded detections cross the boundary.
            y_pred = self.model(batch_X)
            if self.model_mode == "training" and device_decode:
                from ssd_keras_tpu.decoder import decode_detections_fixed

                y_pred = decode_detections_fixed(
                    y_pred,
                    confidence_thresh=decoding_confidence_thresh,
                    iou_threshold=decoding_iou_threshold,
                    top_k=decoding_top_k,
                    input_coords=decoding_pred_coords,
                    normalize_coords=decoding_normalize_coords,
                    img_height=img_height,
                    img_width=img_width,
                    border_pixels=decoding_border_pixels,
                    compact_pool=decoding_compact_pool,
                )
            pending.append((y_pred, (batch_image_ids, batch_inverse_transforms)))
            if len(pending) >= max_in_flight:
                _drain_one()
        while pending:
            _drain_one()

        self.prediction_results = results
        if ret:
            return results

    def write_predictions_to_txt(
        self, classes=None, out_file_prefix="comp3_det_test_", verbose=True
    ):
        """Write per-class VOC-format results files (submission format)."""
        if self.prediction_results is None:
            raise ValueError("Run `predict_on_dataset()` first.")
        for class_id in range(1, self.n_classes + 1):
            suffix = f"{class_id:04d}" if classes is None else classes[class_id]
            with open(f"{out_file_prefix}{suffix}.txt", "w") as f:
                for prediction in self.prediction_results[class_id]:
                    row = list(prediction)
                    try:
                        # VOC submission format: 6-digit numeric image ids
                        # (average_precision_evaluator.py:467). Non-numeric
                        # ids (custom datasets) are written verbatim.
                        row[0] = f"{int(row[0]):06d}"
                    except (TypeError, ValueError):
                        row[0] = str(row[0])
                    row[1] = round(row[1], 4)
                    f.write(" ".join(map(str, row)) + "\n")

    def get_num_gt_per_class(self, ignore_neutral_boxes=True, verbose=True, ret=False):
        """Count non-neutral GT boxes per class across the dataset."""
        if self.data_generator.labels is None:
            raise ValueError("No ground truth available.")
        counts = np.zeros(self.n_classes + 1, dtype=np.int64)
        ci = self.gt_format["class_id"]
        neutral = self.data_generator.eval_neutral
        for i, boxes in enumerate(self.data_generator.labels):
            boxes = np.asarray(boxes)
            for j in range(boxes.shape[0]):
                if ignore_neutral_boxes and neutral is not None and neutral[i][j]:
                    continue
                counts[int(boxes[j, ci])] += 1
        self.num_gt_per_class = counts
        if ret:
            return counts

    def match_predictions(
        self,
        ignore_neutral_boxes=True,
        matching_iou_threshold=0.5,
        border_pixels="include",
        sorting_algorithm="quicksort",
        verbose=True,
        ret=False,
    ):
        """Greedy conf-descending matching of predictions to ground truth.

        A prediction is a TP if its best-IoU same-class GT box (within the
        same image) clears the threshold and wasn't already claimed; repeat
        detections of a claimed GT are FPs; matches to eval-neutral boxes are
        skipped entirely (neither TP nor FP).
        """
        if self.prediction_results is None:
            raise ValueError("Run `predict_on_dataset()` first.")
        if self.data_generator.labels is None:
            raise ValueError("Matching predictions requires ground truth.")

        gi = self.gt_format
        class_id_gt = gi["class_id"]
        box_cols = [gi["xmin"], gi["ymin"], gi["xmax"], gi["ymax"]]
        neutral_available = self.data_generator.eval_neutral is not None

        ground_truth = {}
        for i, image_id in enumerate(self.data_generator.image_ids):
            labels = np.asarray(self.data_generator.labels[i])
            if ignore_neutral_boxes and neutral_available:
                ground_truth[str(image_id)] = (
                    labels,
                    np.asarray(self.data_generator.eval_neutral[i]),
                )
            else:
                ground_truth[str(image_id)] = labels

        true_positives = [[]]
        false_positives = [[]]
        cumulative_true_positives = [[]]
        cumulative_false_positives = [[]]

        # Native fast path: the per-prediction matching loop in C++
        # (ssd_keras_tpu/native). Falls back to the Python loop below.
        from ssd_keras_tpu import native
        from ssd_keras_tpu.ops.boxes import border_delta as _bd

        use_native = native.available()
        if use_native:
            image_index = {
                str(image_id): i
                for i, image_id in enumerate(self.data_generator.image_ids)
            }

        for class_id in range(1, self.n_classes + 1):
            predictions = self.prediction_results[class_id]
            if use_native and len(predictions) > 0:
                confs = np.array([p[1] for p in predictions], dtype=np.float32)
                order = np.argsort(-confs, kind=sorting_algorithm)
                pred_img = np.array(
                    [image_index[str(predictions[i][0])] for i in order],
                    dtype=np.int32,
                )
                pred_boxes = np.array(
                    [predictions[i][2:6] for i in order], dtype=np.float32
                )
                # Class-filtered GT per image, flattened with prefix offsets.
                gt_box_chunks, neutral_chunks, offsets = [], [], [0]
                track_neutral = ignore_neutral_boxes and neutral_available
                for i in range(len(self.data_generator.image_ids)):
                    labels = np.asarray(self.data_generator.labels[i])
                    if labels.size == 0:
                        offsets.append(offsets[-1])
                        continue
                    mask = labels[:, class_id_gt] == class_id
                    gt_box_chunks.append(
                        labels[mask][:, box_cols].astype(np.float32)
                    )
                    if track_neutral:
                        neutral_chunks.append(
                            np.asarray(self.data_generator.eval_neutral[i])[mask]
                        )
                    offsets.append(offsets[-1] + int(mask.sum()))
                gt_boxes = (
                    np.concatenate(gt_box_chunks, axis=0)
                    if gt_box_chunks
                    else np.zeros((0, 4), np.float32)
                )
                gt_neutral = (
                    np.concatenate(neutral_chunks).astype(np.uint8)
                    if track_neutral and neutral_chunks
                    else None
                )
                result = native.match_predictions_class(
                    pred_img, pred_boxes, np.asarray(offsets, np.int32),
                    gt_boxes, gt_neutral, matching_iou_threshold,
                    _bd(border_pixels),
                )
                if result is not None:
                    tp_u8, fp_u8 = result
                    true_pos = tp_u8.astype(np.int64)
                    false_pos = fp_u8.astype(np.int64)
                    true_positives.append(true_pos)
                    false_positives.append(false_pos)
                    cumulative_true_positives.append(np.cumsum(true_pos))
                    cumulative_false_positives.append(np.cumsum(false_pos))
                    continue
            true_pos = np.zeros(len(predictions), dtype=np.int64)
            false_pos = np.zeros(len(predictions), dtype=np.int64)
            if len(predictions) == 0:
                true_positives.append(true_pos)
                false_positives.append(false_pos)
                cumulative_true_positives.append(np.array([]))
                cumulative_false_positives.append(np.array([]))
                continue

            image_ids = np.array([str(p[0]) for p in predictions])
            confs = np.array([p[1] for p in predictions], dtype=np.float32)
            boxes = np.array([p[2:6] for p in predictions], dtype=np.float32)
            order = np.argsort(-confs, kind=sorting_algorithm)

            gt_matched = {}
            for rank, idx in enumerate(order):
                image_id = image_ids[idx]
                pred_box = boxes[idx]
                entry = ground_truth[image_id]
                if ignore_neutral_boxes and neutral_available:
                    gt, eval_neutral = entry
                else:
                    gt, eval_neutral = entry, None
                gt = np.asarray(gt)
                if gt.size == 0:
                    false_pos[rank] = 1
                    continue
                class_mask = gt[:, class_id_gt] == class_id
                gt_c = gt[class_mask]
                if eval_neutral is not None:
                    neutral_c = eval_neutral[class_mask]
                if gt_c.size == 0:
                    false_pos[rank] = 1
                    continue
                overlaps = box_ops.iou(
                    gt_c[:, box_cols],
                    pred_box,
                    coords="corners",
                    mode="element-wise",
                    border_pixels=border_pixels,
                )
                match = int(np.argmax(overlaps))
                if overlaps[match] < matching_iou_threshold:
                    false_pos[rank] = 1
                    continue
                if eval_neutral is not None and bool(neutral_c[match]):
                    continue  # neutral GT: neither TP nor FP
                claimed = gt_matched.setdefault(
                    image_id, np.zeros(gt_c.shape[0], dtype=bool)
                )
                if not claimed[match]:
                    true_pos[rank] = 1
                    claimed[match] = True
                else:
                    false_pos[rank] = 1  # duplicate detection

            true_positives.append(true_pos)
            false_positives.append(false_pos)
            cumulative_true_positives.append(np.cumsum(true_pos))
            cumulative_false_positives.append(np.cumsum(false_pos))

        self.true_positives = true_positives
        self.false_positives = false_positives
        self.cumulative_true_positives = cumulative_true_positives
        self.cumulative_false_positives = cumulative_false_positives
        if ret:
            return (true_positives, false_positives,
                    cumulative_true_positives, cumulative_false_positives)

    def compute_precision_recall(self, verbose=True, ret=False):
        if self.cumulative_true_positives is None:
            raise ValueError("Run `match_predictions()` first.")
        if self.num_gt_per_class is None:
            raise ValueError("Run `get_num_gt_per_class()` first.")
        cumulative_precisions = [[]]
        cumulative_recalls = [[]]
        for class_id in range(1, self.n_classes + 1):
            tp = np.asarray(self.cumulative_true_positives[class_id], dtype=np.float64)
            fp = np.asarray(self.cumulative_false_positives[class_id], dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                precision = np.where(tp + fp > 0, tp / (tp + fp), 0)
            n_gt = self.num_gt_per_class[class_id]
            recall = tp / n_gt if n_gt > 0 else np.zeros_like(tp)
            cumulative_precisions.append(precision)
            cumulative_recalls.append(recall)
        self.cumulative_precisions = cumulative_precisions
        self.cumulative_recalls = cumulative_recalls
        if ret:
            return cumulative_precisions, cumulative_recalls

    def compute_average_precisions(
        self, mode="sample", num_recall_points=11, verbose=True, ret=False
    ):
        if self.cumulative_precisions is None:
            raise ValueError("Run `compute_precision_recall()` first.")
        if mode not in ("sample", "integrate"):
            raise ValueError("`mode` must be 'sample' or 'integrate'.")
        average_precisions = [0.0]
        for class_id in range(1, self.n_classes + 1):
            precision = np.asarray(self.cumulative_precisions[class_id])
            recall = np.asarray(self.cumulative_recalls[class_id])
            ap = 0.0
            if precision.size == 0:
                average_precisions.append(ap)
                continue
            if mode == "sample":
                for t in np.linspace(0, 1, num_recall_points, endpoint=True):
                    eligible = precision[recall >= t]
                    ap += float(np.amax(eligible)) if eligible.size else 0.0
                ap /= num_recall_points
            else:  # integrate: reverse-scan running max over unique recalls
                unique_recalls, unique_indices = np.unique(recall, return_index=True)
                maximal_precisions = np.zeros_like(unique_recalls)
                recall_deltas = np.zeros_like(unique_recalls)
                for i in range(len(unique_recalls) - 2, -1, -1):
                    begin, end = unique_indices[i], unique_indices[i + 1]
                    maximal_precisions[i] = max(
                        np.amax(precision[begin:end]), maximal_precisions[i + 1]
                    )
                    recall_deltas[i] = unique_recalls[i + 1] - unique_recalls[i]
                ap = float(np.sum(maximal_precisions * recall_deltas))
            average_precisions.append(ap)
        self.average_precisions = average_precisions
        if ret:
            return average_precisions

    def compute_mean_average_precision(self, ret=True):
        if self.average_precisions is None:
            raise ValueError("Run `compute_average_precisions()` first.")
        self.mean_average_precision = float(np.average(self.average_precisions[1:]))
        if ret:
            return self.mean_average_precision
