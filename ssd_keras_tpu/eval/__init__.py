from ssd_keras_tpu.eval.evaluator import Evaluator
from ssd_keras_tpu.eval.coco import get_coco_category_maps, predict_all_to_json
from ssd_keras_tpu.eval.cocoeval import COCOEvalBBox, coco_bbox_iou

__all__ = [
    "Evaluator",
    "get_coco_category_maps",
    "predict_all_to_json",
    "COCOEvalBBox",
    "coco_bbox_iou",
]
