from ssd_keras_tpu.eval.evaluator import Evaluator
from ssd_keras_tpu.eval.coco import get_coco_category_maps, predict_all_to_json

__all__ = ["Evaluator", "get_coco_category_maps", "predict_all_to_json"]
