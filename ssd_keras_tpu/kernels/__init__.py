from ssd_keras_tpu.kernels.nms_pallas import greedy_nms_mask_batched

__all__ = ["greedy_nms_mask_batched"]
