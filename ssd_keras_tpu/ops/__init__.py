from ssd_keras_tpu.ops import anchors, boxes, matching, nms  # noqa: F401
