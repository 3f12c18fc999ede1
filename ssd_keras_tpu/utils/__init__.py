from ssd_keras_tpu.utils.profiling import benchmark_fps, device_sync, trace
from ssd_keras_tpu.utils.visualization import draw_detections

__all__ = ["benchmark_fps", "device_sync", "trace", "draw_detections"]
