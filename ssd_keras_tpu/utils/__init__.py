from ssd_keras_tpu.utils.profiling import benchmark_fps, device_sync, trace

__all__ = ["benchmark_fps", "device_sync", "trace"]
