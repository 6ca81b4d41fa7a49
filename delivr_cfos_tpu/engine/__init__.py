from delivr_cfos_tpu.engine.sliding_window import (
    SlidingWindowConfig,
    dense_patch_starts,
    infer_volume,
    scan_interval,
)

__all__ = [
    "SlidingWindowConfig",
    "dense_patch_starts",
    "infer_volume",
    "scan_interval",
]
