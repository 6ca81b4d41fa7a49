from delivr_cfos_tpu.ops.morphology import (
    binary_erosion_cross,
    binarize_logits,
)

__all__ = ["binary_erosion_cross", "binarize_logits"]
