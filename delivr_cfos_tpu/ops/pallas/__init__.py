from delivr_cfos_tpu.ops.pallas.fused_norm_mish import instance_norm_mish_pallas

__all__ = ["instance_norm_mish_pallas"]
