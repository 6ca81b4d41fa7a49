from delivr_cfos_tpu.ops.pallas.conv3d_cs import conv3d_cs
from delivr_cfos_tpu.ops.pallas.fused_norm_mish import instance_norm_mish_pallas

__all__ = ["conv3d_cs", "instance_norm_mish_pallas"]
