from delivr_cfos_tpu.parallel.mesh import make_mesh
from delivr_cfos_tpu.parallel.sharded_inference import (
    plan_sharding,
    sharded_infer_volume,
)

__all__ = ["make_mesh", "plan_sharding", "sharded_infer_volume"]
