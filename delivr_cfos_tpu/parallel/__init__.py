from delivr_cfos_tpu.parallel.mesh import make_mesh
from delivr_cfos_tpu.parallel.sharded_inference import (
    sharded_infer_volume,
    sharded_window_pass,
)

__all__ = ["make_mesh", "sharded_infer_volume", "sharded_window_pass"]
