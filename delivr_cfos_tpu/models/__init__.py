from delivr_cfos_tpu.models.basic_unet import (
    BasicUNetConfig,
    basic_unet_apply,
    init_params,
)
from delivr_cfos_tpu.models.convert import (
    load_torch_checkpoint,
    torch_state_dict_to_params,
)

__all__ = [
    "BasicUNetConfig",
    "basic_unet_apply",
    "init_params",
    "load_torch_checkpoint",
    "torch_state_dict_to_params",
]
