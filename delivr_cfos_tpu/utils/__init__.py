from delivr_cfos_tpu.utils.hooks import HookEmitter
from delivr_cfos_tpu.utils.logging import log, StageTimer

__all__ = ["HookEmitter", "log", "StageTimer"]
