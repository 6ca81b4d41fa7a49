from delivr_cfos_tpu.pipeline.stage01_downsample_mask import downsample_mask
from delivr_cfos_tpu.pipeline.stage02_inference import run_inference
from delivr_cfos_tpu.pipeline.stage03_count_blobs import count_blobs

__all__ = ["downsample_mask", "run_inference", "count_blobs"]
