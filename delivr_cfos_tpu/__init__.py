"""delivr_cfos_tpu — TPU-native whole-brain cFos inference framework.

A ground-up JAX/XLA/Pallas rebuild of the DELiVR pipeline
(reference: erturklab/delivr_cfos): whole mouse brains imaged as terabyte-scale
16-bit light-sheet TIFF z-stacks go in; binary cFos+ cell segmentations,
per-cell centroid/size tables, Allen-CCF3-registered coordinates, per-region
count tables/heatmaps, and region-colored visualization stacks come out.

Design stance (see SURVEY.md §7): volumes live in TPU HBM as (sharded) arrays;
the host only streams chunks and writes artifacts. External contracts of the
reference are preserved — config.json schema, stage output directory layout,
the HOOK stdout progress protocol, and the CSV/SWC/XLSX/TIFF output formats —
while every internal mechanism is replaced with TPU-first machinery:

- MONAI-style 3D BasicUNet as a Flax module with fused Pallas kernels
  (reference: inference/inference.py:190-197)
- sliding-window inference as an on-device coset overlap-add engine with
  host-side active-window scheduling (reference: inference/sliding_window_inferer.py)
- anisotropic resampling / masking as XLA reduce_window + gather ops
  (reference: downsample/downsample_and_mask.py)
- connected-component labeling + segment statistics on device
  (reference: count_blobs.py, external cc3d)
- affine + B-spline deformable atlas registration as JAX optimization
  (reference: automate_mBrainaligner.py, external mBrainAligner binaries)
- multi-chip spatial sharding via shard_map + halo exchange over ICI
  (reference: torch.nn.DataParallel, inference/inference.py:217-219)
"""

__version__ = "0.1.0"
