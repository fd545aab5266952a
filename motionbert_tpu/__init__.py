"""motionbert_tpu — a TPU-native (JAX/XLA/Pallas/pjit) human-motion representation framework.

Re-designed from scratch with the capabilities of MotionBERT (ICCV 2023):
a unified spatio-temporal transformer backbone (DSTformer) pretrained on
masked 2D->3D lifting, with downstream heads for 3D pose estimation,
skeleton-based action recognition, and SMPL human-mesh recovery, plus
in-the-wild inference from 2D keypoint detections.

Everything on the compute path is pure-functional JAX: models are Flax
modules, training steps are single jitted `(state, batch, rng) -> (state,
metrics)` functions, multi-device execution is SPMD over a
`jax.sharding.Mesh`, and the hot attention path has a fused Pallas TPU
kernel. Host-side data work (clip slicing, joint remaps, normalization)
lives in numpy feeding a double-buffered device prefetch pipeline.
"""

__version__ = "0.1.0"
