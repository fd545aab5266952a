"""On-device 2D corruption model for pretraining, as pure jitted functions.

Behavioral parity target: /root/reference/lib/data/augmentation.py:10-99
(Augmenter2D). The reference runs this in torch under no_grad per batch on
GPU; here it is a pure `(key, motion_2d) -> motion_2d` jnp function that
fuses into the training step (no host sync, no extra launches).

The corruption makes GT 2D keypoints look like detector output:
- mixture noise per joint: per-joint gaussian (learned mean/std) vs uniform
  (+-uniform_range/2), selected by learned per-joint weights, sampled on 27
  keyframes then linearly interpolated over the T frames (align_corners
  semantics), plus small per-frame gaussian jitter;
- synthesized confidence from displacement via f = a/(d+a) + b*d plus a
  gaussian shift (params from d2c_params.pkl);
- masking: per-(N,T,J) keep mask and per-frame keep mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NUM_KEYFRAMES = 27
FRAME_NOISE_STD = 0.002


@dataclass(frozen=True)
class NoiseParams:
    """Learned detector-noise model (vendored from params/synthetic_noise.pth
    + params/d2c_params.pkl of the reference)."""

    mean: np.ndarray          # (17, 2)
    std: np.ndarray           # (17, 2)
    weight: np.ndarray        # (17,) mixture weight: P(gaussian)
    uniform_range: float      # total width of the uniform component
    a: float                  # dis2conf params
    b: float
    m: float
    s: float

    @classmethod
    def load(cls, noise_path: str, d2c_params_path: str) -> "NoiseParams":
        """Load from the reference's file formats (.pth needs torch)."""
        from motionbert_tpu.core.config import read_pkl

        d2c = read_pkl(d2c_params_path)
        if noise_path.endswith(".npz"):
            z = np.load(noise_path)
            noise = {k: z[k] for k in z.files}
        else:
            import torch

            noise = {
                k: (v.numpy() if hasattr(v, "numpy") else v)
                for k, v in torch.load(noise_path, weights_only=False).items()
            }
        return cls(
            mean=np.asarray(noise["mean"], np.float32),
            std=np.asarray(noise["std"], np.float32),
            weight=np.asarray(noise["weight"], np.float32),
            uniform_range=float(noise.get("uniform_range", 0.06)),
            a=float(d2c["a"]), b=float(d2c["b"]),
            m=float(d2c["m"]), s=float(d2c["s"]),
        )


def _interp_keyframes(delta, num_frames):
    """Linear interp (B, K, J, 2) -> (B, T, J, 2), align_corners=True.

    Equivalent to the reference's trilinear F.interpolate on
    (B, 1, K, J, 2) -> (B, 1, T, J, 2) (augmentation.py:57): only the
    keyframe axis resizes, and align_corners linear interp along one axis
    is exactly this lerp.
    """
    K = delta.shape[1]
    pos = jnp.linspace(0.0, K - 1.0, num_frames)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, K - 1)
    w = (pos - lo)[None, :, None, None]
    return delta[:, lo] * (1 - w) + delta[:, hi] * w


def dis2conf(key, dis, p: NoiseParams):
    """Displacement -> confidence with gaussian shift (augmentation.py:22-27)."""
    f = p.a / (dis + p.a) + p.b * dis
    shift = jax.random.normal(key, dis.shape) * p.s + p.m
    return f + shift


def add_noise(key, motion_2d, p: NoiseParams):
    """Corrupt GT xy and synthesize confidence.

    motion_2d: (N, T, J, >=2); returns (N, T, J, 3) with conf channel.
    """
    xy = motion_2d[..., :2]
    N, T, J = xy.shape[:3]
    k_sel, k_gauss, k_unif, k_frame, k_conf = jax.random.split(key, 5)

    mean = jnp.asarray(p.mean)
    std = jnp.asarray(p.std)
    weight = jnp.asarray(p.weight)[:, None]  # (J, 1)

    sel = jax.random.uniform(k_sel, (N, NUM_KEYFRAMES, J, 1))
    gaussian = jax.random.normal(k_gauss, (N, NUM_KEYFRAMES, J, 2)) * std + mean
    uniform = (jax.random.uniform(k_unif, (N, NUM_KEYFRAMES, J, 2)) - 0.5) \
        * p.uniform_range
    delta = jnp.where(sel < weight, gaussian, uniform)
    delta = _interp_keyframes(delta, T)
    delta = delta + jax.random.normal(k_frame, (T, J, 2)) * FRAME_NOISE_STD

    noisy = xy + delta
    dis = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    conf = jnp.clip(dis2conf(k_conf, dis, p), 0, 1)[..., None]
    return jnp.concatenate([noisy, conf], axis=-1)


def add_mask(key, x, mask_ratio: float, mask_T_ratio: float):
    """Random joint + frame masking (augmentation.py:67-74)."""
    N, T, J, C = x.shape
    k1, k2 = jax.random.split(key)
    mask = jax.random.uniform(k1, (N, T, J, 1)) > mask_ratio
    mask_T = jax.random.uniform(k2, (1, T, 1, 1)) > mask_T_ratio
    return x * mask * mask_T


def augment2d(key, motion_2d, p: NoiseParams | None, noise: bool,
              mask: bool, mask_ratio: float = 0.0, mask_T_ratio: float = 0.0):
    """Full corruption pipeline (augmentation.py:76-81), jit-safe."""
    k_noise, k_mask = jax.random.split(key)
    if noise:
        motion_2d = add_noise(k_noise, motion_2d, p)
    if mask:
        motion_2d = add_mask(k_mask, motion_2d, mask_ratio, mask_T_ratio)
    return motion_2d
