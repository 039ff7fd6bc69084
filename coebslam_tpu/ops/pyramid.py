"""Image pyramid + separable Gaussian blur.

TPU-native replacement for the reference's `ORBextractor::ComputePyramid`
(ORBextractor.cc:1344-1367, 8 levels at scale 1.2 via cv::resize) and the
7x7 sigma=2 Gaussian applied before descriptor extraction
(ORBextractor.cc:1318).  Everything is static-shape: the per-level sizes are
computed at trace time from the config.
"""
from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig


def pyramid_shapes(height: int, width: int, n_levels: int,
                   scale_factor: float) -> List[Tuple[int, int]]:
    """Static per-level (H, W) — matches cv::resize round semantics."""
    shapes = [(height, width)]
    for lvl in range(1, n_levels):
        inv = 1.0 / (scale_factor ** lvl)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def resize_bilinear(img, out_shape: Tuple[int, int]):
    """Bilinear resize with half-pixel centers (cv::INTER_LINEAR semantics).

    jax.image.resize('linear') uses the same half-pixel convention, so this
    is a thin wrapper kept as a seam for a future Pallas implementation.
    """
    return jax.image.resize(img, out_shape, method="linear")


def build_pyramid(img, cfg: OrbConfig) -> List[jnp.ndarray]:
    """[H, W] float32 grayscale -> list of n_levels images, level 0 = input.

    Each level is resized from the previous one (not from level 0), matching
    the reference's cascade (ORBextractor.cc:1356 resizes mvImagePyramid[l-1])
    — this subtly low-passes higher levels, which affects FAST responses, so
    we reproduce it rather than resampling from the base.
    """
    h, w = img.shape
    shapes = pyramid_shapes(h, w, cfg.n_levels, cfg.scale_factor)
    levels = [img]
    for lvl in range(1, cfg.n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels


@functools.lru_cache(maxsize=8)
def gaussian_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> tuple:
    """1-D Gaussian taps (as a tuple for hashability / trace caching).

    Same formula cv::getGaussianKernel uses for sigma > 0.
    """
    half = (ksize - 1) / 2.0
    taps = [math.exp(-((i - half) ** 2) / (2.0 * sigma * sigma))
            for i in range(ksize)]
    s = sum(taps)
    return tuple(t / s for t in taps)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect-101 borders (OpenCV default
    BORDER_REFLECT_101), applied before BRIEF sampling exactly as the
    reference does (ORBextractor.cc:1318-1322)."""
    taps = jnp.array(gaussian_kernel_1d(ksize, sigma), dtype=img.dtype)
    pad = ksize // 2
    # Horizontal pass.
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    x = sum(taps[i] * x[:, i:i + img.shape[1]] for i in range(ksize))
    # Vertical pass.
    x = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    x = sum(taps[i] * x[i:i + img.shape[0], :] for i in range(ksize))
    return x


def rgb_to_gray(img_rgb):
    """[H, W, 3] uint8/float -> [H, W] float32 luma, cv::cvtColor BGR2GRAY /
    RGB2GRAY coefficients (Tracking.cc:207-233 converts with OpenCV)."""
    img = img_rgb.astype(jnp.float32)
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
