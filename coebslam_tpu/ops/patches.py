"""Keypoint patch gathering and intensity-centroid orientation.

Replaces the reference's `IC_Angle` (ORBextractor.cc:80-108): instead of a
scalar loop over a umax-table circle per keypoint, we gather one [N, P, P]
patch tensor and compute all N orientations as two masked tensor
contractions — dense, batched, MXU/VPU-friendly.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp

# Patch edge for descriptor sampling.  Must cover the rotated BRIEF pattern:
# pattern coords lie in [-13, 13], rotation pushes them to radius <= 13*sqrt2
# ~= 18.4, so a 48-px patch (radius 23) is safe.  48 is also lane-friendly.
PATCH_SIZE = 48
ORIENT_RADIUS = 15  # intensity-centroid circle radius (HALF_PATCH_SIZE)


def gather_patches(img, yx, patch_size: int = PATCH_SIZE):
    """Gather [N, P, P] patches centered at integer keypoint coords.

    Args:
      img: [H, W] float32 (typically the Gaussian-blurred pyramid level).
      yx: [N, 2] int32 (row, col) at this level's scale.
    """
    pad = patch_size // 2
    padded = jnp.pad(img, pad, mode="edge")
    # vmapped dynamic_slice lowers to a gather of CONTIGUOUS [P, P] blocks —
    # ~4x faster on TPU than the element-wise advanced-indexing gather
    # (rows[:, :, None], cols[:, None, :]), which touches 4.7M scattered
    # addresses.
    import jax

    def one(c):
        return jax.lax.dynamic_slice(padded, (c[0], c[1]),
                                     (patch_size, patch_size))

    return jax.vmap(one)(yx)


@functools.lru_cache(maxsize=4)
def _centroid_weights(patch_size: int, radius: int):
    """Static (wx, wy, mask) grids for the intensity centroid."""
    import numpy as np
    d = np.arange(patch_size) - patch_size // 2
    dy, dx = np.meshgrid(d, d, indexing="ij")
    mask = (dx * dx + dy * dy) <= radius * radius
    wx = (dx * mask).astype(np.float32)
    wy = (dy * mask).astype(np.float32)
    # Return numpy: cached jnp constants leak tracers across jit traces.
    return wx, wy


def orientations(patches):
    """Intensity-centroid angle per patch: theta = atan2(m01, m10).

    Same moment definition as the reference's IC_Angle over a radius-15
    circular patch; [N, P, P] -> [N] radians in (-pi, pi].
    """
    wx, wy = _centroid_weights(patches.shape[-1], ORIENT_RADIUS)
    m10 = jnp.einsum("nij,ij->n", patches, wx)
    m01 = jnp.einsum("nij,ij->n", patches, wy)
    return jnp.arctan2(m01, m10)
