"""Rotation-steered 256-bit BRIEF descriptors, batched.

Replaces the reference's `computeOrbDescriptor` (ORBextractor.cc:110-156 +
the learned `bit_pattern_31_` table).  We do NOT copy that table: the pair
pattern here is generated deterministically with the original ORB paper's
recipe (Gaussian-distributed test points, sigma = patch/5, clipped to the
patch), which yields the same descriptor statistics; extractor and matcher
share this one pattern, so the system is self-consistent.

Bits are packed into uint8[32] for storage (map arenas) and unpacked to a
+-1 encoding for Hamming via MXU matmul (see ops/matching.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

N_BITS = 256
_PATTERN_SEED = 20240817
_PATTERN_CLIP = 13   # keep test points within radius 13 like the ORB pattern


@functools.lru_cache(maxsize=1)
def brief_pattern():
    """[256, 2, 2] int32 — (pair, point{a,b}, (y, x)) test coordinates.

    Deterministic Gaussian sampling (ORB paper §4.4 "steered BRIEF"
    construction: p ~ N(0, (S/5)^2) i.i.d.), seeded so every process
    generates the identical pattern.
    """
    rng = np.random.RandomState(_PATTERN_SEED)
    sigma = 31.0 / 5.0
    pts = rng.randn(N_BITS, 2, 2) * sigma
    pts = np.clip(np.round(pts), -_PATTERN_CLIP, _PATTERN_CLIP).astype(np.int32)
    # Avoid degenerate identical pairs (would always produce 0 bits).
    for i in range(N_BITS):
        while (pts[i, 0] == pts[i, 1]).all():
            pts[i, 1] = np.clip(np.round(rng.randn(2) * sigma),
                                -_PATTERN_CLIP, _PATTERN_CLIP).astype(np.int32)
    # numpy on purpose: cached jnp constants leak tracers across jit traces.
    return pts


def describe(patches, angles):
    """Compute steered-BRIEF descriptors.

    Args:
      patches: [N, P, P] float32 blurred-image patches (ops/patches.py).
      angles: [N] float32 keypoint orientations (radians).

    Returns:
      bits: [N, 256] uint8 in {0, 1} — bit b = 1 iff I(a) < I(b), the same
        comparison polarity the reference uses (ORBextractor.cc:117 GET_VALUE
        t0 < t1).
    """
    n, p, _ = patches.shape
    pc = p // 2
    pat = jnp.asarray(brief_pattern(), jnp.float32)  # [256, 2, 2] (y, x)
    py = pat[..., 0]                                # [256, 2]
    px = pat[..., 1]

    cos = jnp.cos(angles)[:, None, None]            # [N, 1, 1]
    sin = jnp.sin(angles)[:, None, None]
    # Rotate pattern by keypoint angle (reference rotates the same way:
    # x' = x cos - y sin ; y' = x sin + y cos).
    rx = jnp.round(px[None] * cos - py[None] * sin).astype(jnp.int32)
    ry = jnp.round(px[None] * sin + py[None] * cos).astype(jnp.int32)
    rx = jnp.clip(rx + pc, 0, p - 1)
    ry = jnp.clip(ry + pc, 0, p - 1)

    flat = patches.reshape(n, p * p)                # [N, P*P]
    idx = (ry * p + rx).reshape(n, -1)              # [N, 512]
    vals = jnp.take_along_axis(flat, idx, axis=1).reshape(n, N_BITS, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)


def pack_bits(bits):
    """[N, 256] {0,1} -> [N, 32] uint8 packed little-endian within bytes."""
    n = bits.shape[0]
    b = bits.reshape(n, 32, 8).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts[None, None, :], axis=-1).astype(jnp.uint8)


def unpack_bits(packed):
    """[..., 32] uint8 -> [..., 256] {0,1} uint8."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], N_BITS)


def to_signed(bits):
    """{0,1} bits -> +-1 bfloat16 for MXU Hamming (ops/matching.py)."""
    return (bits.astype(jnp.bfloat16) * 2.0 - 1.0)
