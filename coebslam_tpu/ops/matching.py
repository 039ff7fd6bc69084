"""Descriptor matching: MXU Hamming distances + constraint-masked selection.

TPU-native replacement for the whole of `ORBmatcher.cc` (1666 LoC of
per-keypoint grid lookups and popcount loops, SURVEY §2.1 ORBmatcher row).
The reference walks a 64x48 keypoint grid per query and popcounts candidate
descriptors one by one; here we compute the full [N, M] Hamming matrix in one
bf16 matmul on the MXU (for +-1-encoded bits, dot = 256 - 2*hamming, exact in
bf16 because all partial sums are small integers accumulated in fp32), then
express every search variant — projection windows, epipolar bands, BoW
buckets — as additive penalty masks on that matrix.  Selection is a row-wise
argmin + ratio test + optional mutual check + rotation-histogram filter.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .brief import N_BITS

# Penalty for masked-out candidate pairs.  A Python float, NOT a
# module-level device array: a captured jnp constant is embedded as an
# array constant in every jaxpr that closes over it, which both forces a
# host fetch at trace time and defeats XLA's scalar folding (measured:
# the same jitted match body runs 25 ms with an array constant vs 0.05 ms
# with a literal on TPU v5e — the array constant blocks the fusion that
# elides the [N, M] temporary).
BIG = 1e9


def hamming_matrix(signed_a, signed_b):
    """Hamming distances between +-1-encoded descriptor sets.

    Args:
      signed_a: [N, 256] bfloat16 in {-1, +1} (brief.to_signed).
      signed_b: [M, 256] bfloat16.
    Returns:
      [N, M] float32 distances in [0, 256].
    """
    dot = jnp.dot(signed_a, signed_b.T, preferred_element_type=jnp.float32)
    return 0.5 * (N_BITS - dot)


class MatchResult(NamedTuple):
    idx: jnp.ndarray        # [N] int32 — best column per row (-1 invalid)
    dist: jnp.ndarray       # [N] float32 — best distance
    valid: jnp.ndarray      # [N] bool


def match(dist_matrix, *, max_distance: float, ratio: Optional[float] = None,
          mutual: bool = False, row_valid=None, col_valid=None) -> MatchResult:
    """Row-wise nearest-neighbour selection with the reference's gates.

    Args:
      dist_matrix: [N, M] distances (already penalty-masked for any spatial /
        epipolar / bucket constraints).
      max_distance: absolute gate (TH_LOW=50 or TH_HIGH=100).
      ratio: best/second-best ratio test (e.g. 0.9 / 0.75), None to skip.
      mutual: also require the row to be its column's best (used by the
        initialization matcher's vnMatches21 check, ORBmatcher.cc:405-520).
      row_valid / col_valid: [N] / [M] bool keypoint validity masks.
    """
    d = dist_matrix
    if col_valid is not None:
        d = d + jnp.where(col_valid[None, :], 0.0, BIG)

    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    # Second best for the ratio test.  Mask the winner with an iota
    # compare, NOT a scatter: a [N]-row scatter lowers to a sequential
    # per-element loop on TPU (measured ~25 ms at N=2048 vs 0.05 ms for
    # the where-mask, which fuses into the second reduction).
    if d.shape[1] > 1:
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.where(col == best_idx[:, None], BIG, d)
    else:
        d2 = d
    second = jnp.min(d2, axis=1)

    ok = best <= max_distance
    if ratio is not None:
        ok &= best < ratio * second
    if mutual:
        col_best_row = jnp.argmin(d, axis=0)         # [M]
        ok &= col_best_row[best_idx] == jnp.arange(d.shape[0])
    if row_valid is not None:
        ok &= row_valid
    return MatchResult(jnp.where(ok, best_idx, -1), best, ok)


def window_penalty(uv_query, uv_target, radius):
    """[N, M] additive penalty: 0 inside a square search window, BIG outside.

    Reproduces the grid-windowed candidate set of
    ``Frame::GetFeaturesInArea`` (Frame.cc:503) without the host-side grid:
    the window test IS the candidate set.

    Args:
      uv_query: [N, 2] projected positions to search around.
      uv_target: [M, 2] keypoint positions.
      radius: scalar or [N] per-query radius (scale-dependent in the
        reference, ORBmatcher.cc:1382).
    """
    dx = jnp.abs(uv_query[:, None, 0] - uv_target[None, :, 0])
    dy = jnp.abs(uv_query[:, None, 1] - uv_target[None, :, 1])
    r = radius if jnp.ndim(radius) == 0 else radius[:, None]
    inside = (dx <= r) & (dy <= r)
    return jnp.where(inside, 0.0, BIG)


def level_penalty(level_query, level_target, min_shift: int, max_shift: int):
    """Octave-consistency penalty: target level must lie within
    [level_query + min_shift, level_query + max_shift] (the forward/backward
    octave logic of SearchByProjection, ORBmatcher.cc:1386-1412)."""
    diff = level_target[None, :] - level_query[:, None]
    ok = (diff >= min_shift) & (diff <= max_shift)
    return jnp.where(ok, 0.0, BIG)


def stereo_penalty(ur_pred, ur_target, radius):
    """Right-coordinate consistency for RGB-D/stereo matches
    (ORBmatcher.cc:1398: |ur - ur_pred| < r).  ur_target < 0 means no depth
    — no constraint applied there."""
    d = jnp.abs(ur_pred[:, None] - ur_target[None, :])
    ok = (ur_target[None, :] < 0) | (d <= (radius if jnp.ndim(radius) == 0
                                           else radius[:, None]))
    return jnp.where(ok, 0.0, BIG)


def rotation_consistency(angles_query, angles_target, match: MatchResult,
                         histo_length: int = 30, top_bins: int = 3):
    """Keep only matches whose angle difference falls in the 3 most popular
    histogram bins (`ORBmatcher::ComputeThreeMaxima`, ORBmatcher.cc:1602,
    used with HISTO_LENGTH=30)."""
    matched_target_angles = angles_target[jnp.clip(match.idx, 0)]
    rot = angles_query - matched_target_angles
    # Map to [0, 2pi) then to bins.
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)
    bins = jnp.clip((rot * histo_length / two_pi).astype(jnp.int32),
                    0, histo_length - 1)
    # One-hot reduction, not .at[bins].add: a data-dependent scatter-add
    # lowers to a sequential per-element loop on TPU.
    onehot = bins[:, None] == jnp.arange(histo_length)[None, :]
    counts = jnp.sum(onehot & match.valid[:, None], axis=0,
                     dtype=jnp.int32)
    # Reference keeps bin 2/3 only if within 10% of max count
    # (ORBmatcher.cc:1628-1636).
    _, top_idx = jax.lax.top_k(counts, top_bins)
    top_counts = counts[top_idx]
    keep_bin = jnp.zeros(histo_length, bool).at[top_idx].set(
        top_counts.astype(jnp.float32) > 0.1 * top_counts[0])
    ok = match.valid & keep_bin[bins]
    return MatchResult(jnp.where(ok, match.idx, -1), match.dist, ok)
