"""Fused Pallas TPU kernel for FAST-9/16 corner strength + gate + 3x3 NMS.

This is the framework's hottest dense op (the reference's hottest loop is
per-cell OpenCV FAST inside `ORBextractor::ComputeKeyPointsOctTree`,
ORBextractor.cc:771-850, called 8x per frame over the pyramid).  The pure-jnp
path in :mod:`coebslam_tpu.ops.fast` materializes ~50 full-image temporaries
(16 circle shifts, 2x16 windowed arc minima) that XLA only partially fuses;
this kernel instead streams row bands HBM -> VMEM once and performs the whole
chain — 16 circle diffs, the 16x9 circular arc min/max reduction, threshold +
border gating, and 3x3 non-maximum suppression — entirely in VMEM, writing
exactly two output maps.  Per pixel that is one f32 load and two f32 stores
of HBM traffic: speed-of-light for this op.

Outputs match `fast.strength_map` / threshold gate / `fast.nms_3x3` exactly
(same arithmetic, same strict-maximum NMS), so the jnp path doubles as the
CPU fallback and the test oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

HALO = 4          # 3 px FAST circle radius + 1 px NMS neighborhood
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(scal_ref, img_ref, strength_ref, score_ref, *, tile: int,
            wp: int):
    """One program = one row band of `tile` output rows.

    img_ref:      [tile + 2*HALO, wp + 2*HALO] band of the padded image.
    strength_ref: [tile, wp] raw FAST-9/16 strength (for sub-pixel refine).
    score_ref:    [tile, wp] gated + 3x3-NMS'd corner score.
    """
    x = img_ref[:]

    # Strength is needed with a 1-px halo for NMS: local rows r in
    # [0, tile+2) map to image band rows r+3 (band row b = output row b-4
    # of this program's slab), cols likewise.
    st_h, st_w = tile + 2, wp + 2
    center = jax.lax.slice(x, (3, 3), (3 + st_h, 3 + st_w))
    diffs = [
        jax.lax.slice(x, (3 + dy, 3 + dx), (3 + dy + st_h, 3 + dx + st_w))
        - center
        for (dy, dx) in CIRCLE_OFFSETS
    ]

    # FAST-9 arc reduction: for each of the 16 arc starts, the bright
    # strength is min over the 9-long arc of diff, the dark strength is
    # min of -diff = -(max of diff); strength = max over starts.
    best = jnp.full((st_h, st_w), -jnp.inf, jnp.float32)
    for s in range(16):
        wmin = diffs[s]
        wmax = diffs[s]
        for j in range(1, 9):
            d = diffs[(s + j) % 16]
            wmin = jnp.minimum(wmin, d)
            wmax = jnp.maximum(wmax, d)
        best = jnp.maximum(best, jnp.maximum(wmin, -wmax))

    i = pl.program_id(0)
    thr = scal_ref[0]
    # True image extent as SMEM scalars (traced): the same compiled kernel
    # serves every pyramid level placed in a shared zero-padded canvas.
    true_h = scal_ref[1].astype(jnp.int32)
    true_w = scal_ref[2].astype(jnp.int32)

    # Global coordinates of the strength slab: local row r is global row
    # i*tile + r - 1, local col c is global col c - 1.
    grow = (jax.lax.broadcasted_iota(jnp.int32, (st_h, st_w), 0)
            + i * tile - 1)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (st_h, st_w), 1) - 1
    inside = ((grow >= 3) & (grow < true_h - 3)
              & (gcol >= 3) & (gcol < true_w - 3))
    sc = jnp.where(inside & (best > thr), best, 0.0)

    # Strict 3x3 NMS using the 1-px halo (no wraparound artifacts).
    neigh = jnp.full((tile, wp), -jnp.inf, jnp.float32)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            neigh = jnp.maximum(
                neigh, jax.lax.slice(sc, (dy, dx), (dy + tile, dx + wp)))
    c = jax.lax.slice(sc, (1, 1), (1 + tile, 1 + wp))
    score_ref[:] = jnp.where(c > neigh, c, 0.0)
    strength_ref[:] = jax.lax.slice(best, (1, 1), (1 + tile, 1 + wp))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(img, thr, true_h, true_w, *, interpret: bool = False):
    h, w = img.shape
    tile = 64 if h >= 64 else _round_up(h, 8)
    n_t = -(-h // tile)
    hp = n_t * tile
    wp = _round_up(w, _LANE)

    padded = jnp.zeros((hp + 2 * HALO, wp + 2 * HALO), jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, img.astype(jnp.float32), (HALO, HALO))

    kern = functools.partial(_kernel, tile=tile, wp=wp)
    strength, score = pl.pallas_call(
        kern,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # Overlapping row bands: program i reads padded rows
            # [i*tile, i*tile + tile + 2*HALO) — pl.Element lets the
            # index_map return an elementwise start so consecutive bands
            # share their HALO rows.
            pl.BlockSpec((pl.Element(tile + 2 * HALO),
                          pl.Element(wp + 2 * HALO)),
                         lambda i: (i * tile, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(thr, jnp.float32),
                 jnp.asarray(true_h, jnp.float32),
                 jnp.asarray(true_w, jnp.float32)]), padded)
    return strength[:h, :w], score[:h, :w]


def strength_and_score(img, thr, *, true_h=None, true_w=None,
                       interpret: bool = False):
    """Fused FAST strength map + gated/NMS'd score map.

    Args:
      img: [H, W] float32 grayscale in [0, 255].
      thr: scalar detection threshold (traced OK).
      true_h/true_w: traced true extent when ``img`` is a zero-padded
        canvas holding a smaller level (defaults to the static shape).
      interpret: run the Pallas interpreter (CPU debugging / tests).

    Returns:
      (strength [H, W], score [H, W]) — identical to
      `fast.strength_map(img)` and
      `fast.nms_3x3(border_gate(strength > thr))` over the true extent.
    """
    h, w = img.shape
    if true_h is None:
        true_h = h
    if true_w is None:
        true_w = w
    return _run(img, thr, true_h, true_w, interpret=interpret)
