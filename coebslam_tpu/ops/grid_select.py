"""Spatially-uniform keypoint selection: per-cell top-k + round-robin rank.

TPU-native replacement for the reference's quad-tree distribution
(`ORBextractor::DistributeOctTree`, ORBextractor.cc:546): the octree's goal is
N spatially spread keypoints, keeping the best-scored one per spatial node.
We achieve the same with a fixed grid: take the k best corners per cell, then
globally order candidates by (within-cell rank, -score) so every cell's best
is admitted before any cell's second best — a branch-free, fixed-shape
equivalent of progressively splitting nodes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_grid_topk(score_map, cell_size: int, k_per_cell: int, n_out: int):
    """Select up to ``n_out`` keypoints from a dense score map.

    Args:
      score_map: [H, W] float32, 0 where no corner (NMS'd FAST scores).
      cell_size: spatial cell edge in px (reference uses 30; we default 32).
      k_per_cell: candidates retained per cell before global ranking.
      n_out: fixed output size.

    Returns:
      yx:     [n_out, 2] int32 (row, col) — zeros where invalid.
      scores: [n_out] float32.
      valid:  [n_out] bool.
    """
    h, w = score_map.shape
    pad_h = (-h) % cell_size
    pad_w = (-w) % cell_size
    padded = jnp.pad(score_map, ((0, pad_h), (0, pad_w)))
    ph, pw = h + pad_h, w + pad_w
    ncy, ncx = ph // cell_size, pw // cell_size

    # [ncy, ncx, cell, cell] -> [ncells, cell*cell]
    cells = padded.reshape(ncy, cell_size, ncx, cell_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(ncy * ncx, cell_size * cell_size)

    k = min(k_per_cell, cell_size * cell_size)
    top_scores, top_idx = jax.lax.top_k(cells, k)

    # Recover absolute (row, col) for each candidate.
    cell_ids = jnp.arange(ncy * ncx)
    cy = (cell_ids // ncx) * cell_size
    cx = (cell_ids % ncx) * cell_size
    in_row = top_idx // cell_size
    in_col = top_idx % cell_size
    rows = cy[:, None] + in_row
    cols = cx[:, None] + in_col

    flat_scores = top_scores.reshape(-1)
    flat_rows = rows.reshape(-1)
    flat_cols = cols.reshape(-1)
    # within-cell rank 0..k-1 for round-robin admission.
    ranks = jnp.broadcast_to(jnp.arange(k)[None, :], top_scores.shape).reshape(-1)

    valid_cand = flat_scores > 0.0
    # Key: smaller is better.  rank dominates; score breaks ties (desc).
    # Invalid candidates get +inf so they sort last.
    key = ranks.astype(jnp.float32) * 1e6 - flat_scores
    key = jnp.where(valid_cand, key, jnp.inf)

    # Tiny images can yield fewer candidates than n_out: pad with invalids.
    n_cand = key.shape[0]
    if n_cand < n_out:
        pad = n_out - n_cand
        key = jnp.concatenate([key, jnp.full(pad, jnp.inf)])
        flat_scores = jnp.concatenate([flat_scores, jnp.zeros(pad)])
        flat_rows = jnp.concatenate([flat_rows, jnp.zeros(pad, flat_rows.dtype)])
        flat_cols = jnp.concatenate([flat_cols, jnp.zeros(pad, flat_cols.dtype)])
        valid_cand = jnp.concatenate([valid_cand, jnp.zeros(pad, bool)])

    order = jnp.argsort(key)[:n_out]
    sel_scores = flat_scores[order]
    sel_valid = valid_cand[order]
    yx = jnp.stack([flat_rows[order], flat_cols[order]], axis=-1).astype(jnp.int32)
    yx = jnp.where(sel_valid[:, None], yx, 0)
    return yx, jnp.where(sel_valid, sel_scores, 0.0), sel_valid
