"""Batched closed-form 3D-3D alignment (Horn/Umeyama) + vmapped RANSAC.

Replaces two reference components with one batched primitive:

* `Sim3Solver` (Sim3Solver.cc:140-365): RANSAC Sim3 between keyframes from
  3-point samples, closed-form absolute orientation — the reference uses
  Horn's quaternion method; the SVD (Umeyama) form here is algebraically
  equivalent and batches cleanly.
* `PnPsolver` relocalization (PnPsolver.cc, EPnP+RANSAC): with RGB-D depth
  both sides of a 2D-3D match have 3D coordinates, so relocalization poses
  come from the same 3-point alignment RANSAC scored by reprojection —
  better conditioned than EPnP and two orders of magnitude fewer code paths.
  (The monocular path adds a true P3P solver with the initializer milestone.)

All hypotheses are solved and scored as one vmapped batch (SURVEY §7.1
"batched RANSAC everywhere").
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..geometry import camera as cam_ops


def umeyama(src, dst, weights=None, with_scale: bool = False):
    """Weighted least-squares similarity: dst ~= s * R @ src + t.

    Args:
      src, dst: [..., N, 3].
      weights: optional [..., N] nonnegative.
    Returns (s [...], R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights / jnp.maximum(weights.sum(-1, keepdims=True), 1e-9)
    mu_s = jnp.einsum("...n,...ni->...i", w, src)
    mu_d = jnp.einsum("...n,...ni->...i", w, dst)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", w, dc, sc)
    u, s_vals, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = (u * d[..., None, :]) @ vt
    if with_scale:
        var_src = jnp.einsum("...n,...ni,...ni->...", w, sc, sc)
        scale = jnp.sum(s_vals * d, axis=-1) / jnp.maximum(var_src, 1e-12)
    else:
        scale = jnp.ones(src.shape[:-2], src.dtype)
    t = mu_d - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return scale, R, t


class AlignmentResult(NamedTuple):
    scale: jnp.ndarray       # scalar
    R: jnp.ndarray           # [3, 3]
    t: jnp.ndarray           # [3]
    inliers: jnp.ndarray     # [N] bool
    n_inliers: jnp.ndarray   # int32 — at the FINAL (annealed) radius
    n_consensus: jnp.ndarray = None   # int32 — best hypothesis count at
                                      # the wide RANSAC radius


def ransac_alignment(src, dst, valid, key, *, n_hypotheses: int = 256,
                     threshold: float = 0.05, with_scale: bool = False,
                     cam: CameraConfig = None, obs_uv=None,
                     px_threshold: float = 5.0,
                     final_threshold: float = None) -> AlignmentResult:
    """RANSAC similarity/rigid alignment from 3-point samples.

    Scoring: 3D distance < ``threshold`` by default; if ``cam``+``obs_uv``
    are given, scoring is reprojection error of the transformed src points
    against [N, 2] pixel observations (< ``px_threshold`` px) — the
    relocalization / Sim3Solver criterion.
    """
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hypotheses, 3))
    s_h, R_h, t_h = jax.vmap(
        lambda i: umeyama(src[i], dst[i], with_scale=with_scale))(idx)
    if not with_scale:
        s_h = jnp.ones_like(s_h)

    mapped = (s_h[:, None, None]
              * jnp.einsum("hij,nj->hni", R_h, src) + t_h[:, None, :])
    if cam is not None and obs_uv is not None:
        uv = cam_ops.project(cam, mapped)                  # [H, N, 2]
        err = jnp.linalg.norm(uv - obs_uv[None], axis=-1)
        ok = (err < px_threshold) & (mapped[..., 2] > 0.05)
    else:
        err = jnp.linalg.norm(mapped - dst[None], axis=-1)
        ok = err < threshold
    ok = ok & valid[None, :]
    counts = ok.sum(-1)
    best = jnp.argmax(counts)

    # Refine on the best inlier set (weighted closed form), optionally
    # ANNEALING the inlier radius down to ``final_threshold``: the wide
    # RANSAC radius is right for finding the consensus set, but the
    # returned pose should be fit tight — a loop correction solved at an
    # 8 cm radius carries multi-cm error into the pose graph, worse than
    # the drift it fixes on low-drift trajectories (the reference refines
    # its RANSAC Sim3 with OptimizeSim3's chi2-gated GN the same way,
    # LoopClosing.cc:276-330 -> Optimizer.cc:1046).
    ths = [threshold]
    if final_threshold is not None and final_threshold < threshold:
        ths = list(np.geomspace(threshold, final_threshold, 3))
    inl = ok[best]
    s = jnp.ones(())
    R = jnp.eye(3)
    t = jnp.zeros(3)
    for th_i in ths:
        w = inl.astype(src.dtype)
        s, R, t = umeyama(src, dst, weights=w, with_scale=with_scale)
        if not with_scale:
            s = jnp.ones_like(s)
        mapped = s * (src @ R.T) + t
        if cam is not None and obs_uv is not None:
            uv = cam_ops.project(cam, mapped)
            err = jnp.linalg.norm(uv - obs_uv, axis=-1)
            inl = (err < px_threshold) & (mapped[..., 2] > 0.05) & valid
        else:
            inl = (jnp.linalg.norm(mapped - dst, axis=-1) < th_i) & valid
    return AlignmentResult(scale=s, R=R, t=t, inliers=inl,
                           n_inliers=inl.sum().astype(jnp.int32),
                           n_consensus=counts[best].astype(jnp.int32))
