"""Device-resident map mirrors with incremental row updates.

The tracker and mapper consume the map arena (slam/map.py) on every frame;
round 1 re-uploaded ALL point arrays whenever the arena version changed —
~2 MB per keyframe through the host link, which dominated keyframe-frame
latency.  This module keeps the arrays device-resident and applies only the
*changed rows* with a donated scatter program (dynamic row update in HBM,
no reallocation), the TPU-native equivalent of the reference mutating its
pointer graph in place under `Map::mMutexMapUpdate` (Map.h:64).

Dirty-row tracking lives in MapArena (``_dirty_pt`` / ``_dirty_kf`` masks);
``DeviceMap.sync`` drains them.  Row indices are padded to a small set of
bucket sizes so the scatter program compiles a bounded number of times.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import brief

# Padded update sizes — one compiled scatter program per bucket.
_BUCKETS = (64, 256, 1024, 4096)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


@functools.partial(jax.jit, donate_argnums=0)
def _scatter_points(dev, idx, pos, desc_u8, valid, angle, normal, mind, maxd):
    """Write rows ``idx`` of every point array in place (donated buffers).

    ``idx`` is padded with an out-of-range sentinel; mode='drop' discards
    those writes.
    """
    pos_a, sd_a, v_a, a_a, n_a, mn_a, mx_a = dev
    signed = brief.to_signed(brief.unpack_bits(desc_u8))
    kw = dict(mode="drop")
    return (pos_a.at[idx].set(pos, **kw),
            sd_a.at[idx].set(signed, **kw),
            v_a.at[idx].set(valid, **kw),
            a_a.at[idx].set(angle, **kw),
            n_a.at[idx].set(normal, **kw),
            mn_a.at[idx].set(mind, **kw),
            mx_a.at[idx].set(maxd, **kw))


@functools.partial(jax.jit, donate_argnums=0)
def _scatter_kf_rows(dev, idx, uv, desc_u8, level, ur, kp_valid):
    """Write per-keyframe feature blocks (one row = one KF's keypoint set).

    Descriptors stay bit-packed uint8 on device ([K, N, 32] = 32 MB vs
    512 MB expanded); consumers gather the few KF rows a dispatch needs and
    unpack to ±1 bf16 in-graph.  The observation state (``kf_obs_pt``) is
    NOT mirrored — it mutates on every mapper writeback; consumers upload
    the few rows they need per dispatch instead."""
    uv_a, d_a, lv_a, ur_a, v_a = dev
    kw = dict(mode="drop")
    return (uv_a.at[idx].set(uv, **kw),
            d_a.at[idx].set(desc_u8, **kw),
            lv_a.at[idx].set(level, **kw),
            ur_a.at[idx].set(ur, **kw),
            v_a.at[idx].set(kp_valid, **kw))


@functools.partial(jax.jit, donate_argnums=0)
def _adopt_kf_row(kf_dev, k, uv, desc_u8, level, ur, valid):
    uv_a, d_a, lv_a, ur_a, v_a = kf_dev
    return (uv_a.at[k].set(uv), d_a.at[k].set(desc_u8),
            lv_a.at[k].set(level), ur_a.at[k].set(ur), v_a.at[k].set(valid))


class DeviceMap:
    """Incrementally-synced device mirrors of a MapArena.

    ``points``  — tuple (pos, signed_desc, valid, angle, normal, min_dist,
                  max_dist) consumed by the tracking step.
    ``kf_*``    — per-keyframe feature blocks + poses consumed by the
                  mapper's triangulate/fuse programs (kf descriptors are
                  mirrored as +-1 bf16, ready for MXU Hamming).
    """

    def __init__(self, cfg: SystemConfig, mirror_keyframes: bool = True):
        self.cfg = cfg
        self.mirror_keyframes = mirror_keyframes
        self._arena = None          # arena object last synced
        self._pts = None
        self._kf = None
        self._kf_pose = None        # (R [K,3,3], t [K,3]) — uploaded whole
        self._kf_pose_version = -1
        self._synced_n_kf = 0

    # ------------------------------------------------------------------ #

    def _full_upload(self, m) -> None:
        P = m.pt_pos.shape[0]
        self._pts = (
            jnp.asarray(m.pt_pos),
            brief.to_signed(brief.unpack_bits(jnp.asarray(m.pt_desc))),
            jnp.asarray(m.pt_valid),
            jnp.asarray(m.pt_angle),
            jnp.asarray(m.pt_normal),
            jnp.asarray(m.pt_min_dist),
            jnp.asarray(m.pt_max_dist),
        )
        if self.mirror_keyframes:
            self._kf = (
                jnp.asarray(m.kf_uv),
                jnp.asarray(m.kf_desc),
                jnp.asarray(m.kf_level),
                jnp.asarray(m.kf_ur),
                jnp.asarray(m.kf_kp_valid),
            )
        self._arena = m
        m._dirty_pt[:] = False
        m._dirty_kf[:] = False
        m._dirty_all = False
        self._sync_poses(m, force=True)

    def _sync_poses(self, m, force: bool = False) -> None:
        # Poses are tiny ([K,3,3]+[K,3] ≈ 20 KB) — upload whole on change.
        if force or m._pose_version != self._kf_pose_version:
            self._kf_pose = (jnp.asarray(m.kf_R), jnp.asarray(m.kf_t))
            self._kf_pose_version = m._pose_version

    def sync(self, m) -> "DeviceMap":
        """Apply all pending arena changes to the device mirrors."""
        if self._arena is not m or m._dirty_all or self._pts is None:
            self._full_upload(m)
            return self

        ids = np.nonzero(m._dirty_pt)[0]
        if len(ids):
            if len(ids) > m.pt_pos.shape[0] // 4:
                self._full_upload(m)
                return self
            P = m.pt_pos.shape[0]
            for s in range(0, len(ids), _BUCKETS[-1]):
                chunk = ids[s:s + _BUCKETS[-1]]
                B = _bucket(len(chunk))
                idx = np.full(B, P, np.int32)      # sentinel = out of range
                idx[:len(chunk)] = chunk
                self._pts = _scatter_points(
                    self._pts, jnp.asarray(idx),
                    jnp.asarray(_pad_rows(m.pt_pos[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_desc[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_valid[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_angle[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_normal[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_min_dist[chunk], B)),
                    jnp.asarray(_pad_rows(m.pt_max_dist[chunk], B)))
            m._dirty_pt[:] = False

        if self.mirror_keyframes:
            kids = np.nonzero(m._dirty_kf)[0]
            if len(kids):
                K = m.kf_R.shape[0]
                for s in range(0, len(kids), 4):
                    chunk = kids[s:s + 4]
                    B = 4
                    idx = np.full(B, K, np.int32)
                    idx[:len(chunk)] = chunk
                    self._kf = _scatter_kf_rows(
                        self._kf, jnp.asarray(idx),
                        jnp.asarray(_pad_rows(m.kf_uv[chunk], B)),
                        jnp.asarray(_pad_rows(m.kf_desc[chunk], B)),
                        jnp.asarray(_pad_rows(m.kf_level[chunk], B)),
                        jnp.asarray(_pad_rows(m.kf_ur[chunk], B)),
                        jnp.asarray(_pad_rows(m.kf_kp_valid[chunk], B)))
                m._dirty_kf[:] = False
        self._sync_poses(m)
        return self

    # ------------------------------------------------------------------ #

    def adopt_keyframe_row(self, m, k: int, fd) -> None:
        """Write keyframe k's feature block straight from a device-resident
        FrameData — the data is already on the TPU, so re-uploading the
        ~400 KB the host just fetched would be pure wire waste."""
        if self._kf is None or self._arena is not m:
            return
        self._kf = _adopt_kf_row(self._kf, jnp.int32(k), fd.feats.uv,
                                 fd.feats.desc, fd.feats.level, fd.ur,
                                 fd.feats.valid)
        m._dirty_kf[k] = False

    @property
    def points(self) -> Tuple:
        return self._pts

    @property
    def kf_feats(self) -> Tuple:
        """(uv, desc_u8, level, ur, kp_valid) device arrays."""
        return self._kf

    @property
    def kf_poses(self) -> Tuple:
        return self._kf_pose


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return np.ascontiguousarray(a)
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[:a.shape[0]] = a
    return out


def sync(arena, cfg: SystemConfig) -> DeviceMap:
    """The canonical per-arena DeviceMap, synced.

    The dirty-row protocol supports exactly ONE mirror per arena (sync
    drains the flags), so every consumer — tracker, mapper, loop closer —
    must share the instance attached to the arena."""
    dm = arena.__dict__.get("_devmap")
    if dm is None:
        dm = DeviceMap(cfg)
        arena._devmap = dm
    return dm.sync(arena)
