"""Native host-runtime bindings (ctypes over arena_ops.cc).

Compiled lazily on first import with g++ (cached next to the source); every
entry point has a numpy fallback in the callers, so a missing toolchain only
costs speed, never correctness.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "arena_ops.cc")
_LIB = os.path.join(_DIR, "libarena_ops.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.fill_ba_obs_table.argtypes = [
        i32p, i32p, i64, i64, i32p, f32p, f32p, i32p, i64,
        ctypes.c_double, i64, i32p, f32p, f32p, u8p]
    lib.fill_ba_obs_table.restype = None
    lib.distinctive_descriptors.argtypes = [
        u8p, i64, i32p, i32p, i64, i64, u8p, i32p, i32p]
    lib.distinctive_descriptors.restype = None
    lib.covisibility_row.argtypes = [
        i32p, i64, i64, i64, u8p, i64, i32p]
    lib.covisibility_row.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def fill_ba_obs_table(pt_obs_kf, pt_obs_slot, kf_index_map, kf_uv, kf_ur,
                      kf_level, sf2: float, M: int):
    """Native BA observation-table fill.  Inputs are the GATHERED rows for
    the window's points ([n, max_obs]) plus global KF arrays.

    Returns (obs_kf [n, M] i32, obs_uvr [n, M, 3] f32, obs_w [n, M] f32,
    obs_valid [n, M] bool).
    """
    lib = _load()
    n, max_obs = pt_obs_kf.shape
    n_slots = kf_uv.shape[1]
    obs_kf = np.full((n, M), -1, np.int32)
    obs_uvr = np.zeros((n, M, 3), np.float32)
    obs_w = np.ones((n, M), np.float32)
    obs_valid = np.zeros((n, M), np.uint8)
    lib.fill_ba_obs_table(
        np.ascontiguousarray(pt_obs_kf, np.int32),
        np.ascontiguousarray(pt_obs_slot, np.int32),
        n, max_obs,
        np.ascontiguousarray(kf_index_map, np.int32),
        np.ascontiguousarray(kf_uv, np.float32),
        np.ascontiguousarray(kf_ur, np.float32),
        np.ascontiguousarray(kf_level, np.int32),
        n_slots, float(sf2), M,
        obs_kf, obs_uvr, obs_w, obs_valid)
    return obs_kf, obs_uvr, obs_w, obs_valid.astype(bool)


def distinctive_descriptors(kf_desc, pt_obs_kf, pt_obs_slot):
    """Native min-median-Hamming representative descriptor per point.

    Returns (desc [n, 32] u8, best_kf [n] i32, best_slot [n] i32).
    """
    lib = _load()
    n, max_obs = pt_obs_kf.shape
    n_slots = kf_desc.shape[1]
    out = np.zeros((n, 32), np.uint8)
    bkf = np.zeros(n, np.int32)
    bslot = np.zeros(n, np.int32)
    lib.distinctive_descriptors(
        np.ascontiguousarray(kf_desc, np.uint8), n_slots,
        np.ascontiguousarray(pt_obs_kf, np.int32),
        np.ascontiguousarray(pt_obs_slot, np.int32),
        n, max_obs, out, bkf, bslot)
    return out, bkf, bslot


def covisibility_row(kf_obs_pt, kf_id: int, n_kf: int, n_points: int):
    """Native shared-point count of keyframe ``kf_id`` vs keyframes [0, n_kf)."""
    lib = _load()
    n_slots = kf_obs_pt.shape[1]
    counts = np.zeros(n_kf, np.int32)
    scratch = np.zeros(n_points, np.uint8)
    lib.covisibility_row(
        np.ascontiguousarray(kf_obs_pt[:n_kf], np.int32), n_kf, n_slots,
        kf_id, scratch, n_points, counts)
    return counts
