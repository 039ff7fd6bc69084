"""Map checkpoint/resume.

The reference never implemented SaveMap/LoadMap (System.h:115-117 TODO,
SURVEY §5.4); here the full map state — keyframe SoA arrays, point arenas,
observations, covisibility, spanning tree, plus tracker pose/budget state —
serializes to one compressed npz.  Resume either continues mapping or runs
localization-only against the frozen map.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SystemConfig
from ..slam.map import MapArena

_ARENA_FIELDS = [
    "kf_R", "kf_t", "kf_stamp", "kf_valid", "kf_uv", "kf_level", "kf_angle",
    "kf_desc", "kf_depth", "kf_ur", "kf_kp_valid", "kf_obs_pt", "covis",
    "kf_parent", "kf_seq", "pt_pos", "pt_valid", "pt_desc", "pt_normal",
    "pt_min_dist", "pt_max_dist", "pt_angle", "pt_found", "pt_visible",
    "pt_first_kf", "pt_first_seq", "pt_obs_kf", "pt_obs_slot", "pt_redirect",
]


def save_map(path: str, arena: MapArena, tracker_state=None,
             kf_db=None) -> None:
    """Serialize the arena (+ optional tracker state and BoW database)."""
    data = {f: getattr(arena, f) for f in _ARENA_FIELDS}
    data["n_kf"] = np.asarray(arena.n_kf)
    data["n_pt"] = np.asarray(arena.n_pt)
    data["free_pt"] = np.asarray(arena._free_pt, np.int64)
    data["free_kf"] = np.asarray(arena._free_kf, np.int64)
    data["kf_seq_counter"] = np.asarray(arena.kf_seq_counter)
    # Cull-relative re-anchor chains (kf id -> parent, R_cp, t_cp).
    cull = sorted(arena.kf_cull_rel.items())
    data["cull_ids"] = np.asarray([k for k, _ in cull], np.int64)
    data["cull_parent"] = np.asarray([v[0] for _, v in cull], np.int64)
    data["cull_R"] = (np.stack([v[1] for _, v in cull])
                      if cull else np.zeros((0, 3, 3), np.float32))
    data["cull_t"] = (np.stack([v[2] for _, v in cull])
                      if cull else np.zeros((0, 3), np.float32))
    if tracker_state is not None:
        data["tk_pose_R"] = tracker_state.pose_R
        data["tk_pose_t"] = tracker_state.pose_t
        data["tk_budget"] = np.asarray(tracker_state.budget)
    if kf_db is not None:
        data["db_words"] = kf_db.kf_words
        data["db_bow_words"] = kf_db.kf_bow_words
        data["db_bow_vals"] = kf_db.kf_bow_vals
        data["db_registered"] = kf_db.registered
    np.savez_compressed(path, **data)


def load_map(path: str, cfg: SystemConfig, kf_db=None) -> MapArena:
    """Restore a MapArena (and optionally a KeyFrameDatabase in place)."""
    z = np.load(path)
    arena = MapArena(cfg)
    for f in _ARENA_FIELDS:
        src = z[f]
        dst = getattr(arena, f)
        if src.shape != dst.shape:
            raise ValueError(
                f"checkpoint field {f} has shape {src.shape}, current config "
                f"expects {dst.shape} — adjust MapConfig/OrbConfig to match")
        setattr(arena, f, src.copy())
    arena.n_kf = int(z["n_kf"])
    arena.n_pt = int(z["n_pt"])
    arena._free_pt = [int(i) for i in z["free_pt"]]
    if "free_kf" in z:
        arena._free_kf = [int(i) for i in z["free_kf"]]
        arena.kf_seq_counter = int(z["kf_seq_counter"])
        arena.kf_cull_rel = {
            int(k): (int(p), R.copy(), t.copy())
            for k, p, R, t in zip(z["cull_ids"], z["cull_parent"],
                                  z["cull_R"], z["cull_t"])}
    if kf_db is not None and "db_words" in z:
        kf_db.kf_words = z["db_words"].copy()
        kf_db.kf_bow_words = z["db_bow_words"].copy()
        kf_db.kf_bow_vals = z["db_bow_vals"].copy()
        kf_db.registered = z["db_registered"].copy()
    return arena


def restore_tracker_pose(path: str, tracker) -> bool:
    z = np.load(path)
    if "tk_pose_R" not in z:
        return False
    tracker.state.pose_R = z["tk_pose_R"].copy()
    tracker.state.pose_t = z["tk_pose_t"].copy()
    tracker.state.budget = int(z["tk_budget"])
    tracker._dev_state = None     # rebuild device state from restored pose
    return True


def save_vocabulary(path: str, voc) -> None:
    np.savez_compressed(path, node_desc=voc.node_desc, children=voc.children,
                        word_id=voc.word_id, word_weight=voc.word_weight,
                        node_level=voc.node_level,
                        depth=np.asarray(voc.depth),
                        branching=np.asarray(voc.branching))


def load_vocabulary(path: str):
    from ..slam.vocabulary import Vocabulary
    z = np.load(path)
    return Vocabulary(z["node_desc"], z["children"], z["word_id"],
                      z["word_weight"], z["node_level"], int(z["depth"]),
                      int(z["branching"]))
