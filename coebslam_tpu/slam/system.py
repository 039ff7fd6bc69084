"""System facade — the public API of the framework.

Mirrors the reference's `System` class surface (System.h:62-117, System.cc:
38-513): construction wires tracking + local mapping (+ loop closing when
enabled), per-frame entry points accept images and optional detector boxes,
mode switches arbitrate localization-only operation, and trajectories export
in TUM/KITTI formats (without the reference's hardcoded output paths,
System.cc:358,416).

Differences by design (SURVEY §7.1): no threads or mutexes — keyframe
insertion triggers the mapping pipeline synchronously on the host while the
actual compute runs as asynchronously-dispatched device programs; the
detector boxes can come from any source (the in-graph YOLOv5 of
models/detector.py, ground-truth boxes in tests, or an external process as
in the reference's ROS setup).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import pyramid as pyramid_ops
from . import dynamic as dynamic_mod
from .local_mapping import LocalMapper
from .map import MapArena
from .tracking import LOST, NOT_INITIALIZED, OK, Tracker

SENSOR_RGBD = "rgbd"
SENSOR_MONOCULAR = "monocular"
SENSOR_STEREO = "stereo"


def _np_box_mask(h: int, w: int, boxes: np.ndarray) -> np.ndarray:
    """Host-side union of box masks (numpy twin of ops.blur._box_mask —
    cheaper than a device dispatch for this bookkeeping path)."""
    mask = np.zeros((h, w), bool)
    for b in boxes:
        if b[0] >= 0:
            x0, y0 = max(0, int(b[0])), max(0, int(b[1]))
            x1, y1 = min(w - 1, int(b[2])), min(h - 1, int(b[3]))
            mask[y0:y1 + 1, x0:x1 + 1] = True
    return mask


class System:
    def __init__(self, cfg: SystemConfig, detector=None, vocabulary=None):
        """Args:
          cfg: full configuration (or load_config(path) of a settings file).
          detector: optional object with ``detect(gray) -> [B, 4] boxes``
            (models/detector.py); used when no boxes are passed per frame.
          vocabulary: optional slam.vocabulary.Vocabulary — enables the BoW
            keyframe database, relocalization and loop closing (the
            reference loads ORBvoc.txt at startup, System.cc:71-78).
        """
        self.cfg = cfg
        self.detector = detector
        self.map = MapArena(cfg)
        self.tracker = Tracker(cfg, self.map)
        self.mapper = LocalMapper(cfg, self.map)
        self.tracker.on_keyframe = self._on_keyframe
        self.loop_closer = None        # attached by loop_closing module
        self.localization_only = False

        self.voc = vocabulary
        self.kf_db = None
        self.relocalizer = None
        if vocabulary is not None:
            from . import vocabulary as voc_mod
            from .keyframe_db import KeyFrameDatabase
            from .relocalization import Relocalizer
            self.kf_db = KeyFrameDatabase(vocabulary, self.map,
                                          cfg.map.max_keyframes)
            # Culled KFs must leave the BoW database (KeyFrameDatabase::erase
            # semantics) or they remain loop/reloc candidates forever and
            # crowd out real candidates through the 0.75x accumulation gate.
            self.map.on_keyframe_removed.append(self.kf_db.erase)
            self.relocalizer = Relocalizer(cfg, self.map, self.kf_db)
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.map, self.kf_db,
                                          mapper=self.mapper)
            self._jit_bow = jax.jit(
                lambda d, v: voc_mod.transform_words(vocabulary, d, v))

            def reloc_fn(fd):
                words, _ = self._jit_bow(fd.feats.desc, fd.feats.valid)
                return self.relocalizer.relocalize(fd, np.asarray(words))

            self.tracker.reloc_fn = reloc_fn
        self._prev_gray: Optional[jnp.ndarray] = None
        self._boxes_dev: Optional[jnp.ndarray] = None
        self._frame_count = 0
        self._rng = jax.random.PRNGKey(0)
        self._recent_masks: List[np.ndarray] = []
        from ..utils.metrics import MetricsCollector
        self.metrics = MetricsCollector()

        self._jit_dynamic = jax.jit(
            lambda pg, g, b, k: dynamic_mod.dynamic_frontend(pg, g, b, k, cfg))

    # ------------------------------------------------------------------ #

    def _on_keyframe(self, kf_id: int) -> None:
        if self.localization_only:
            return
        if self.kf_db is not None:
            words, _ = self._jit_bow(
                jnp.asarray(self.map.kf_desc[kf_id]),
                jnp.asarray(self.map.kf_kp_valid[kf_id]))
            self.kf_db.add(kf_id, np.asarray(words))
        self.mapper.process_keyframe(kf_id)
        if self.loop_closer is not None:
            self.loop_closer.insert_keyframe(kf_id)

    # ------------------------------------------------------------------ #

    def track_rgbd(self, rgb_or_gray, depth, stamp: float,
                   boxes: Optional[Sequence] = None):
        """Per-frame RGB-D entry (System::TrackRGBD, System.cc:176-225).

        Args:
          rgb_or_gray: [H, W] grayscale or [H, W, 3] color, 0..255.
          depth: [H, W] float metres (pre-divided by DepthMapFactor).
          boxes: optional [B, 4] (xmin, ymin, xmax, ymax) detector boxes —
            the reference's `vector<vector<float>>` boundary (System.h:73).

        Returns (state, n_inliers).
        """
        gray = self._to_gray(rgb_or_gray)
        mask = None
        area_mode = False
        spawn_mask = None
        boxes_dev = None

        if self.cfg.use_dynamic_filtering \
                and self.cfg.dynamic.motion_check == "feature":
            # Production path: boxes stay on device; motion check, box
            # classification and keypoint culling run INSIDE the fused
            # per-frame program (slam/dynamic.dynamic_step).
            boxes_dev = self._device_boxes(gray, boxes)
            if boxes_dev is not None \
                    and self.tracker.state.mode == NOT_INITIALIZED:
                # Conservative initialization: treat every detector box as
                # dynamic until flow/epipolar evidence exists (see the
                # "flow"-path comment below) — host mask, init only.
                b = np.asarray(jax.device_get(boxes_dev))
                h, w = np.asarray(gray.shape)
                mask = _np_box_mask(int(h), int(w), b)
                boxes_dev = None
        elif self.cfg.use_dynamic_filtering:
            if boxes is None and self.detector is not None:
                boxes = self.detector.detect(gray)
            h, w = np.asarray(gray.shape)
            if boxes is not None:
                padded = self._pad_boxes(boxes)
                all_box_mask = _np_box_mask(int(h), int(w),
                                            np.asarray(padded))
                if not self.cfg.dynamic.spawn_in_boxes:
                    # Extension: never CREATE map points inside detector
                    # boxes — one unclassified frame otherwise bakes a mover
                    # into the map.
                    spawn_mask = all_box_mask
            if boxes is not None and self._prev_gray is not None:
                self._rng, key = jax.random.split(self._rng)
                dres = self._jit_dynamic(self._prev_gray, gray, padded, key)
                # One bundled fetch: mask + area flag together.
                mask, area_flag = jax.device_get((dres.mask, dres.area_flag))
                area_mode = bool(area_flag)
                self._last_dynamic = dres
                # Sticky masking: movers stay masked for a few frames even
                # when per-frame epipolar evidence is intermittent.
                if self.cfg.dynamic.sticky_frames > 0:
                    if mask.any():
                        self._recent_masks.append(mask)
                    self._recent_masks = \
                        self._recent_masks[-self.cfg.dynamic.sticky_frames:]
                    for rm in self._recent_masks:
                        mask = mask | rm
            elif boxes is not None \
                    and self.tracker.state.mode == NOT_INITIALIZED:
                # No previous frame => no motion evidence yet.  At
                # initialization a mover baked into the map poisons
                # everything downstream, so treat every detector box as
                # dynamic until flow can arbitrate (conservative extension
                # of the reference, which initializes blind and relies on
                # reset-on-lost, Tracking.cc:542-550).
                mask = all_box_mask

        import time as _time
        t0 = _time.perf_counter()
        state, n = self.tracker.process_frame(
            gray, jnp.asarray(depth), stamp,
            dynamic_mask=mask, area_mode=area_mode, spawn_mask=spawn_mask,
            boxes_dev=boxes_dev)
        self.metrics.record(
            frame=self._frame_count, stamp=stamp, state=state, n_inliers=n,
            n_map_points=len(self.map.valid_points()),
            n_keyframes=len(self.map.valid_keyframes()),
            budget=self.tracker.state.budget,
            wall_ms=( _time.perf_counter() - t0) * 1e3)
        self._prev_gray = gray
        self._frame_count += 1
        self._maybe_reset(state)
        return state, n

    def track_monocular(self, rgb_or_gray, stamp: float,
                        boxes: Optional[Sequence] = None):
        """Monocular entry (System::TrackMonocular, System.cc:262-308):
        two-view H/F initialization, then the standard tracking pipeline
        with triangulation-only map growth.  This restores the path the
        fork broke (SURVEY §2.5: mono extraction commented out at
        Frame.cc:268)."""
        assert self.cfg.sensor == "monocular", \
            "construct the System with cfg.sensor='monocular'"
        gray = self._to_gray(rgb_or_gray)
        mask = None
        if self.cfg.use_dynamic_filtering and boxes is not None:
            from ..ops import blur as blur_ops
            if self._prev_gray is not None:
                padded = self._pad_boxes(boxes)
                self._rng, key = jax.random.split(self._rng)
                dres = self._jit_dynamic(self._prev_gray, gray, padded, key)
                mask = dres.mask
                self._last_dynamic = dres
        state, n = self.tracker.process_frame(gray, None, stamp,
                                              dynamic_mask=mask)
        self._prev_gray = gray
        self._frame_count += 1
        self._maybe_reset(state)
        return state, n

    def track_stereo(self, left, right, stamp: float):
        """Stereo entry (System::TrackStereo, System.cc:128-174): rectified
        left/right pair; depth synthesized by row-band stereo matching, then
        the RGB-D tracking path applies unchanged."""
        assert self.cfg.sensor == "stereo", \
            "construct the System with cfg.sensor='stereo'"
        gl = self._to_gray(left)
        gr = self._to_gray(right)
        state, n = self.tracker.process_frame_stereo(gl, gr, stamp)
        self._prev_gray = gl
        self._frame_count += 1
        self._maybe_reset(state)
        return state, n

    # ------------------------------------------------------------------ #

    @property
    def last_dynamic(self):
        """Most recent dynamic-front-end result, path-independent: the
        flow path stores its DynamicResult; the fused feature path exposes
        the tracker's in-graph DynInfo + sticky mask under the same names
        (fetched lazily — reading this costs a device round trip)."""
        flow = getattr(self, "_last_dynamic", None)
        if flow is not None:
            return flow
        tr = self.tracker
        if tr.last_dyn_info is None or tr._dyn_state is None:
            return None
        from types import SimpleNamespace
        info = tr.last_dyn_info
        return SimpleNamespace(
            box_dynamic=np.asarray(info.box_dynamic),
            box_blurred=np.asarray(info.box_blurred),
            n_outliers=int(info.n_outliers),
            n_culled=int(info.n_culled),
            mask=np.asarray(tr._dyn_state.sticky) > 0)

    def _device_boxes(self, gray, boxes) -> Optional[jnp.ndarray]:
        """Detector boxes as a fixed-shape [max_boxes, 4] DEVICE array.

        Explicit per-frame boxes win; otherwise the detector runs every
        cfg.dynamic.detector_cadence frames and its (device) output is
        reused in between — the reference tolerates exactly this staleness
        through ApproximateTime sync (ros_rgbd.cc:73-78)."""
        if boxes is not None:
            return jnp.asarray(self._pad_boxes(boxes))
        if self.detector is None:
            return None
        cad = max(1, self.cfg.dynamic.detector_cadence)
        if self._frame_count % cad == 0 or self._boxes_dev is None:
            if hasattr(self.detector, "detect_device"):
                self._boxes_dev = self.detector.detect_device(gray)
            else:
                self._boxes_dev = jnp.asarray(
                    self._pad_boxes(self.detector.detect(gray)))
        return self._boxes_dev

    def activate_localization_mode(self) -> None:
        """Stop mapping; track against the frozen map
        (System::ActivateLocalizationMode, System.h:81).  Keyframe insertion
        and point spawning are gated in the tracker itself, so the arena is
        genuinely frozen (System.cc:184-216 semantics)."""
        self.localization_only = True
        self.tracker.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.localization_only = False
        self.tracker.localization_only = False

    def reset(self) -> None:
        """Full system reset (System::Reset -> Tracking::Reset,
        Tracking.cc:1582): clear the map and start re-initialization."""
        self.tracker.flush()
        self.tracker.freeze_trajectory()
        self.map = MapArena(self.cfg)
        self.tracker.map = self.map
        self.mapper.map = self.map
        self.tracker.state.__init__(budget=self.cfg.orb.n_features)
        self.tracker.reset_runtime()
        self.tracker.ref_kf = -1
        self._prev_gray = None

    def _maybe_reset(self, state: str) -> None:
        """Reset if lost soon after init with a tiny map
        (Tracking.cc:542-550: lost with <= 5 KFs => reset)."""
        if state == LOST and len(self.map.valid_keyframes()) \
                < self.cfg.tracking.reset_if_lost_with_kfs_below:
            n_traj = len(self.tracker.trajectory)
            self.reset()
            # keep the trajectory log across the reset
            del self.tracker.trajectory[n_traj:]

    def enable_realtime(self, finalize_batch: int = 8) -> None:
        """Production mode: pipeline the tracker (frame i-1's host decisions
        overlap frame i's device execution), batch the decision-scalar
        readbacks (``finalize_batch`` frames per bundled transfer — the
        per-transfer LATENCY of the degraded client is what caps host
        throughput, tracking.Tracker.finalize_batch), and run the mapper's
        stage machine asynchronously, polled once per frame — the
        TPU-native equivalent of the reference's tracking/mapping thread
        split (System.cc:100)."""
        self.tracker.pipelined = True
        self.tracker.finalize_batch = max(1, int(finalize_batch))
        self.mapper.async_mode = True
        self.tracker.on_frame = self.mapper.poll
        self.tracker.mapper_idle_fn = self.mapper.idle

    def shutdown(self) -> None:
        """System::Shutdown — drain in-flight frames and mapping stages
        (the reference joins its threads here, System.cc:310)."""
        self.tracker.flush()
        self.mapper.flush()

    # ------------------------------------------------------------------ #

    def get_tracking_state(self) -> str:
        return self.tracker.state.mode

    def get_tracked_map_points(self) -> np.ndarray:
        pids = self.tracker._last_pids
        if pids is None:
            return np.zeros(0, np.int32)
        return pids[pids >= 0]

    def save_trajectory_tum(self, path: str) -> None:
        """System::SaveTrajectoryTUM (System.cc:331-401): frame poses are
        composed relative-to-reference-KF at save time, so loop-closure /
        BA corrections retroactively fix the whole trajectory."""
        from ..io import trajectory
        traj = self.tracker.export_trajectory()
        trajectory.save_tum(path, [s for s, _, _ in traj],
                            [(R, t) for _, R, t in traj])

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        """System::SaveKeyFrameTrajectoryTUM (System.cc:403-443)."""
        from ..io import trajectory
        kfs = self.map.valid_keyframes()
        trajectory.save_tum(path, self.map.kf_stamp[kfs],
                            [(self.map.kf_R[k], self.map.kf_t[k])
                             for k in kfs])

    def save_trajectory_kitti(self, path: str) -> None:
        from ..io import trajectory
        trajectory.save_kitti(
            path, [(R, t) for _, R, t in self.tracker.export_trajectory()])

    # ------------------------------------------------------------------ #

    def _to_gray(self, img) -> jnp.ndarray:
        img = jnp.asarray(img)
        if img.ndim == 3:
            return pyramid_ops.rgb_to_gray(img)
        return img.astype(jnp.float32)

    def _pad_boxes(self, boxes) -> jnp.ndarray:
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        out = np.full((self.cfg.dynamic.max_boxes, 4), -1.0, np.float32)
        out[:min(len(b), len(out))] = b[:len(out)]
        return jnp.asarray(out)
