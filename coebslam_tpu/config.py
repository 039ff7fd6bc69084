"""Configuration system.

Every hard-coded constant of the reference implementation is lifted into typed,
documented dataclasses here (the reference scatters them across
`src/Frame.cc`, `src/ORBextractor.cc`, `src/Tracking.cc`, `src/ORBmatcher.cc`,
`src/Optimizer.cc` and the `Examples/RGB-D/*.yaml` settings files — see
SURVEY.md §5.6 for the file:line inventory).

Dataclasses are frozen (hashable) so they can be closed over by jitted
functions as static configuration; anything that must vary per-trace lives in
runtime state pytrees instead.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera intrinsics + distortion + RGB-D parameters.

    Mirrors the cv::FileStorage keys read by the reference at
    Tracking.cc:55-150 (Camera.fx/fy/cx/cy, k1 k2 p1 p2 k3, fps, bf,
    ThDepth, DepthMapFactor).  Defaults are the TUM fr3 calibration used by
    the reference's shipped config (Examples/RGB-D/tum_bag.yaml).
    """

    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    # Stereo baseline times fx (meters*px).  For RGB-D this synthesizes a
    # virtual right-camera coordinate (reference Frame.cc:820-842).
    bf: float = 40.0
    # Close/far depth threshold in baseline units (reference ThDepth=50 ->
    # depth < bf*ThDepth/fx counts as "close"/reliable).
    th_depth: float = 50.0
    # Factor dividing raw depth map values to meters (TUM: 5000).
    depth_map_factor: float = 5000.0
    rgb_order: int = 1  # 1: RGB, 0: BGR (reference Camera.RGB key)

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def depth_threshold(self) -> float:
        """Max reliable depth in meters (close-point threshold)."""
        return self.bf * self.th_depth / self.fx


@dataclass(frozen=True)
class OrbConfig:
    """ORB feature extraction parameters.

    Reference: ORBextractor constructor params (Tracking.cc:99-151,
    ORBextractor.cc:418-477) and the COEB dual FAST-threshold scheme
    (ORBextractor.cc:771-784).
    """

    n_features: int = 1000          # ORBextractor.nFeatures
    scale_factor: float = 1.2       # pyramid scale between levels
    n_levels: int = 8               # pyramid levels
    fast_threshold_init: int = 20   # iniThFAST
    fast_threshold_min: int = 7     # minThFAST (fallback for empty cells)
    # COEB: raised thresholds when most of the image is masked dynamic
    # (ORBextractor.cc:775-784).
    fast_threshold_init_masked: int = 30
    fast_threshold_min_masked: int = 10
    cell_size: int = 32             # detection cell (reference uses 30 px; 32
                                    # aligns to TPU lanes, same spatial goal)
    patch_size: int = 31            # BRIEF/orientation patch
    half_patch_size: int = 15       # IC_Angle radius (ORBextractor.cc:80)
    edge_threshold: int = 19        # border margin for keypoints
    # Budget multiplier applied when the dynamic-mask area flag trips
    # (ORBextractor.cc:866-870).
    masked_budget_scale: float = 0.7
    # Fixed per-frame keypoint capacity of the fixed-shape pipeline.  All
    # downstream arrays are padded to this; must be >= the adaptive-budget cap.
    max_keypoints: int = 2048
    # FAST backend: None = auto (fused Pallas kernel on TPU, fused-jnp
    # elsewhere); True/False forces.  The two paths are bit-identical
    # (tests/test_features.py::test_fast_pallas_matches_jnp).
    use_pallas_fast: Optional[bool] = None

    @property
    def scale_factors(self) -> Tuple[float, ...]:
        return tuple(self.scale_factor ** i for i in range(self.n_levels))


@dataclass(frozen=True)
class DynamicConfig:
    """COEB dynamic-scene front-end constants.

    Reference: Frame.h:61-79 / Frame.cc:311-393 (epipolar motion check),
    Frame.cc:171-202 (blur gate), ORBextractor.cc:1116-1207 (two-tier box
    classification + area fallback).
    """

    # Epipolar distance (px) beyond which a tracked flow point is a dynamic
    # outlier (Frame.cc:380).
    epipolar_threshold: float = 1.0
    # Neighborhood intensity-difference sum over a 3x3 window above which a
    # flow correspondence is discarded before the F-matrix fit (Frame.cc:349,
    # `limit_of_check` = 2120).
    flow_diff_threshold: float = 2120.0
    # Image-border margin for flow points (Frame.h:76 `limit_edge_corner`).
    flow_edge_margin: int = 5
    # Number of Shi-Tomasi corners tracked per frame (Frame.cc:333).
    n_flow_points: int = 1000
    # Laplacian variance below which a detector box is flagged blurred
    # (Frame.cc:189, threshold 4.2).
    blur_threshold: float = 4.2
    # Tier-1 rule: count(T_M in box) * density_scale > box_area => dynamic
    # (ORBextractor.cc:1145, x10000).
    box_density_scale: float = 10000.0
    # Total masked area (px) beyond which the budget/threshold fallbacks trip
    # (ORBextractor.cc:1192, 200000 px ~ 65% of 640x480).
    masked_area_limit: float = 200000.0
    # RANSAC settings for the fundamental-matrix fit on flow correspondences.
    f_ransac_iters: int = 256
    f_ransac_threshold: float = 1.0  # px (OpenCV default 3.0; COEB effective 1.0 gate)
    # Detector classes considered potentially dynamic ("person" only in the
    # reference, yolo_v5.py:126).
    dynamic_classes: Tuple[int, ...] = (0,)
    # Max detector boxes carried through the fixed-shape pipeline.
    max_boxes: int = 16
    # Extensions beyond the reference (both default-on; set False for strict
    # reference behavior):
    # Never create map points inside ANY detector box — a single
    # unclassified frame otherwise bakes a mover into the map (the
    # reference's per-frame classifier races keyframe insertion and loses).
    spawn_in_boxes: bool = False
    # A box classified dynamic keeps masking for this many frames
    # (per-frame epipolar evidence is intermittent; movers don't stop being
    # movers between two frames).
    sticky_frames: int = 5
    # Motion-check backend for the production path:
    #   "feature" — in-graph: epipolar check over ORB descriptor matches
    #     between consecutive frames, fused into the per-frame device
    #     program (TPU-first redesign: the matching is one MXU Hamming
    #     matmul the pipeline computes anyway, so the motion check adds
    #     no extra dispatches and no host round trips);
    #   "flow" — reference-parity: Harris corners + pyramidal LK + F-RANSAC
    #     as a separate device program (Frame::ProcessMovingObject,
    #     Frame.cc:311-393).
    motion_check: str = "feature"
    # Match window (px) for the feature motion check; wide enough to keep
    # fast movers matched across one frame interval.
    match_radius: float = 80.0
    # Run the detector every k-th frame (boxes propagate in between; the
    # reference tolerates stale boxes via ApproximateTime sync,
    # ros_rgbd.cc:73-78 — its CPU YOLOv5 runs at a few Hz against 30 Hz
    # frames, i.e. an effective cadence of ~5-10).  The sticky dynamic
    # mask bridges between detections.  1 = every frame.
    detector_cadence: int = 5


@dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching constants (ORBmatcher.cc:37-39 and call sites)."""

    th_high: int = 100          # TH_HIGH
    th_low: int = 50            # TH_LOW
    histo_length: int = 30      # rotation-consistency histogram bins
    nn_ratio_tracking: float = 0.9
    nn_ratio_bow: float = 0.75
    nn_ratio_init: float = 0.9
    # Window radii (px at level 0) for projection searches.
    radius_motion_model: float = 15.0   # SearchByProjection(F, LastFrame, th=7..15)
    radius_local_map: float = 3.0       # th=1 scaled by viewing angle (1 or 2.5/5)
    radius_init: float = 100.0          # SearchForInitialization window
    check_orientation: bool = True


@dataclass(frozen=True)
class OptimizerConfig:
    """Least-squares solver schedules (Optimizer.cc; SURVEY §2.1 Optimizer row)."""

    # Pose-only GN: 4 rounds x 10 iterations with chi2 gating per round,
    # robust kernel dropped from round 3 (Optimizer.cc:367-371,407,436).
    pose_rounds: int = 4
    pose_iters_per_round: int = 10
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    # Local BA: 5 then 10 LM iterations with an outlier gate between
    # (Optimizer.cc:659-709).
    local_ba_iters_first: int = 5
    local_ba_iters_second: int = 10
    # Global BA iteration count (LoopClosing.cc:651 uses 10; monocular init 20).
    global_ba_iters: int = 10
    init_ba_iters: int = 20
    # Essential-graph: 20 iterations, lambda_init 1e-16 (Optimizer.cc:987).
    essential_graph_iters: int = 20
    essential_graph_lambda_init: float = 1e-16
    # Sim3 optimization: 5 iters -> gate -> more (Optimizer.cc:1046-1241).
    sim3_iters_first: int = 5
    sim3_iters_second: int = 10
    # LM damping defaults.
    lm_lambda_init: float = 1e-4
    lm_lambda_factor: float = 2.0


@dataclass(frozen=True)
class TrackingConfig:
    """Tracking policy constants (Tracking.cc; SURVEY §2.1 Tracking row)."""

    # Keyframe policy (Tracking.cc:1049-1140).
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30     # defaults to fps
    kf_ref_ratio_many_close: float = 0.75
    kf_ref_ratio_stereo: float = 0.75
    kf_ref_ratio_mono: float = 0.9
    min_inliers_kf: int = 15
    # Local map bounds (Tracking.cc:1362 caps local KFs at 80).
    max_local_keyframes: int = 80
    # COEB adaptive feature budget (Tracking.cc:417-466).
    adaptive_budget: bool = True
    budget_step: int = 500
    budget_cap: int = 2000
    budget_floor: int = 1000
    weak_inlier_threshold: int = 100    # inliers <= 100 => grow budget
    strong_inlier_threshold: int = 200  # inliers > 200 counts as strong frame
    decay_success_window: int = 30      # 30 consecutive OK frames => decay
    decay_strong_window: int = 10       # 10 strong frames => decay
    # Relocalization / reset policy.
    reloc_min_inliers: int = 50
    reset_if_lost_with_kfs_below: int = 6   # Tracking.cc:542-550 (<=5 KFs)
    # Motion-model search fallback threshold (TrackWithMotionModel needs >=20
    # matches, widens window once; Tracking.cc:956-966).
    min_matches_motion_model: int = 20
    min_inliers_track: int = 10
    min_inliers_local_map: int = 30
    # Motion sanity gate: a per-frame solve that jumps further than this is a
    # failed track, not a fast camera (the reference reaches the same end via
    # LOST + relocalization; without a gate a false GN basin with self-
    # consistent wrong matches can masquerade as OK tracking).
    max_translation_per_frame: float = 0.35   # metres at video rate
    max_rotation_per_frame: float = 0.35      # radians (~20 deg)


@dataclass(frozen=True)
class MappingConfig:
    """Local mapping constants (LocalMapping.cc; SURVEY §2.1 LocalMapping row)."""

    # MapPointCulling (LocalMapping.cc:171-206).
    min_found_ratio: float = 0.25
    min_observations: int = 3
    # Triangulation gates (LocalMapping.cc:287-433).
    triangulation_chi2_mono: float = 5.991
    triangulation_chi2_stereo: float = 7.8
    # Covisibility (KeyFrame.cc:330).
    covisibility_weight_threshold: int = 15
    # KeyFrameCulling: >=90% of points seen >=3x elsewhere (LocalMapping.cc:633).
    kf_cull_redundancy_ratio: float = 0.9
    kf_cull_min_obs: int = 3
    # Number of covisible neighbors for triangulation pairs (10 RGB-D / 20 mono).
    triangulation_neighbors_rgbd: int = 10
    triangulation_neighbors_mono: int = 20


@dataclass(frozen=True)
class LoopConfig:
    """Loop closing constants (LoopClosing.cc; SURVEY §2.1 LoopClosing row)."""

    covisibility_consistency_threshold: int = 3   # LoopClosing.cc:44
    # Scale on the covisibility min-score gate (1.0 = reference semantics;
    # smaller vocabularies than ORBvoc under-estimate similarity, so
    # deployments with a freshly trained vocab may need < 1).
    min_score_factor: float = 1.0
    min_bow_matches: int = 20
    sim3_ransac_prob: float = 0.99
    sim3_ransac_min_inliers: int = 20
    sim3_ransac_iters: int = 300
    min_sim3_inliers: int = 20
    min_total_matches: int = 40
    essential_graph_min_covis: int = 100


@dataclass(frozen=True)
class MapConfig:
    """Fixed-capacity map-arena sizes (the TPU-native replacement for the
    reference's dynamically-grown std::set Map, Map.h:43-67)."""

    max_keyframes: int = 512
    max_points: int = 32768
    max_observations_per_kf: int = 2048   # == OrbConfig.max_keypoints
    covisibility_neighbors: int = 64      # top-K retained covis edges per KF


@dataclass(frozen=True)
class VocabularyConfig:
    """BoW vocabulary (DBoW2 TemplatedVocabulary equivalent; SURVEY §2.2)."""

    branching_factor: int = 10
    depth: int = 6
    # DBoW2 feature-vector grouping level: nodes 4 levels up from leaves
    # (Frame.cc:575 transform(..., 4)).
    feature_level: int = 4
    weighting: str = "tf-idf"
    scoring: str = "l1"


@dataclass(frozen=True)
class RansacConfig:
    """Batched RANSAC settings (replaces PnPsolver.cc / Sim3Solver.cc /
    Initializer.cc iterative RANSAC with vmapped hypothesis scoring)."""

    pnp_iterations: int = 300       # Tracking.cc:1465
    pnp_min_inliers: int = 10
    pnp_chi2: float = 5.991
    sim3_iterations: int = 300
    init_iterations: int = 200      # Initializer sigma=1.0, 200 its (Tracking.cc:648)
    init_sigma: float = 1.0
    homography_model_threshold: float = 0.40   # RH > 0.40 => H (Initializer.cc:112)


@dataclass(frozen=True)
class DetectorConfig:
    """In-graph detector settings (replaces the ROS YOLOv5 node; yolo_v5.py)."""

    conf_threshold: float = 0.3     # launch file sets 0.3 (yolo_v5.launch:17)
    iou_threshold: float = 0.45
    max_detections: int = 16
    input_size: int = 640
    # yolov5s compound scaling (models/yolov5s.yaml:4-5).
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    num_classes: int = 80


@dataclass(frozen=True)
class SystemConfig:
    """Top-level configuration bundle (the reference's YAML settings file plus
    every lifted constant)."""

    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: OrbConfig = field(default_factory=OrbConfig)
    dynamic: DynamicConfig = field(default_factory=DynamicConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    map: MapConfig = field(default_factory=MapConfig)
    vocabulary: VocabularyConfig = field(default_factory=VocabularyConfig)
    ransac: RansacConfig = field(default_factory=RansacConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    sensor: str = "rgbd"            # "rgbd" | "monocular" | "stereo"
    use_dynamic_filtering: bool = True

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


def _build(cls, data: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in data.items() if k in names})


def load_config(path: str) -> SystemConfig:
    """Load a SystemConfig from a YAML file.

    Accepts either this package's nested schema (sections named after the
    SystemConfig fields) or the reference's flat cv::FileStorage key style
    (``Camera.fx``, ``ORBextractor.nFeatures``, ... — the keys read at
    Tracking.cc:55-150) so the reference's Examples/RGB-D/*.yaml settings can
    be consumed directly.
    """
    with open(path) as f:
        text = f.read()
    if text.startswith("%YAML"):
        # cv::FileStorage files begin with a %YAML directive, use "---"
        # documents, and tolerate "key:value" with no space after the colon
        # (the reference's shipped tum_bag.yaml does this) — PyYAML rejects
        # that, so parse flat key/value lines directly.
        data = {}
        for line in text.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or line.startswith("%") or line == "---":
                continue
            if ":" not in line:
                continue
            key, _, value = line.partition(":")
            value = value.strip()
            try:
                data[key.strip()] = float(value) if "." in value or "e" in value \
                    else int(value)
            except ValueError:
                data[key.strip()] = value
    else:
        data = yaml.safe_load(text) or {}

    if any("." in k for k in data):
        return _from_filestorage(data)

    kwargs = {}
    section_types = {
        "camera": CameraConfig, "orb": OrbConfig, "dynamic": DynamicConfig,
        "matcher": MatcherConfig, "optimizer": OptimizerConfig,
        "tracking": TrackingConfig, "mapping": MappingConfig,
        "loop": LoopConfig, "map": MapConfig, "vocabulary": VocabularyConfig,
        "ransac": RansacConfig, "detector": DetectorConfig,
    }
    for key, cls in section_types.items():
        if key in data:
            section = {k: tuple(v) if isinstance(v, list) else v
                       for k, v in data[key].items()}
            kwargs[key] = _build(cls, section)
    for key in ("sensor", "use_dynamic_filtering"):
        if key in data:
            kwargs[key] = data[key]
    return SystemConfig(**kwargs)


def _from_filestorage(data: dict) -> SystemConfig:
    """Map reference-style flat keys onto SystemConfig."""
    cam_map = {
        "Camera.fx": "fx", "Camera.fy": "fy", "Camera.cx": "cx",
        "Camera.cy": "cy", "Camera.k1": "k1", "Camera.k2": "k2",
        "Camera.p1": "p1", "Camera.p2": "p2", "Camera.k3": "k3",
        "Camera.width": "width", "Camera.height": "height",
        "Camera.fps": "fps", "Camera.bf": "bf", "ThDepth": "th_depth",
        "DepthMapFactor": "depth_map_factor", "Camera.RGB": "rgb_order",
    }
    orb_map = {
        "ORBextractor.nFeatures": "n_features",
        "ORBextractor.scaleFactor": "scale_factor",
        "ORBextractor.nLevels": "n_levels",
        "ORBextractor.iniThFAST": "fast_threshold_init",
        "ORBextractor.minThFAST": "fast_threshold_min",
    }
    cam = {v: data[k] for k, v in cam_map.items() if k in data}
    orb = {v: data[k] for k, v in orb_map.items() if k in data}
    if "width" in cam:
        cam["width"] = int(cam["width"])
    if "height" in cam:
        cam["height"] = int(cam["height"])
    for int_key in ("n_features", "n_levels", "fast_threshold_init",
                    "fast_threshold_min"):
        if int_key in orb:
            orb[int_key] = int(orb[int_key])
    return SystemConfig(camera=_build(CameraConfig, cam),
                        orb=_build(OrbConfig, orb))


DEFAULT_CONFIG = SystemConfig()
