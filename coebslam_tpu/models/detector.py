"""Detector interface: in-graph YOLOv5 and the deterministic fake detector.

The reference feeds boxes over ROS from a separate PyTorch process
(yolo_v5.py); here the detector is a plain object with
``detect(gray) -> [B, 4] xyxy boxes`` that the System facade calls
per-frame.  Two implementations:

* YoloDetector — the Flax YOLOv5s of models/yolov5.py, fully jitted
  (resize + normalize + forward + decode + fixed-size NMS in one program),
  filtered to the configured dynamic classes (person-only by default,
  matching yolo_v5.py:126).
* FakeDetector — precomputed boxes per frame (SURVEY §4: the deterministic
  fake detector the test strategy calls for).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DetectorConfig, DynamicConfig
from . import yolov5


class FakeDetector:
    """Replays a precomputed box sequence (ground truth in tests)."""

    def __init__(self, boxes_per_frame: Sequence):
        self._boxes = [np.asarray(b, np.float32).reshape(-1, 4)
                       for b in boxes_per_frame]
        self._i = 0

    def detect(self, gray) -> np.ndarray:
        b = self._boxes[min(self._i, len(self._boxes) - 1)]
        self._i += 1
        return b


def load_variables_npz(path: str):
    """Load Flax variables saved by tools/train_detector.py (flattened
    '/'-joined npz keys -> nested dict).  Returns (variables, meta)."""
    z = np.load(path)
    out: dict = {}
    meta = {}
    for k in z.files:
        if k.startswith("__"):
            meta[k.strip("_")] = z[k]
            continue
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[k])
    return out, meta


class YoloDetector:
    """In-graph YOLOv5s person detector."""

    def __init__(self, cfg: DetectorConfig, dyn_cfg: DynamicConfig,
                 variables=None, rng_seed: int = 0,
                 dilate: float = 0.0):
        """Args:
          variables: Flax variables dict — from yolov5.port_torch_weights()
            for real checkpoints, or None for random init (useful only for
            pipeline/shape testing).
        """
        self.cfg = cfg
        self.model = yolov5.YoloV5s(num_classes=cfg.num_classes,
                                    width_mult=cfg.width_multiple,
                                    depth_mult=cfg.depth_multiple)
        size = cfg.input_size
        if variables is None:
            # Jitted init: eager Flax init dispatches hundreds of individual
            # ops — through the remote-compile relay that is minutes of
            # compile churn (and it degrades every later dispatch in the
            # process); one fused init program takes seconds.
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, size, size, 3)))
        self.variables = variables
        self._class_filter = tuple(dyn_cfg.dynamic_classes)
        self._max_boxes = int(dyn_cfg.max_boxes)

        def run(gray):
            h, w = gray.shape
            img = jnp.stack([gray, gray, gray], axis=-1) / 255.0
            inp = jax.image.resize(img, (size, size, 3), "linear")[None]
            raw = self.model.apply(self.variables, inp)
            dec = yolov5.decode_predictions(raw, cfg.num_classes)[0]
            boxes, scores, classes = yolov5.nms_topk(
                dec, conf_threshold=cfg.conf_threshold,
                iou_threshold=cfg.iou_threshold,
                max_detections=cfg.max_detections,
                class_filter=self._class_filter)
            # Map from detector input scale back to image pixels.
            scale = jnp.asarray([w / size, h / size, w / size, h / size],
                                jnp.float32)
            boxes = jnp.where(boxes >= 0, boxes * scale, -1.0)
            if dilate > 0.0:
                # Safety margin for the dynamic mask: an imperfect box
                # that clips a limb leaks moving keypoints into the map
                # (the reference relies on yolov5's tight person boxes;
                # a reduced synthetic-trained net earns a margin).
                ctr = 0.5 * (boxes[:, :2] + boxes[:, 2:])
                half = 0.5 * (boxes[:, 2:] - boxes[:, :2]) * (1.0 + dilate)
                dil = jnp.concatenate([ctr - half, ctr + half], axis=1)
                boxes = jnp.where(boxes[:, :1] >= 0, dil, boxes)
            # Fixed [max_boxes, 4] shape for the fused dynamic step (rows
            # are score-ordered; overflow truncates, shortfall pads -1).
            pad = self._max_boxes - boxes.shape[0]
            if pad > 0:
                boxes_p = jnp.concatenate(
                    [boxes, jnp.full((pad, 4), -1.0, jnp.float32)])
            else:
                boxes_p = boxes[:self._max_boxes]
            return boxes, scores, classes, boxes_p

        self._jit_run = jax.jit(run)

    def detect(self, gray) -> np.ndarray:
        boxes, scores, classes, _ = self._jit_run(jnp.asarray(gray))
        b = np.asarray(boxes)
        return b[b[:, 0] >= 0]

    def detect_device(self, gray) -> jnp.ndarray:
        """Padded [dynamic.max_boxes, 4] pixel boxes, kept ON DEVICE — the
        fused dynamic tracking step consumes them directly, so a frame with
        detection costs zero host round trips (the reference pays a full
        ROS pub/sub hop here, ros_rgbd.cc:73-78)."""
        return self._jit_run(jnp.asarray(gray))[3]


class BlurGate:
    """Flow-magnitude frame gate (yolo_v5_blur.py parity, SURVEY §2.3).

    The reference's experimental detector variant measures LK-flow magnitude
    between consecutive frames; when motion exceeds a threshold it buffers 3
    frames and emits only the sharpest (yolo_v5_blur.py:55-69,111-142),
    trading latency for blur robustness during fast motion.

    Usage: ``keep, best = gate.push(gray)`` per frame; ``keep`` False means
    "buffering, skip this frame", ``best`` is the sharpest buffered frame
    (with its stamp) when the buffer flushes.
    """

    def __init__(self, flow_threshold: float = 500.0, buffer_size: int = 3,
                 n_track_points: int = 256):
        import jax
        import jax.numpy as jnp
        from ..ops import blur as blur_ops
        from ..ops import lk_flow

        self.flow_threshold = float(flow_threshold)
        self.buffer_size = int(buffer_size)
        self._buf = []                     # [(stamp, gray, sharpness)]
        self._prev = None

        def measure(prev_gray, gray):
            pl = lk_flow.build_flow_pyramid(prev_gray)
            nl = lk_flow.build_flow_pyramid(gray)
            pts, ok = lk_flow.good_features(prev_gray, n_track_points)
            fr = lk_flow.lk_flow(pl, nl, pts)
            mag = jnp.where(ok & fr.valid,
                            jnp.linalg.norm(fr.points - pts, axis=-1), 0.0)
            # yolo_v5_blur sums |du|+|dv| over tracked corners as its motion
            # statistic; Laplacian variance is its sharpness score.
            motion = mag.sum()
            sharp = jnp.var(blur_ops.laplacian_map(gray))
            return motion, sharp

        self._jit_measure = jax.jit(measure)

    def push(self, gray, stamp: float = 0.0):
        """Returns (emit: bool, (stamp, gray) or None)."""
        import jax.numpy as jnp
        g = jnp.asarray(gray)
        if self._prev is None:
            self._prev = g
            return True, (stamp, gray)
        motion, sharp = self._jit_measure(self._prev, g)
        self._prev = g
        if float(motion) <= self.flow_threshold and not self._buf:
            return True, (stamp, gray)
        self._buf.append((stamp, gray, float(sharp)))
        if len(self._buf) < self.buffer_size:
            return False, None
        best = max(self._buf, key=lambda x: x[2])
        self._buf = []
        return True, (best[0], best[1])
