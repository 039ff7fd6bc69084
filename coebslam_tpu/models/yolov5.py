"""YOLOv5s in Flax — the in-graph dynamic-object detector.

Replaces the reference's out-of-process PyTorch YOLOv5 ROS node
(yolov5/yolov5_ros/scripts/yolo_v5.py + the vendored ultralytics v6.0 repo,
SURVEY §2.3): same architecture family — CSP backbone with C3 blocks + SPPF,
PANet neck, anchor-based Detect head on P3/P4/P5 with the yolov5s compound
scaling (depth 0.33 / width 0.50, models/yolov5s.yaml:4-48) — re-implemented
NHWC-native for the TPU so detection runs inside the same jitted step as
feature extraction (no host round-trip, no ROS sync).

BatchNorm runs in inference mode (running statistics are parameters);
`port_torch_weights` maps an ultralytics yolov5s v6.0 checkpoint's
state_dict onto this module's parameter tree (OIHW -> HWIO transposes).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# yolov5s v6.0 anchors (models/yolov5s.yaml:7-10), (w, h) px per stride.
ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),       # P3/8
    ((30, 61), (62, 45), (59, 119)),      # P4/16
    ((116, 90), (156, 198), (373, 326)),  # P5/32
)
STRIDES = (8, 16, 32)


def _width(c: int, mult: float = 0.50) -> int:
    """Width scaling rounded to a multiple of 8 (ultralytics make_divisible)."""
    return int(np.ceil(c * mult / 8) * 8)


def _depth(n: int, mult: float = 0.33) -> int:
    return max(int(round(n * mult)), 1)


class ConvBN(nn.Module):
    """Conv + BatchNorm(inference) + SiLU — ultralytics `Conv`."""
    out_ch: int
    kernel: int = 1
    stride: int = 1
    pad: int = -1   # -1: autopad (k // 2)

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2 if self.pad < 0 else self.pad
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.97,
                         epsilon=1e-3, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.out_ch, 1, name="cv1")(x)
        y = ConvBN(self.out_ch, 3, name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.out_ch:
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (ultralytics `C3`)."""
    out_ch: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.out_ch // 2
        a = ConvBN(hidden, 1, name="cv1")(x)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, name=f"m{i}")(a)
        b = ConvBN(hidden, 1, name="cv2")(x)
        return ConvBN(self.out_ch, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1))


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (cascade of 5x5 maxpools)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvBN(hidden, 1, name="cv1")(x)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBN(self.out_ch, 1, name="cv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1))


class YoloV5s(nn.Module):
    """Full yolov5s: backbone + PANet neck + Detect head.

    Input: [B, H, W, 3] float32 in [0, 1], H/W multiples of 32.
    Output: list of 3 raw head tensors [B, Hs, Ws, 3, 5+nc].
    """
    num_classes: int = 80
    width_mult: float = 0.50
    depth_mult: float = 0.33

    @nn.compact
    def __call__(self, x):
        w = lambda c: _width(c, self.width_mult)
        d = lambda n: _depth(n, self.depth_mult)
        nc = self.num_classes

        # Backbone (yolov5s.yaml rows 0-9).
        x = ConvBN(w(64), 6, 2, pad=2, name="b0")(x)     # P1/2 (yaml: p=2)
        x = ConvBN(w(128), 3, 2, name="b1")(x)           # P2/4
        x = C3(w(128), d(3), name="b2")(x)
        x = ConvBN(w(256), 3, 2, name="b3")(x)           # P3/8
        p3 = C3(w(256), d(6), name="b4")(x)
        x = ConvBN(w(512), 3, 2, name="b5")(p3)          # P4/16
        p4 = C3(w(512), d(9), name="b6")(x)
        x = ConvBN(w(1024), 3, 2, name="b7")(p4)         # P5/32
        x = C3(w(1024), d(3), name="b8")(x)
        p5 = SPPF(w(1024), name="b9")(x)

        # Head (rows 10-23).
        h10 = ConvBN(w(512), 1, name="h10")(p5)
        up = jax.image.resize(h10, (h10.shape[0], h10.shape[1] * 2,
                                    h10.shape[2] * 2, h10.shape[3]),
                              "nearest")
        x = jnp.concatenate([up, p4], axis=-1)
        h13 = C3(w(512), d(3), shortcut=False, name="h13")(x)
        h14 = ConvBN(w(256), 1, name="h14")(h13)
        up = jax.image.resize(h14, (h14.shape[0], h14.shape[1] * 2,
                                    h14.shape[2] * 2, h14.shape[3]),
                              "nearest")
        x = jnp.concatenate([up, p3], axis=-1)
        out3 = C3(w(256), d(3), shortcut=False, name="h17")(x)   # P3 out
        x = ConvBN(w(256), 3, 2, name="h18")(out3)
        x = jnp.concatenate([x, h14], axis=-1)
        out4 = C3(w(512), d(3), shortcut=False, name="h20")(x)   # P4 out
        x = ConvBN(w(512), 3, 2, name="h21")(out4)
        x = jnp.concatenate([x, h10], axis=-1)
        out5 = C3(w(1024), d(3), shortcut=False, name="h23")(x)  # P5 out

        # Detect head: 1x1 convs to 3*(5+nc) per scale.
        outs = []
        for i, feat in enumerate((out3, out4, out5)):
            y = nn.Conv(3 * (5 + nc), (1, 1), name=f"detect{i}")(feat)
            b, hh, ww, _ = y.shape
            outs.append(y.reshape(b, hh, ww, 3, 5 + nc))
        return outs


def decode_predictions(raw_outputs, num_classes: int = 80):
    """Decode raw head tensors to [B, N, 5+nc] (xywh px, obj, cls scores).

    ultralytics v6 decode: xy = (2*sig(t) - 0.5 + grid) * stride,
    wh = (2*sig(t))^2 * anchor.
    """
    all_boxes = []
    for lvl, raw in enumerate(raw_outputs):
        b, h, w, na, _ = raw.shape
        stride = STRIDES[lvl]
        anchors = jnp.asarray(ANCHORS[lvl], jnp.float32)      # [3, 2]
        sig = jax.nn.sigmoid(raw)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        xy = (2.0 * sig[..., 0:2] - 0.5 + grid) * stride
        wh = (2.0 * sig[..., 2:4]) ** 2 * anchors[None, None, None, :, :]
        rest = sig[..., 4:]
        dec = jnp.concatenate([xy, wh, rest], axis=-1)
        all_boxes.append(dec.reshape(b, h * w * na, 5 + num_classes))
    return jnp.concatenate(all_boxes, axis=1)


def nms_topk(decoded, *, conf_threshold: float = 0.3,
             iou_threshold: float = 0.45, max_detections: int = 16,
             class_filter=None):
    """Fixed-size in-graph NMS (SURVEY §2.3: "NMS as fixed-size top-k
    in-graph").

    Args:
      decoded: [N, 5+nc] single-image decoded predictions.
      class_filter: optional tuple of class ids to keep (the reference keeps
        only "person", yolo_v5.py:126).
    Returns (boxes [max_detections, 4] xyxy (-1 padded), scores, classes).
    """
    xy, wh = decoded[:, 0:2], decoded[:, 2:4]
    obj = decoded[:, 4]
    cls_scores = decoded[:, 5:]
    cls_id = jnp.argmax(cls_scores, axis=-1)
    score = obj * jnp.max(cls_scores, axis=-1)

    keep = score >= conf_threshold
    if class_filter is not None:
        in_filter = jnp.zeros_like(keep)
        for c in class_filter:
            in_filter = in_filter | (cls_id == c)
        keep = keep & in_filter
    score = jnp.where(keep, score, 0.0)

    x1y1 = xy - wh / 2
    x2y2 = xy + wh / 2
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)          # [N, 4]

    # Greedy NMS over the top-K candidates only (K = 4 * max_detections).
    k = min(4 * max_detections, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    top_boxes = boxes[top_idx]
    top_cls = cls_id[top_idx]

    area = jnp.maximum(top_boxes[:, 2] - top_boxes[:, 0], 0.0) \
        * jnp.maximum(top_boxes[:, 3] - top_boxes[:, 1], 0.0)
    lt = jnp.maximum(top_boxes[:, None, :2], top_boxes[None, :, :2])
    rb = jnp.minimum(top_boxes[:, None, 2:], top_boxes[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(i, alive):
        # Suppress lower-scored boxes overlapping box i if i is alive.
        suppress = (iou[i] > iou_threshold) \
            & (jnp.arange(k) > i) & alive[i]
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, k, body, top_score > 0.0)
    final_score = jnp.where(alive, top_score, 0.0)
    sel_score, sel = jax.lax.top_k(final_score, max_detections)
    valid = sel_score > 0.0
    out_boxes = jnp.where(valid[:, None], top_boxes[sel], -1.0)
    return out_boxes, sel_score, jnp.where(valid, top_cls[sel], -1)


# --------------------------------------------------------------------- #
# torch checkpoint porting
# --------------------------------------------------------------------- #

# (flax module name, ultralytics model.N index) pairs, in yaml order.
_LAYER_MAP = [
    ("b0", 0), ("b1", 1), ("b2", 2), ("b3", 3), ("b4", 4), ("b5", 5),
    ("b6", 6), ("b7", 7), ("b8", 8), ("b9", 9), ("h10", 10), ("h13", 13),
    ("h14", 14), ("h17", 17), ("h18", 18), ("h20", 20), ("h21", 21),
    ("h23", 23),
]


def port_torch_weights(state_dict: Dict[str, Any], num_classes: int = 80):
    """Map an ultralytics yolov5s v6.0 state_dict (e.g. from yolov5s.pt:
    ``ckpt['model'].float().state_dict()``) onto this Flax module.

    Returns a {'params': ..., 'batch_stats': ...} variables dict.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def conv_bn(dst_p, dst_s, src):
        params[f"{dst_p}/conv"] = {
            "kernel": to_np(state_dict[f"{src}.conv.weight"]
                            ).transpose(2, 3, 1, 0)}
        params[f"{dst_p}/bn"] = {
            "scale": to_np(state_dict[f"{src}.bn.weight"]),
            "bias": to_np(state_dict[f"{src}.bn.bias"])}
        stats[f"{dst_p}/bn"] = {
            "mean": to_np(state_dict[f"{src}.bn.running_mean"]),
            "var": to_np(state_dict[f"{src}.bn.running_var"])}

    def c3(dst, src, n):
        conv_bn(f"{dst}/cv1", None, f"{src}.cv1")
        conv_bn(f"{dst}/cv2", None, f"{src}.cv2")
        conv_bn(f"{dst}/cv3", None, f"{src}.cv3")
        for i in range(n):
            conv_bn(f"{dst}/m{i}/cv1", None, f"{src}.m.{i}.cv1")
            conv_bn(f"{dst}/m{i}/cv2", None, f"{src}.m.{i}.cv2")

    d = lambda n: _depth(n)
    for name, idx in _LAYER_MAP:
        src = f"model.{idx}"
        if name in ("b2", "b8", "h13", "h17", "h20", "h23"):
            c3(name, src, d(3))
        elif name == "b4":
            c3(name, src, d(6))
        elif name == "b6":
            c3(name, src, d(9))
        elif name == "b9":
            conv_bn(f"{name}/cv1", None, f"{src}.cv1")
            conv_bn(f"{name}/cv2", None, f"{src}.cv2")
        else:
            conv_bn(name, None, src)

    for i in range(3):
        wkey = f"model.24.m.{i}.weight"
        params[f"detect{i}"] = {
            "kernel": to_np(state_dict[wkey]).transpose(2, 3, 1, 0),
            "bias": to_np(state_dict[f"model.24.m.{i}.bias"]),
        }

    def nest(flat):
        tree: Dict[str, Any] = {}
        for key, leaf in flat.items():
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = {k: jnp.asarray(v) for k, v in leaf.items()}
        return tree

    return {"params": nest(params), "batch_stats": nest(stats)}
