"""YOLOv5s-Flax vs the vendored ultralytics torch model (oracle), plus
decode/NMS behavior tests."""
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.models import yolov5
from coebslam_tpu.config import DetectorConfig, DynamicConfig

YOLO_DIR = "/root/reference/yolov5/yolov5_ros/yolov5"


def _load_torch_oracle():
    """Instantiate the vendored (2021-era) ultralytics model with stubs for
    its unavailable/downloading dependencies.  Oracle only — never shipped."""
    stub = types.ModuleType("pkg_resources")

    class _V:
        def __init__(self, s):
            self.s = tuple(int(x) for x in str(s).split(".")[:3] if x.isdigit())
        def __ge__(self, o): return self.s >= o.s
        def __lt__(self, o): return self.s < o.s
        def __eq__(self, o): return self.s == o.s

    stub.parse_version = _V
    sys.modules.setdefault("pkg_resources", stub)
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.10.0"
    tv.ops = types.SimpleNamespace(nms=None)
    sys.modules.setdefault("torchvision", tv)
    dl = types.ModuleType("utils.downloads")
    dl.gsutil_getsize = lambda *a, **k: 0
    dl.attempt_download = lambda *a, **k: None
    dl.safe_download = lambda *a, **k: None
    sys.modules.setdefault("utils.downloads", dl)
    pl = types.ModuleType("utils.plots")
    pl.Annotator = object
    pl.colors = lambda *a, **k: (0, 0, 0)
    pl.save_one_box = lambda *a, **k: None
    pl.feature_visualization = lambda *a, **k: None
    sys.modules.setdefault("utils.plots", pl)

    if YOLO_DIR not in sys.path:
        sys.path.insert(0, YOLO_DIR)
    import torch
    from models.yolo import Model
    torch.manual_seed(0)
    tm = Model(f"{YOLO_DIR}/models/yolov5s.yaml", ch=3, nc=80).float().eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    return tm, torch


class TestYoloParity:
    def test_param_count_matches_yolov5s(self):
        model = yolov5.YoloV5s()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n == 7235389          # official yolov5s v6.0 count

    def test_matches_torch_oracle(self):
        import os
        if not os.path.isdir(YOLO_DIR):
            pytest.skip("vendored yolov5 unavailable")
        tm, torch = _load_torch_oracle()
        variables = yolov5.port_torch_weights(tm.state_dict())
        x = np.random.RandomState(1).rand(1, 256, 256, 3).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_dec = (t_out[0] if isinstance(t_out, tuple) else t_out)[0].numpy()

        ours_raw = yolov5.YoloV5s().apply(variables, jnp.asarray(x))
        dec = np.asarray(yolov5.decode_predictions(ours_raw))[0]

        # torch orders each scale anchor-major (a, y, x); ours is (y, x, a).
        reordered = []
        off = 0
        for raw in ours_raw:
            _, h, w, na, c = raw.shape
            blk = dec[off:off + h * w * na].reshape(h, w, na, c)
            reordered.append(blk.transpose(2, 0, 1, 3).reshape(-1, c))
            off += h * w * na
        dec_t_order = np.concatenate(reordered)
        err = np.abs(dec_t_order - t_dec)
        assert err.max() < 5e-3, err.max()
        assert err.mean() < 1e-4


class TestDecodeNMS:
    def test_nms_suppresses_overlaps(self):
        # Two overlapping high-score boxes + one distant.
        dec = np.zeros((8, 85), np.float32)
        dec[0, :5] = [100, 100, 40, 40, 0.9]
        dec[1, :5] = [104, 102, 40, 40, 0.8]
        dec[2, :5] = [300, 300, 40, 40, 0.7]
        dec[:, 5] = 1.0          # class 0 prob
        boxes, scores, classes = yolov5.nms_topk(
            jnp.asarray(dec), conf_threshold=0.3, iou_threshold=0.45,
            max_detections=4)
        valid = np.asarray(scores) > 0
        assert valid.sum() == 2
        assert np.asarray(classes)[valid].tolist() == [0, 0]

    def test_class_filter(self):
        dec = np.zeros((4, 85), np.float32)
        dec[0, :5] = [50, 50, 20, 20, 0.9]
        dec[0, 5] = 1.0           # class 0 (person)
        dec[1, :5] = [200, 50, 20, 20, 0.9]
        dec[1, 7] = 1.0           # class 2
        boxes, scores, classes = yolov5.nms_topk(
            jnp.asarray(dec), conf_threshold=0.3, max_detections=4,
            class_filter=(0,))
        valid = np.asarray(scores) > 0
        assert valid.sum() == 1
        assert int(np.asarray(classes)[valid][0]) == 0

    def test_detector_wrapper_runs(self):
        from coebslam_tpu.models.detector import YoloDetector
        det = YoloDetector(DetectorConfig(input_size=128),
                           DynamicConfig())
        gray = np.random.RandomState(0).rand(120, 160).astype(np.float32) * 255
        out = det.detect(gray)
        assert out.ndim == 2 and out.shape[1] == 4
