#!/usr/bin/env python
"""Profile the COEB dynamic front-end pieces on the real TPU."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from coebslam_tpu.config import SystemConfig
from coebslam_tpu.models.detector import YoloDetector
from coebslam_tpu.ops import blur as blur_ops
from coebslam_tpu.ops import fundamental, lk_flow
from coebslam_tpu.slam import dynamic as dynamic_mod

cfg = SystemConfig()
H, W = 480, 640
rng = np.random.RandomState(0)
g0 = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255)
g1 = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255)
boxes = np.full((cfg.dynamic.max_boxes, 4), -1.0, np.float32)
boxes[0] = [100, 100, 200, 300]
boxes[1] = [400, 50, 500, 400]
boxes_d = jnp.asarray(boxes)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:8.1f} ms")
    return out


# 1. detector
det = YoloDetector(cfg.detector, cfg.dynamic)
timeit("yolo detect (jit+fetch)", lambda g: det.detect(np.asarray(g)), g1, n=5)
timeit("yolo forward only", det._jit_run, g1, n=5)

# 2. good_features
jf = jax.jit(lambda g: lk_flow.good_features(g, cfg.dynamic.n_flow_points,
                                             use_harris=True))
pts, valid = timeit("good_features", jf, g0)

# 3. pyramids
jp = jax.jit(lambda g: lk_flow.build_flow_pyramid(g))
pyr0 = timeit("build_flow_pyramid", jp, g0)
pyr1 = jp(g1)

# 4. LK flow
jl = jax.jit(lambda p0, p1, pts: lk_flow.lk_flow(list(p0), list(p1), pts))
fr = timeit("lk_flow", jl, tuple(pyr0), tuple(pyr1), pts)

# 5. F-RANSAC
jfr = jax.jit(lambda a, b, v, k: fundamental.find_fundamental_ransac(
    a, b, v, k, n_hypotheses=cfg.dynamic.f_ransac_iters,
    threshold=cfg.dynamic.f_ransac_threshold))
timeit("f_ransac", jfr, pts, fr.points, valid & fr.valid, key)

# 6. blur scores
jb = jax.jit(lambda g, b: blur_ops.box_blur_scores(g, b, metric="laplacian"))
timeit("box_blur_scores", jb, g1, boxes_d)

# 7. whole dynamic_frontend
jd = jax.jit(lambda pg, g, b, k: dynamic_mod.dynamic_frontend(pg, g, b, k, cfg))
timeit("dynamic_frontend (full)", jd, g0, g1, boxes_d, key, n=5)

# 8. bilinear gather alone (the LK inner op)
jg = jax.jit(lambda img, c: lk_flow.bilinear_gather(img, c, 21))
timeit("bilinear_gather 1000x21x21", jg, g0, pts)
