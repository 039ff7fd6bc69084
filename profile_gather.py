#!/usr/bin/env python
"""Compare patch-extraction strategies on the TPU."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from coebslam_tpu.ops import lk_flow

H, W, N, P = 480, 640, 1024, 32
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(H, W).astype(np.float32))
pts = jnp.asarray(
    np.stack([rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)],
             -1).astype(np.float32))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


# A. current pointwise bilinear gather
timeit("pointwise bilinear 1024x21x21",
       jax.jit(lambda i, c: lk_flow.bilinear_gather(i, c, 21)), img, pts)

# B. vmapped dynamic_slice PxP integer patches
def vslice(i, c):
    y0 = jnp.clip(c[:, 1].astype(jnp.int32) - P // 2, 0, H - P)
    x0 = jnp.clip(c[:, 0].astype(jnp.int32) - P // 2, 0, W - P)
    return jax.vmap(lambda y, x: jax.lax.dynamic_slice(i, (y, x), (P, P)))(y0, x0)
timeit(f"vmap dynamic_slice {N}x{P}x{P}", jax.jit(vslice), img, pts)

# C. row gather [N, P, W] then column matmul to P
def rowgather(i, c):
    y0 = jnp.clip(c[:, 1].astype(jnp.int32) - P // 2, 0, H - P)
    rows = i[y0[:, None] + jnp.arange(P)[None, :]]         # [N, P, W]
    # column interpolation matrix [N, W, P]
    x0 = jnp.clip(c[:, 0] - P // 2, 0.0, W - P - 1.0)
    d = jnp.arange(W, dtype=jnp.float32)[None, :, None] \
        - (x0[:, None, None] + jnp.arange(P, dtype=jnp.float32)[None, None, :])
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.einsum("npw,nwq->npq", rows, Ax)
timeit(f"row gather+matmul {N}x{P}x{P}", jax.jit(rowgather), img, pts)

# D. in-patch matmul resample (big patch assumed resident): shift by v
big = vslice(img, pts)                                      # [N, P, P]
v = jnp.asarray(rng.uniform(-3, 3, (N, 2)).astype(np.float32))
Wn = 21
def resample(bp, v):
    # sample window Wn at fractional offset v from patch center
    base = (P - Wn) / 2.0
    dy = jnp.arange(P, dtype=jnp.float32)[None, :, None] \
        - (base + v[:, 1:2, None] + jnp.arange(Wn, dtype=jnp.float32)[None, None, :])
    Ay = jnp.maximum(0.0, 1.0 - jnp.abs(dy))                # [N, P, Wn]
    dx = jnp.arange(P, dtype=jnp.float32)[None, :, None] \
        - (base + v[:, 0:1, None] + jnp.arange(Wn, dtype=jnp.float32)[None, None, :])
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    return jnp.einsum("npw,npq,nwk->nqk", bp, Ay, Ax)
timeit("in-patch matmul resample x10",
       jax.jit(lambda bp, v: jax.lax.fori_loop(
           0, 10, lambda k, a: a + resample(bp, v + 0.1 * k),
           jnp.zeros((N, Wn, Wn)))), big, v)
