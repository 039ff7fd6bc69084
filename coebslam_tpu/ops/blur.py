"""Per-region blur metrics — the COEB motion-blur gate.

The reference computes a Laplacian-based sharpness score per detector box and
flags boxes below 4.2 as blurred (`Frame::detect_laplacian`, Frame.cc:171-202,
905-913); Brenner / Tenengrad / Energy variants were implemented and rejected
(Frame.cc:915-981, ablation data in comments at Frame.cc:174-177).  All four
are provided here, selectable via config, computed as masked reductions over
the full image so any number of boxes is scored in one fused pass.
"""
from __future__ import annotations

import jax.numpy as jnp


def _box_mask(h, w, boxes):
    """[B, H, W] bool masks from [B, 4] (xmin, ymin, xmax, ymax); a box with
    xmin < 0 is absent."""
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = ((xs >= boxes[:, 0, None, None]) & (xs <= boxes[:, 2, None, None])
              & (ys >= boxes[:, 1, None, None]) & (ys <= boxes[:, 3, None, None]))
    present = boxes[:, 0] >= 0.0
    return inside & present[:, None, None]


def laplacian_map(img):
    """4-neighbour Laplacian (cv::Laplacian ksize=1 kernel [0 1 0;1 -4 1;0 1 0])."""
    p = jnp.pad(img, 1, mode="edge")
    return (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
            - 4.0 * img)


def brenner_map(img):
    """Brenner gradient: (I(x+2) - I(x))^2."""
    p = jnp.pad(img, ((0, 0), (0, 2)), mode="edge")
    d = p[:, 2:] - p[:, :-2]
    return d * d


def tenengrad_map(img):
    """Tenengrad: squared Sobel gradient magnitude."""
    p = jnp.pad(img, 1, mode="edge")
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 2.0 \
        + (p[:-2, 2:] - p[:-2, :-2]) + (p[2:, 2:] - p[2:, :-2])
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 2.0 \
        + (p[2:, 2:] - p[:-2, 2:]) + (p[2:, :-2] - p[:-2, :-2])
    return gx * gx + gy * gy


def energy_map(img):
    """Energy-of-gradient: (I(x+1)-I(x))^2 + (I(y+1)-I(y))^2."""
    px = jnp.pad(img, ((0, 0), (0, 1)), mode="edge")
    py = jnp.pad(img, ((0, 1), (0, 0)), mode="edge")
    dx = px[:, 1:] - px[:, :-1]
    dy = py[1:, :] - py[:-1, :]
    return dx * dx + dy * dy


_METRICS = {
    "laplacian": laplacian_map,
    "brenner": brenner_map,
    "tenengrad": tenengrad_map,
    "energy": energy_map,
}


def box_blur_scores(img, boxes, metric: str = "laplacian"):
    """Sharpness score per box ([B]).

    For the (default) Laplacian metric the score is the *variance* of the
    Laplacian inside the box — the standard variance-of-Laplacian measure the
    reference thresholds at 4.2.  Other metrics use the mean response.
    Absent boxes (xmin < 0) score +inf (never flagged blurred).
    """
    h, w = img.shape
    masks = _box_mask(h, w, boxes)
    resp = _METRICS[metric](img)
    area = jnp.maximum(masks.sum(axis=(1, 2)), 1.0)
    if metric == "laplacian":
        mean = (resp[None] * masks).sum(axis=(1, 2)) / area
        var = (((resp[None] - mean[:, None, None]) ** 2) * masks
               ).sum(axis=(1, 2)) / area
        score = jnp.sqrt(var)   # std of Laplacian (reference's scale ~4.2)
    else:
        score = (resp[None] * masks).sum(axis=(1, 2)) / area
    present = boxes[:, 0] >= 0.0
    return jnp.where(present, score, jnp.inf)
