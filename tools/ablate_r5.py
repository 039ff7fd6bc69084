#!/usr/bin/env python
"""Ablate the r4 headline regression (973 -> 766 fps, VERDICT weak #1).

One A/B per suspected cost: maintenance cadence, BA window width, the
sibling detector process, and the r5 retry-skip.  Each configuration
measures SECOND-pass fps on the standard 150-frame synthetic walker
scene (docs/TPU_BACKEND_NOTES.md §12: first pass warms the client).

Run ALONE on the chip (no concurrent pytest — §7 measurement traps).
Results go to stdout; paste the table into docs/TPU_BACKEND_NOTES.md.
"""
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_FRAMES = 150


def measure(G, D, B, cfg, lim, voc, maintain_every, use_boxes=True):
    from coebslam_tpu.slam.realtime import RealtimeSlam
    rt = RealtimeSlam(cfg, lim, vocabulary=voc,
                      maintain_every=maintain_every)
    for i in range(N_FRAMES):
        rt.track(G[i], D[i], stamp=i / 30.0,
                 boxes=B[i][None] if use_boxes else None)
    rt.block()
    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        rt.track(G[i], D[i], stamp=(N_FRAMES + i) / 30.0,
                 boxes=B[i][None] if use_boxes else None)
    rt.block()
    return N_FRAMES / (time.perf_counter() - t0)


def main():
    sys.path.insert(0, ROOT)
    import bench
    from coebslam_tpu.config import SystemConfig
    from coebslam_tpu.slam.realtime import RTLimits
    from coebslam_tpu.slam import vocabulary as voc_mod

    cache = os.path.join(tempfile.gettempdir(),
                         f"coebslam_bench_v3_{N_FRAMES}.npz")
    if not os.path.exists(cache):
        bench._render_frames(cache)
    z = np.load(cache)
    G, D, B = z["g"], z["d"], z["b"]
    voc = voc_mod.load(bench.VOCAB_PATH)
    cfg = SystemConfig()

    det_proc = None
    rows = []

    def run(name, **kw):
        t0 = time.perf_counter()
        fps = measure(G, D, B, cfg, kw.get("lim", RTLimits()),
                      kw.get("voc", voc), kw.get("maintain_every", 8))
        rows.append((name, fps))
        print(f"{name:48s} {fps:7.1f} fps  "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)

    # Baseline production config (bench headline, detector proc OFF here).
    run("A: production (voc, maint=8, ba_window=12)")
    run("B: no maintenance (voc=None)", voc=None)
    run("C: ba_window=8", lim=RTLimits(ba_window=8))
    run("D: maint=16", maintain_every=16)
    run("E: ba_window=8 + no maint", voc=None, lim=RTLimits(ba_window=8))

    # F: with the sibling detector process (the bench topology).
    try:
        det_proc = bench._spawn_detector_process(cache)
        run("F: production + detector sibling @3Hz")
    except Exception as e:
        print(f"detector process failed: {e!r}")
    finally:
        if det_proc is not None:
            det_proc.kill()

    print("\n| config | fps |\n|---|---|")
    for name, fps in rows:
        print(f"| {name} | {fps:.1f} |")


if __name__ == "__main__":
    main()
