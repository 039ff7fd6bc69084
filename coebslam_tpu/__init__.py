"""coebslam_tpu — a TPU-native dynamic-scene RGB-D/monocular SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of COEB-SLAM
(an ORB-SLAM2 derivative for dynamic indoor scenes; reference layout documented
in SURVEY.md).  Nothing here is a port: the compute path is batched, fixed-shape,
mask-based functional code that XLA can tile onto the MXU/VPU, and the
concurrency model is asynchronous device dispatch instead of threads+mutexes.

Sub-packages
------------
geometry   SO3/SE3/Sim3 Lie-group ops, pinhole camera model
ops        feature + vision kernels (pyramid, FAST, BRIEF, matching, LK flow,
           batched RANSAC, triangulation)
optim      robust least-squares: pose-only GN, Schur-complement BA, Sim3,
           essential-graph (pose-graph) optimization
models     in-graph detector (YOLOv5s in Flax) + deterministic fake detector
slam       host-side state machines: tracking, local mapping, loop closing,
           keyframe database, vocabulary, the System facade
parallel   device-mesh sharding for distributed bundle adjustment
io         TUM dataset loading/association, trajectory writers, checkpoints
eval       ATE / RPE metrics (Horn alignment)
utils      synthetic scene rendering, timing, metrics
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out via COEBSLAM_NO_CACHE).

    Cold start through the remote-compile relay costs minutes for the full
    pipeline (VERDICT r2: 110 s first frame); a disk cache makes every
    process after the first start warm.  Safe on CPU too.
    """
    import os

    if os.environ.get("COEBSLAM_NO_CACHE"):
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # CPU-only processes (tests, render helpers) must not share the
        # cache: XLA:CPU AOT entries bake in host machine features and can
        # SIGILL when loaded on a different host; CPU compiles are fast
        # anyway.  The cache exists for the remote-TPU compile relay.
        return
    try:
        import jax

        if (jax.config.jax_platforms or "").lower().startswith("cpu"):
            return   # set programmatically (render helpers) — same reason
        path = os.environ.get("COEBSLAM_CACHE_DIR",
                              os.path.expanduser("~/.cache/coebslam_xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache only expensive programs: through the remote relay a cache
        # WRITE costs tens of seconds regardless of size, so caching every
        # small op would slow the first run down badly.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:          # pragma: no cover — cache is best-effort
        pass


_enable_compilation_cache()


def _set_matmul_precision() -> None:
    """f32 matmuls must BE f32: this backend's default lowers them to
    single-pass bf16 on the MXU (measured 0.6% relative error), which
    quantizes point geometry to ~centimetres and diverges tracking.
    Descriptor matmuls are unaffected — they pass explicit bf16 inputs
    (ops/matching.hamming_matrix) and keep full MXU throughput."""
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", "float32")
    except Exception:          # pragma: no cover
        pass


_set_matmul_precision()
