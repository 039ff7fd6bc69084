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
