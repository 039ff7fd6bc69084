"""Multi-host mesh glue (parallel/multihost.py): hybrid (dcn, ici) mesh
construction and the sharded solvers running over its ICI axis — the
single-process degradation path is exactly what a pod runs per slice."""
import numpy as np
import pytest

import jax

from coebslam_tpu.parallel import multihost
from coebslam_tpu.parallel import sharded_ba
from coebslam_tpu.config import CameraConfig, OptimizerConfig


class TestHybridMesh:
    def test_single_process_shape(self):
        mesh = multihost.make_hybrid_mesh()
        assert mesh.axis_names == (multihost.DCN_AXIS, multihost.ICI_AXIS)
        assert mesh.devices.shape[0] == 1            # one process here
        assert mesh.devices.size == len(jax.devices())

    def test_explicit_dcn_size(self):
        mesh = multihost.make_hybrid_mesh(dcn_size=2)
        assert mesh.devices.shape == (2, len(jax.devices()) // 2)

    def test_initialize_is_noop_single_process(self):
        multihost.initialize()                       # must not raise

    def test_segment_assignment_is_contiguous(self):
        segs = [multihost.segment_of_keyframe(k, 4, 512)
                for k in range(512)]
        assert segs[0] == 0 and segs[-1] == 3
        assert all(b - a in (0, 1) for a, b in zip(segs, segs[1:]))

    @pytest.mark.slow
    def test_sharded_ba_on_ici_axis(self):
        """The point-sharded BA must run over the hybrid mesh's ICI axis
        (the per-slice configuration of a pod deployment)."""
        from test_local_ba import build_problem
        mesh = multihost.make_hybrid_mesh(dcn_size=2)
        prob, poses_gt, _ = build_problem(jax.random.PRNGKey(0),
                                          K=4, P=64, M=4)
        res = sharded_ba.optimize_sharded(prob, CameraConfig(),
                                          OptimizerConfig(), mesh,
                                          axis=multihost.ICI_AXIS)
        terr = np.linalg.norm(np.asarray(res.kf_t[1] - poses_gt.t[1]))
        assert terr < 0.02, terr
