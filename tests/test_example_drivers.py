"""Example-driver glue tests: run_stereo.py / run_mono.py against tiny
on-disk KITTI / EuRoC layouts (the reference ships runnable mains for each
dataset — Examples/Monocular/mono_kitti.cc, mono_euroc.cc, stereo targets
CMakeLists.txt:96-104; untested glue rots)."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (fast tier: -m 'not slow')

from coebslam_tpu.config import CameraConfig, OrbConfig, SystemConfig
from coebslam_tpu.geometry.se3 import SE3
from coebslam_tpu.utils import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 6


def _save_png(path, gray):
    from PIL import Image
    Image.fromarray(np.clip(np.asarray(gray), 0, 255).astype(np.uint8),
                    mode="L").save(path)


@pytest.fixture(scope="module")
def stereo_frames():
    cfg = SystemConfig()
    planes = synthetic.make_room(seed=0)
    poses = synthetic.camera_trajectory(30, radius=0.35)[:N_FRAMES]
    render = jax.jit(lambda p: synthetic.render(cfg.camera, p, planes)[0])
    b = cfg.camera.baseline
    out = []
    for p in poses:
        gl = render(p)
        t_r = np.asarray(p.t) - np.asarray([b, 0.0, 0.0], np.float32)
        gr = render(SE3(p.R, jnp.asarray(t_r)))
        out.append((gl, gr))
    return out


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)


class TestKittiStereoDriver:
    def test_runs_and_exports(self, stereo_frames, tmp_path):
        root = tmp_path / "seq00"
        (root / "image_0").mkdir(parents=True)
        (root / "image_1").mkdir()
        with open(root / "times.txt", "w") as f:
            for i, (gl, gr) in enumerate(stereo_frames):
                f.write(f"{i/10.0:.6f}\n")
                _save_png(root / "image_0" / f"{i:06d}.png", gl)
                _save_png(root / "image_1" / f"{i:06d}.png", gr)
        out = tmp_path / "out"
        r = _run(["examples/run_stereo.py", "kitti", str(root), "--cpu",
                  "--out", str(out)])
        assert r.returncode == 0, r.stdout + r.stderr
        assert "OK" in r.stdout, r.stdout
        for name in ("CameraTrajectoryKITTI.txt", "CameraTrajectory.txt",
                     "KeyFrameTrajectory.txt"):
            path = out / name
            assert path.exists(), (name, r.stdout)
        # KITTI format: 12 floats per line, one line per frame.
        rows = np.loadtxt(out / "CameraTrajectoryKITTI.txt")
        assert rows.reshape(-1, 12).shape[0] == N_FRAMES


class TestEurocMonoDriver:
    def test_runs_and_exports(self, stereo_frames, tmp_path):
        cam0 = tmp_path / "mav0" / "cam0" / "data"
        cam0.mkdir(parents=True)
        ns = [int(1.4e18) + i * 100_000_000 for i in range(N_FRAMES)]
        with open(tmp_path / "mav0" / "cam0" / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for s, (gl, _) in zip(ns, stereo_frames):
                f.write(f"{s},{s}.png\n")
                _save_png(cam0 / f"{s}.png", gl)
        out = tmp_path / "out"
        r = _run(["examples/run_mono.py", "euroc", str(tmp_path), "--cpu",
                  "--out", str(out)])
        # Mono may not initialize in 6 low-parallax frames — the glue test
        # asserts the driver runs the loader + pipeline + export cleanly.
        assert r.returncode == 0, r.stdout + r.stderr
        assert (out / "CameraTrajectory.txt").exists()
