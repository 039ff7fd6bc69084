"""Native runtime kernels vs their numpy fallbacks."""
import numpy as np
import pytest

from coebslam_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("no native toolchain available")
    return True


class TestNative:
    def test_distinctive_descriptors(self, built):
        rng = np.random.RandomState(0)
        K, N = 6, 64
        kf_desc = rng.randint(0, 256, (K, N, 32), dtype=np.uint8)
        n_pts, max_obs = 10, 8
        okf = np.full((n_pts, max_obs), -1, np.int32)
        oslot = np.full((n_pts, max_obs), -1, np.int32)
        for p in range(n_pts):
            m = rng.randint(1, max_obs)
            okf[p, :m] = rng.randint(0, K, m)
            oslot[p, :m] = rng.randint(0, N, m)
        desc, bkf, bslot = native.distinctive_descriptors(kf_desc, okf, oslot)

        # Numpy oracle.
        for p in range(n_pts):
            s = okf[p] >= 0
            descs = kf_desc[okf[p][s], oslot[p][s]]
            bits = np.unpackbits(descs, axis=1)
            ham = (bits[:, None, :] != bits[None, :, :]).sum(-1)
            ham.sort(axis=1)
            med = ham[:, ham.shape[1] // 2]
            best = int(np.argmin(med))
            np.testing.assert_array_equal(desc[p], descs[best])

    def test_covisibility_row(self, built):
        rng = np.random.RandomState(1)
        K, N, P = 5, 32, 100
        kf_obs = rng.randint(-1, P, (K, N)).astype(np.int32)
        counts = native.covisibility_row(kf_obs, 2, K, P)
        mask = np.zeros(P, bool)
        own = kf_obs[2][kf_obs[2] >= 0]
        mask[own] = True
        for k in range(K):
            if k == 2:
                assert counts[k] == 0
                continue
            row = kf_obs[k]
            expect = int((mask[np.clip(row, 0, None)] & (row >= 0)).sum())
            assert counts[k] == expect, k

    def test_fill_ba_obs_table(self, built):
        rng = np.random.RandomState(2)
        K, N = 4, 16
        kf_uv = rng.rand(K, N, 2).astype(np.float32) * 100
        kf_ur = rng.rand(K, N).astype(np.float32) * 100
        kf_level = rng.randint(0, 4, (K, N)).astype(np.int32)
        n_pts, max_obs, M = 6, 6, 4
        okf = rng.randint(-1, K, (n_pts, max_obs)).astype(np.int32)
        oslot = rng.randint(0, N, (n_pts, max_obs)).astype(np.int32)
        kf_index_map = np.asarray([0, -1, 1, 2], np.int32)   # KF1 excluded
        sf2 = 1.44
        obs_kf, obs_uvr, obs_w, obs_valid = native.fill_ba_obs_table(
            okf, oslot, kf_index_map, kf_uv, kf_ur, kf_level, sf2, M)
        for p in range(n_pts):
            m = 0
            for c in range(max_obs):
                kf = okf[p, c]
                if kf < 0 or kf_index_map[kf] < 0 or m >= M:
                    continue
                s = oslot[p, c]
                assert obs_kf[p, m] == kf_index_map[kf]
                np.testing.assert_allclose(obs_uvr[p, m, :2], kf_uv[kf, s])
                np.testing.assert_allclose(obs_uvr[p, m, 2], kf_ur[kf, s])
                np.testing.assert_allclose(obs_w[p, m],
                                           1.0 / sf2 ** kf_level[kf, s],
                                           rtol=1e-5)
                assert obs_valid[p, m]
                m += 1
            assert not obs_valid[p, m:].any()
