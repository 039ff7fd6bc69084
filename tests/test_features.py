"""Feature-kernel tests vs OpenCV oracles on synthetic images
(SURVEY §7.2 step 2: 'Test vs OpenCV on TUM frames' — no dataset in this
environment, so oracle parity is checked on synthetic textured images)."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from coebslam_tpu.config import OrbConfig
from coebslam_tpu.ops import pyramid, fast, grid_select, patches, brief, matching, extractor


def checker_texture(h=120, w=160, seed=0):
    """Random blobby texture with corners — enough structure for FAST."""
    rng = np.random.RandomState(seed)
    img = rng.rand(h // 8, w // 8) * 255
    img = cv2.resize(img.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


class TestPyramidBlur:
    def test_resize_matches_cv2(self):
        img = checker_texture()
        out = np.asarray(pyramid.resize_bilinear(jnp.asarray(img), (100, 133)))
        ref = cv2.resize(img, (133, 100), interpolation=cv2.INTER_LINEAR)
        # Same half-pixel convention; small interpolation differences allowed.
        assert np.median(np.abs(out - ref)) < 2.0

    def test_gaussian_blur_matches_cv2(self):
        img = checker_texture(seed=1)
        out = np.asarray(pyramid.gaussian_blur(jnp.asarray(img)))
        ref = cv2.GaussianBlur(img, (7, 7), 2.0)
        interior = (slice(4, -4), slice(4, -4))
        np.testing.assert_allclose(out[interior], ref[interior], atol=0.5)

    def test_pyramid_shapes(self):
        cfg = OrbConfig()
        shapes = pyramid.pyramid_shapes(480, 640, cfg.n_levels, cfg.scale_factor)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8
        assert shapes[-1][0] < 140


class TestFAST:
    def test_detection_matches_cv2(self):
        """Corner sets at the same threshold should agree with OpenCV FAST
        (no NMS) away from borders."""
        img = checker_texture(seed=2)
        t = 20
        score = np.asarray(fast.fast_score_map(jnp.asarray(img), float(t)))
        ours = set(zip(*np.nonzero(score > 0)))

        det = cv2.FastFeatureDetector_create(
            threshold=t, nonmaxSuppression=False,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        kps = det.detect(img.astype(np.uint8))
        theirs = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}
        theirs = {(y, x) for (y, x) in theirs
                  if 3 <= y < img.shape[0] - 3 and 3 <= x < img.shape[1] - 3}

        if len(theirs) == 0:
            pytest.skip("oracle found no corners on this texture")
        # Allow small disagreement from uint8 rounding (we run float32).
        inter = len(ours & theirs)
        assert inter / max(len(theirs), 1) > 0.9, (len(ours), len(theirs), inter)
        assert inter / max(len(ours), 1) > 0.9

    def test_score_is_max_threshold(self):
        """Score semantics: a pixel with score s must be detected at
        threshold s - 1 and not at s + 1."""
        img = checker_texture(seed=3)
        score = np.asarray(fast.fast_score_map(jnp.asarray(img), 10.0))
        ys, xs = np.nonzero(score > 0)
        if len(ys) == 0:
            pytest.skip("no corners")
        i = np.argmax(score[ys, xs])
        y, x, s = ys[i], xs[i], score[ys, xs][i]
        hi = np.asarray(fast.fast_score_map(jnp.asarray(img), float(s + 1)))
        lo = np.asarray(fast.fast_score_map(jnp.asarray(img), float(s - 1)))
        assert hi[y, x] == 0.0
        assert lo[y, x] > 0.0

    def test_nms_keeps_local_maxima(self):
        score = jnp.zeros((32, 32)).at[10, 10].set(50.0).at[10, 11].set(40.0)
        out = np.asarray(fast.nms_3x3(score))
        assert out[10, 10] == 50.0
        assert out[10, 11] == 0.0


class TestGridSelect:
    def test_spatial_spread(self):
        """Round-robin rank: every occupied cell contributes before any cell
        contributes twice."""
        score = np.zeros((64, 64), np.float32)
        # Cell (0,0): 3 strong corners; cell (1,1): one weak corner.
        score[5, 5], score[6, 8], score[7, 12] = 100.0, 90.0, 80.0
        score[40, 40] = 5.0
        yx, sc, valid = grid_select.select_grid_topk(
            jnp.asarray(score), cell_size=32, k_per_cell=4, n_out=2)
        got = {tuple(p) for p in np.asarray(yx)[np.asarray(valid)]}
        assert (5, 5) in got
        assert (40, 40) in got      # weak cell admitted before strong cell's 2nd

    def test_fixed_output_shape(self):
        score = jnp.zeros((64, 64))
        yx, sc, valid = grid_select.select_grid_topk(score, 32, 4, 10)
        assert yx.shape == (10, 2) and not bool(valid.any())


class TestBRIEF:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.RandomState(0)
        bits = jnp.asarray(rng.randint(0, 2, (16, 256)), dtype=jnp.uint8)
        packed = brief.pack_bits(bits)
        assert packed.shape == (16, 32) and packed.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(brief.unpack_bits(packed)),
                                      np.asarray(bits))

    def test_descriptor_determinism_and_variation(self):
        img = checker_texture(seed=4)
        yx = jnp.asarray([[30, 40], [60, 80], [30, 40]], dtype=jnp.int32)
        pt = patches.gather_patches(jnp.asarray(img), yx)
        ang = patches.orientations(pt)
        bits = brief.describe(pt, ang)
        b = np.asarray(bits)
        np.testing.assert_array_equal(b[0], b[2])       # same point -> same desc
        assert (b[0] != b[1]).sum() > 30                # different points differ

    def test_rotation_steering(self):
        """Rotating the image should rotate orientation and keep the steered
        descriptor similar (the whole point of steered BRIEF)."""
        img = checker_texture(h=128, w=128, seed=5)
        center = (64, 64)
        M = cv2.getRotationMatrix2D((center[1], center[0]), 30.0, 1.0)
        rot = cv2.warpAffine(img, M, (128, 128), flags=cv2.INTER_LINEAR)

        yx = jnp.asarray([[64, 64]], dtype=jnp.int32)
        p1 = patches.gather_patches(jnp.asarray(img), yx)
        p2 = patches.gather_patches(jnp.asarray(rot), yx)
        a1 = patches.orientations(p1)
        a2 = patches.orientations(p2)
        d1 = brief.describe(p1, a1)
        d2 = brief.describe(p2, a2)
        ham = int((np.asarray(d1) != np.asarray(d2)).sum())
        # Random pairs average 128; steered descriptors of the same point
        # under 30 deg rotation should be far closer.
        assert ham < 80, ham

    def test_orientation_rotates_with_image(self):
        img = checker_texture(h=128, w=128, seed=6)
        M = cv2.getRotationMatrix2D((64.0, 64.0), 45.0, 1.0)
        rot = cv2.warpAffine(img, M, (128, 128))
        yx = jnp.asarray([[64, 64]], dtype=jnp.int32)
        a1 = float(patches.orientations(patches.gather_patches(jnp.asarray(img), yx))[0])
        a2 = float(patches.orientations(patches.gather_patches(jnp.asarray(rot), yx))[0])
        diff = (a1 - a2 - np.deg2rad(45.0) + np.pi) % (2 * np.pi) - np.pi
        # warpAffine rotates content by -45deg in image coords for angle=45
        diff_alt = (a1 - a2 + np.deg2rad(45.0) + np.pi) % (2 * np.pi) - np.pi
        assert min(abs(diff), abs(diff_alt)) < np.deg2rad(15.0)


class TestMatching:
    def test_hamming_matrix_exact(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 2, (8, 256)).astype(np.uint8)
        b = rng.randint(0, 2, (12, 256)).astype(np.uint8)
        d = np.asarray(matching.hamming_matrix(
            brief.to_signed(jnp.asarray(a)), brief.to_signed(jnp.asarray(b))))
        ref = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d.astype(np.int32), ref)

    def test_match_ratio_and_mutual(self):
        # Row 0 matches col 1 exactly; row 1 is ambiguous (cols 0 and 2 equal).
        d = jnp.asarray([[50.0, 0.0, 60.0],
                         [30.0, 70.0, 30.0]])
        res = matching.match(d, max_distance=50, ratio=0.8)
        assert int(res.idx[0]) == 1 and bool(res.valid[0])
        assert not bool(res.valid[1])        # fails ratio test

    def test_window_penalty(self):
        q = jnp.asarray([[10.0, 10.0]])
        t = jnp.asarray([[12.0, 11.0], [30.0, 30.0]])
        p = np.asarray(matching.window_penalty(q, t, 5.0))
        assert p[0, 0] == 0.0 and p[0, 1] >= matching.BIG


class TestExtractor:
    def test_end_to_end_extraction(self):
        cfg = OrbConfig(max_keypoints=512, n_levels=4)
        img = jnp.asarray(checker_texture(h=240, w=320, seed=7))
        feats = extractor.extract(img, cfg)
        n_valid = int(feats.valid.sum())
        assert n_valid > 50, n_valid
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 320).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 240).all()
        # Multiple levels populated.
        lv = np.asarray(feats.level)[np.asarray(feats.valid)]
        assert len(np.unique(lv)) >= 2

    def test_budget_masking(self):
        cfg = OrbConfig(max_keypoints=512, n_levels=4)
        img = jnp.asarray(checker_texture(h=240, w=320, seed=7))
        f_full = extractor.extract(img, cfg, n_features=jnp.int32(400))
        f_half = extractor.extract(img, cfg, n_features=jnp.int32(100))
        assert int(f_half.valid.sum()) < int(f_full.valid.sum())

    def test_dynamic_mask_culls(self):
        cfg = OrbConfig(max_keypoints=512, n_levels=4)
        img = jnp.asarray(checker_texture(h=240, w=320, seed=7))
        mask = jnp.zeros((240, 320), bool).at[:, :160].set(True)
        f = extractor.extract(img, cfg, dynamic_mask=mask)
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        # Post-cull mode: no keypoints in the masked half (left).
        assert (uv[:, 0] >= 155).all()

    def test_area_mode_refills_budget(self):
        cfg = OrbConfig(max_keypoints=512, n_levels=4)
        img = jnp.asarray(checker_texture(h=240, w=320, seed=7))
        mask = jnp.zeros((240, 320), bool).at[:, :160].set(True)
        f_post = extractor.extract(img, cfg, dynamic_mask=mask,
                                   area_mode=jnp.bool_(False))
        f_pre = extractor.extract(img, cfg, dynamic_mask=mask,
                                  area_mode=jnp.bool_(True))
        # Pre-cull (area) mode re-allocates budget into the static half, but
        # with raised thresholds; both must exclude the masked region.
        uv = np.asarray(f_pre.uv)[np.asarray(f_pre.valid)]
        assert (uv[:, 0] >= 155).all()
        assert int(f_pre.valid.sum()) > 0


class TestFastPallas:
    """The fused Pallas FAST kernel must match the jnp reference path
    bit-for-bit (it is the TPU hot path; jnp is the CPU fallback/oracle)."""

    def test_fast_pallas_matches_jnp(self):
        from coebslam_tpu.ops import fast, fast_pallas
        rng = np.random.RandomState(3)
        img = jnp.asarray((rng.rand(123, 161) * 255).astype(np.float32))
        st_p, sc_p = fast_pallas.strength_and_score(img, 20.0,
                                                    interpret=True)
        st_j = fast.strength_map(img)
        sc_j = fast.nms_3x3(fast.fast_score_map(img, 20.0))
        # Score maps identical everywhere; strength identical in the
        # interior (borders differ by padding mode and are gated off).
        np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_j))
        np.testing.assert_allclose(np.asarray(st_p)[4:-4, 4:-4],
                                   np.asarray(st_j)[4:-4, 4:-4], atol=1e-5)

    def test_extractor_pallas_path_matches(self):
        from coebslam_tpu.config import OrbConfig
        cfg_j = OrbConfig(max_keypoints=256, n_levels=2,
                          use_pallas_fast=False)
        cfg_p = OrbConfig(max_keypoints=256, n_levels=2,
                          use_pallas_fast=True)
        img = jnp.asarray(checker_texture(h=120, w=160, seed=5))
        f_j = extractor.extract(img, cfg_j)
        f_p = extractor.extract(img, cfg_p)
        np.testing.assert_array_equal(np.asarray(f_j.valid),
                                      np.asarray(f_p.valid))
        np.testing.assert_allclose(np.asarray(f_j.uv), np.asarray(f_p.uv),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(f_j.desc),
                                      np.asarray(f_p.desc))
