"""Production vocabulary artifact (artifacts/vocab_1e5.npz): structure
and place-recognition recall.

The reference ships a 10^6-leaf ORBvoc trained offline (System.cc:71-78);
this repo commits a >=10^5-leaf tree trained by tools/train_vocab.py.
Beyond structural checks, the gate here is RETRIEVAL QUALITY: querying
views of a scene against a database of nearby views must put the true
place on top — the property loop detection and relocalization depend on
(KeyFrameDatabase::DetectLoopCandidates, KeyFrameDatabase.cc:76-197).

Measured at pinning time: the 244,951-word artifact separates the true
loop candidate at L1 score 0.44 vs <=0.04 for false candidates on the
drifted circuit (tests/test_realtime_loop.py scene), where a 6,000-
descriptor toy vocabulary separates 0.53 vs ~0.43 — idf weighting at
scale is what buys the margin.
"""
import os

import numpy as np
import pytest

import jax

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "vocab_1e5.npz")


@pytest.fixture(scope="module")
def voc():
    from coebslam_tpu.slam import vocabulary as voc_mod
    assert os.path.exists(ARTIFACT), "run tools/train_vocab.py"
    return voc_mod.load(ARTIFACT)


class TestArtifactStructure:
    def test_scale(self, voc):
        assert voc.n_words >= 100_000, voc.n_words
        assert voc.branching == 10
        assert (voc.word_weight > 0).all()

    def test_tree_is_consistent(self, voc):
        # Every word id is a leaf node; children lists are parent-ordered.
        leaves = np.nonzero(voc.word_id >= 0)[0]
        assert len(leaves) == voc.n_words
        assert (voc.children[leaves] < 0).all(), "leaf with children"

    def test_descent_covers_words(self, voc):
        """Random descriptors must spread over many words (a degenerate
        tree funnels everything into a few leaves)."""
        from coebslam_tpu.slam import vocabulary as voc_mod
        rng = np.random.RandomState(0)
        descs = rng.randint(0, 256, (4000, 32)).astype(np.uint8)
        words, _ = voc_mod.transform_host(voc, descs)
        assert len(np.unique(words)) > 2000, len(np.unique(words))


class TestArtifactRecall:
    @pytest.fixture(scope="class")
    def bows(self, voc):
        """BoW vectors for two passes over the same 12 places (the second
        pass re-renders with the camera nudged ~2 cm / 1 deg)."""
        import jax.numpy as jnp
        from coebslam_tpu.config import SystemConfig
        from coebslam_tpu.geometry.se3 import SE3
        from coebslam_tpu.ops import extractor
        from coebslam_tpu.slam import vocabulary as voc_mod
        from coebslam_tpu.utils import synthetic

        cfg = SystemConfig()
        planes = synthetic.make_room(seed=2)
        poses = synthetic.camera_trajectory(12, radius=0.45)
        ex = jax.jit(lambda g: extractor.extract(g, cfg.orb))
        tf = jax.jit(lambda d, v: voc_mod.transform(voc, d, v)[2])

        def bow_of(pose):
            g = synthetic.render(cfg.camera, pose, planes, None, 0)[0]
            f = ex(g)
            return np.asarray(tf(f.desc, f.valid))

        db = [bow_of(p) for p in poses]
        nudge = SE3(jnp.asarray(np.array(
            [[0.9998, 0, 0.0175], [0, 1, 0], [-0.0175, 0, 0.9998]],
            np.float32)), jnp.asarray(np.array([0.02, 0.0, 0.01],
                                               np.float32)))
        qs = [bow_of(SE3(*map(np.asarray, (nudge.compose(p).R,
                                           nudge.compose(p).t))))
              for p in poses]
        return np.stack(db), np.stack(qs)

    def test_top1_recall(self, bows):
        db, qs = bows
        hits = 0
        for i, q in enumerate(qs):
            scores = 1.0 - 0.5 * np.abs(db - q[None]).sum(1)
            j = int(np.argmax(scores))
            hits += abs(j - i) <= 1 or abs(j - i) >= len(qs) - 1
        assert hits >= int(0.8 * len(qs)), f"top-1 recall {hits}/{len(qs)}"

    def test_score_separation(self, bows):
        """True-place score must clearly beat the median false score."""
        db, qs = bows
        margins = []
        for i, q in enumerate(qs):
            scores = 1.0 - 0.5 * np.abs(db - q[None]).sum(1)
            true_sc = scores[i]
            others = np.delete(scores, i)
            margins.append(true_sc - np.median(others))
        assert np.median(margins) > 0.1, np.median(margins)
