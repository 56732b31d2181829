"""BoW place recognition — mirrors the reference's DBoW2 integration test
surface (test_dbow2_integration.cpp): vocabulary training, descriptor
transform, database add/query with self-match, plus recognition quality on
synthetic 'places'."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.place import bow


def rand_descs(rng, n):
    return (rng.random((n, 256)) < 0.5).astype(np.uint8)


def perturb(descs, rng, flip=0.05):
    noise = (rng.random(descs.shape) < flip).astype(np.uint8)
    return descs ^ noise


@pytest.fixture(scope="module")
def world():
    """5 'places', each a set of 60 descriptors; vocabulary trained on all."""
    rng = np.random.default_rng(0)
    places = [rand_descs(rng, 60) for _ in range(5)]
    voc = bow.train_vocabulary(np.concatenate(places), k=5, depth=3, seed=1)
    return places, voc, rng


class TestVocabulary:
    def test_tiny_create(self):
        """create(features, k=2, L=1) smoke — reference test case
        (test_dbow2_integration.cpp:137-163)."""
        rng = np.random.default_rng(2)
        voc = bow.train_vocabulary(rand_descs(rng, 40), k=2, depth=1)
        assert voc.n_words == 2
        assert voc.levels[0].shape == (2, 256)

    def test_transform_normalized(self, world):
        places, voc, rng = world
        v = voc.transform(jnp.asarray(places[0]), jnp.ones(60, bool))
        assert abs(float(jnp.sum(v)) - 1.0) < 1e-5
        assert float(jnp.min(v)) >= 0

    def test_same_descriptor_same_word(self, world):
        places, voc, _ = world
        d = jnp.asarray(places[0][:8])
        w1 = bow.descend(voc, d)
        w2 = bow.descend(voc, d)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        assert (np.asarray(w1) < voc.n_words).all()


class TestDatabase:
    def test_self_query_top1(self, world):
        """database.add then query itself → own entry, top score
        (test_dbow2_integration.cpp:103-125)."""
        places, voc, _ = world
        db = bow.Database(voc, capacity=16)
        ids = [db.add(jnp.asarray(p)) for p in places]
        res = db.query(jnp.asarray(places[2]))
        assert int(res.entry_ids[0]) == ids[2]
        assert float(res.scores[0]) > 0.99     # exact self-match, L1 score ≈ 1

    def test_noisy_revisit_recognized(self, world):
        places, voc, rng = world
        db = bow.Database(voc, capacity=16)
        for p in places:
            db.add(jnp.asarray(p))
        noisy = perturb(places[3], rng, flip=0.04)
        res = db.query(jnp.asarray(noisy))
        assert int(res.entry_ids[0]) == 3
        # and clearly above the best wrong place
        assert float(res.scores[0]) > float(res.scores[1]) + 0.05

    def test_query_empty_database(self, world):
        _, voc, _ = world
        db = bow.Database(voc, capacity=8)
        rng = np.random.default_rng(5)
        res = db.query(jnp.asarray(rand_descs(rng, 10)))
        assert not bool(res.valid.any())

    def test_l1_score_bounds(self, world):
        places, voc, _ = world
        v1 = voc.transform(jnp.asarray(places[0]), jnp.ones(60, bool))
        v2 = voc.transform(jnp.asarray(places[1]), jnp.ones(60, bool))
        s = float(bow.l1_score(v1, v2))
        assert 0.0 <= s <= 1.0
        assert float(bow.l1_score(v1, v1)) > 0.999


class TestPretrainedVocabulary:
    def test_save_load_roundtrip(self, world, tmp_path):
        """save_vocabulary/load_vocabulary (the ORBvoc.txt-equivalent asset
        format): identical descent and weights after a disk roundtrip."""
        places, voc, _ = world
        path = str(tmp_path / "voc.npz")
        bow.save_vocabulary(voc, path)
        voc2 = bow.load_vocabulary(path)
        assert (voc2.k, voc2.depth, voc2.n_words) == \
            (voc.k, voc.depth, voc.n_words)
        rng = np.random.default_rng(11)
        q = jnp.asarray(rand_descs(rng, 40))
        np.testing.assert_array_equal(np.asarray(bow.descend(voc, q)),
                                      np.asarray(bow.descend(voc2, q)))
        np.testing.assert_allclose(np.asarray(voc.word_weights),
                                   np.asarray(voc2.word_weights), rtol=1e-6)

    def test_slam_system_loads_vocab_at_startup(self, world, tmp_path):
        """SLAMSystem(vocab_path=...) has a live BoW database before any
        keyframe — the pretrained deployment mode (no online training)."""
        from dynamic_visual_slam_tpu.config import CameraConfig, SLAMConfig
        from dynamic_visual_slam_tpu.pipeline.slam import SLAMSystem
        _, voc, _ = world
        path = str(tmp_path / "voc.npz")
        bow.save_vocabulary(voc, path)
        cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                           cx=79.5, cy=59.5)
        slam = SLAMSystem(SLAMConfig().replace(camera=cam), vocab_path=path)
        assert slam._bow_db is not None
        assert slam._bow_db.vocabulary.n_words == voc.n_words

    def test_shipped_vocabulary_asset(self):
        """The checked-in pretrained vocabulary (assets/orbvoc_synth.npz,
        cli train-vocab output — the reference's installed ORBvoc.txt
        equivalent) loads and discriminates: self-query wins with a clear
        margin over a different descriptor set."""
        import os
        path = os.path.join(os.path.dirname(__file__), "..",
                            "assets", "orbvoc_synth.npz")
        voc = bow.load_vocabulary(path)
        assert voc.n_words >= 1000
        rng = np.random.default_rng(3)
        a, b = rand_descs(rng, 80), rand_descs(rng, 80)
        db = bow.Database(voc, capacity=8)
        ia, ib = db.add(jnp.asarray(a)), db.add(jnp.asarray(b))
        res = db.query(jnp.asarray(perturb(a, rng, 0.02)), top_k=2)
        assert int(res.entry_ids[0]) == ia
        assert float(res.scores[0]) > float(res.scores[1]) + 0.1
