"""Mapping backend: association, semantic filtering, triangulation, pruning
against synthetic keyframes with exact geometry."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_visual_slam_tpu.backend import ba, mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.core import lie
from dynamic_visual_slam_tpu.core.camera import Intrinsics
from dynamic_visual_slam_tpu.frontend.tracker import KeyframeBlock

CFG = SLAMConfig.preset("tum_fr3")
K = Intrinsics.from_config(CFG.camera)
C = CFG.map.max_obs_per_keyframe
N_CAT = CFG.map.max_categories
PERSON = 1  # category id used for the filtered class in tests

rng = np.random.default_rng(0)
WORLD = rng.uniform([-1.5, -1, 2.5], [1.5, 1, 5], (300, 3)).astype(np.float32)
DESCS = (rng.random((300, 256)) < 0.5).astype(np.uint8)


def make_kf(pose_t, frame_idx, ts, rvec=(0.0, 0.0, 0.0), n=300):
    q = np.asarray(lie.so3_exp(jnp.asarray(np.asarray(rvec, np.float32))))
    r = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
    t = np.asarray(pose_t, np.float32)
    xc = (WORLD[:n] - t) @ r
    uv = np.stack([np.float32(K.fx) * xc[:, 0] / xc[:, 2] + np.float32(K.cx),
                   np.float32(K.fy) * xc[:, 1] / xc[:, 2] + np.float32(K.cy)], -1)
    pad = C - n
    return KeyframeBlock(
        q_wc=jnp.asarray(q), t_wc=jnp.asarray(t),
        uv=jnp.asarray(np.pad(uv, ((0, pad), (0, 0))).astype(np.float32)),
        xyz_w=jnp.asarray(np.pad(WORLD[:n], ((0, pad), (0, 0)))),
        desc_bits=jnp.asarray(np.pad(DESCS[:n], ((0, pad), (0, 0)))),
        desc_packed=jnp.zeros((C, 32), jnp.uint8),
        response=jnp.ones(C, jnp.float32) * 60,
        mask=jnp.asarray(np.arange(C) < n),
        frame_idx=jnp.asarray(frame_idx, jnp.int32),
        timestamp=jnp.asarray(ts, jnp.float32))


NO_FILTER = jnp.zeros(N_CAT, bool)
FILTER_PERSON = jnp.zeros(N_CAT, bool).at[PERSON].set(True)
EMPTY_DET = mapping.Detections.empty(CFG.semantic.max_detections)


@pytest.fixture
def step():
    return jax.jit(lambda s, kf, det, f: mapping.insert_keyframe(CFG, s, kf, det, f))


class TestInsertion:
    def test_first_keyframe_creates_landmarks(self, step):
        state = mapping.init_map(CFG)
        state, stats = step(state, make_kf([0, 0, 0], 0, 0.0), EMPTY_DET, NO_FILTER)
        assert int(stats["n_new"]) == 300
        assert int(stats["n_matched"]) == 0
        assert int(stats["n_active"]) == 300
        assert int(state.keyframes.count) == 1

    def test_second_keyframe_associates(self, step):
        state = mapping.init_map(CFG)
        state, _ = step(state, make_kf([0, 0, 0], 0, 0.0), EMPTY_DET, NO_FILTER)
        # baseline large enough for the 5° parallax gate at ~3 m depth
        state, stats = step(state, make_kf([0.4, 0.02, 0.0], 1, 0.5,
                                           rvec=(0.0, 0.01, 0.0)),
                            EMPTY_DET, NO_FILTER)
        # same world points, same descriptors → associate, not duplicate
        assert int(stats["n_matched"]) > 250, int(stats["n_matched"])
        assert int(stats["n_new"]) < 50
        assert int(stats["n_triangulated"]) > 200
        # landmark positions stay near ground truth after triangulation
        lm = state.landmarks
        act = np.asarray(lm.active)
        err = np.linalg.norm(np.asarray(lm.xyz)[act][:300]
                             - WORLD[:len(np.asarray(lm.xyz)[act][:300])], axis=1)
        assert np.median(err) < 0.02

    def test_anchor_descriptor_recovers_drifted_landmarks(self, step):
        """Association matches against the creation-time anchor descriptor as
        well as the newest one (min Hamming of the two — the bounded stand-in
        for the reference's 1-vs-all-observations matching,
        backend.cpp:1064-1120): a landmark whose newest descriptor has
        drifted past the Hamming gate is still recovered by its anchor."""
        state = mapping.init_map(CFG)
        kf = make_kf([0, 0, 0], 0, 0.0)
        state, _ = step(state, kf, EMPTY_DET, NO_FILTER)
        lm = state.landmarks
        # simulate appearance drift: newest descriptor becomes the complement
        lm_drift = lm._replace(desc_bits=(1 - lm.desc_bits).astype(jnp.uint8))
        obs_cat = jnp.zeros(C, jnp.int32)
        _, matched = mapping.associate(CFG, K, lm_drift, kf, obs_cat, kf.mask)
        assert int(matched.sum()) > 250       # anchor carries the match
        # without the anchor the complement is 256 bits away -> no matches
        lm_broken = lm_drift._replace(
            desc_anchor=(1 - lm.desc_anchor).astype(jnp.uint8))
        _, matched2 = mapping.associate(CFG, K, lm_broken, kf, obs_cat, kf.mask)
        assert not bool(matched2.any())

    def test_matched_update_keeps_anchor_overwrites_newest(self, step):
        """A matched observation refreshes desc_bits but never desc_anchor."""
        state = mapping.init_map(CFG)
        state, _ = step(state, make_kf([0, 0, 0], 0, 0.0), EMPTY_DET, NO_FILTER)
        anchor_before = np.asarray(state.landmarks.desc_anchor).copy()
        # second view: same points, descriptors perturbed within the gate
        kf2 = make_kf([0.4, 0.02, 0.0], 1, 0.5, rvec=(0.0, 0.01, 0.0))
        flip = np.zeros((C, 256), np.uint8)
        flip[:, :10] = 1                      # 10-bit drift < max_hamming
        kf2 = kf2._replace(desc_bits=jnp.asarray(
            np.asarray(kf2.desc_bits) ^ flip))
        state, stats = step(state, kf2, EMPTY_DET, NO_FILTER)
        assert int(stats["n_matched"]) > 250
        np.testing.assert_array_equal(
            np.asarray(state.landmarks.desc_anchor), anchor_before)
        # newest descriptors did move for matched slots
        assert np.any(np.asarray(state.landmarks.desc_bits) != anchor_before)

    def test_unassociated_sentinel_is_minus_one_semantics(self, step):
        """Association returns a matched mask, never a magic 0 id
        (reference quirk 4, SURVEY.md §7)."""
        state = mapping.init_map(CFG)
        kf = make_kf([0, 0, 0], 0, 0.0)
        obs_cat = jnp.zeros(C, jnp.int32)
        idx, matched = mapping.associate(CFG, K, state.landmarks, kf,
                                         obs_cat, kf.mask)
        assert not bool(matched.any())   # empty map → nothing matched


class TestSemantic:
    def test_categorize_first_box_wins(self):
        det = mapping.Detections(
            boxes=jnp.asarray([[0, 0, 100, 100], [50, 50, 200, 200]] +
                              [[0, 0, 0, 0]] * 30, jnp.float32),
            category=jnp.asarray([3, 4] + [0] * 30, jnp.int32),
            score=jnp.ones(32), mask=jnp.asarray([True, True] + [False] * 30))
        uv = jnp.asarray([[60.0, 60.0], [150.0, 150.0], [300.0, 300.0]])
        cat = mapping.categorize(uv, det)
        assert list(np.asarray(cat)) == [3, 4, mapping.UNLABELED]

    def test_person_observations_filtered(self, step):
        state = mapping.init_map(CFG)
        # person bbox covering left half of the image
        det = mapping.Detections(
            boxes=jnp.asarray([[0, 0, float(K.cx), 480]] + [[0] * 4] * 31,
                              jnp.float32),
            category=jnp.asarray([PERSON] + [0] * 31, jnp.int32),
            score=jnp.ones(32), mask=jnp.asarray([True] + [False] * 31))
        kf = make_kf([0, 0, 0], 0, 0.0)
        in_left = np.asarray(kf.uv)[:, 0] < float(K.cx)
        n_left = int((in_left & np.asarray(kf.mask)).sum())
        state, stats = step(state, kf, det, FILTER_PERSON)
        assert int(stats["n_obs_kept"]) == 300 - n_left
        assert int(stats["n_new"]) == 300 - n_left

    def test_categories_partition_association(self, step):
        """Same pixel/descriptor but different category must NOT associate
        (category-keyed landmark DB, backend.cpp:620)."""
        state = mapping.init_map(CFG)
        det1 = mapping.Detections(
            boxes=jnp.asarray([[0, 0, 640, 480]] + [[0] * 4] * 31, jnp.float32),
            category=jnp.asarray([5] + [0] * 31, jnp.int32),
            score=jnp.ones(32), mask=jnp.asarray([True] + [False] * 31))
        state, s1 = step(state, make_kf([0, 0, 0], 0, 0.0), det1, NO_FILTER)
        # second frame: no detections → everything unlabeled → no matches
        state, s2 = step(state, make_kf([0.05, 0, 0], 1, 0.5), EMPTY_DET,
                         NO_FILTER)
        assert int(s2["n_matched"]) == 0
        assert int(s2["n_new"]) == 300


class TestPruning:
    def test_stale_single_obs_landmarks_pruned(self, step):
        state = mapping.init_map(CFG)
        state, _ = step(state, make_kf([0, 0, 0], 0, 0.0), EMPTY_DET, NO_FILTER)
        lm = mapping.prune(CFG, state.landmarks, jnp.asarray(30.0))
        assert int(lm.active.sum()) == 0       # 1 obs, 30 s old → all gone
        lm2 = mapping.prune(CFG, state.landmarks, jnp.asarray(10.0))
        assert int(lm2.active.sum()) == 300    # too young to prune

    def test_pruned_slots_reused(self, step):
        state = mapping.init_map(CFG)
        state, _ = step(state, make_kf([0, 0, 0], 0, 0.0), EMPTY_DET, NO_FILTER)
        state = state._replace(
            landmarks=mapping.prune(CFG, state.landmarks, jnp.asarray(30.0)))
        state, stats = step(state, make_kf([0, 0, 0], 1, 31.0), EMPTY_DET,
                            NO_FILTER)
        assert int(stats["n_new"]) == 300
        assert int(stats["n_active"]) == 300   # reused, not leaked


class TestBAIntegration:
    def test_window_roundtrip(self, step):
        """Insert keyframes, run BA, poses stay near their (exact) inputs."""
        state = mapping.init_map(CFG)
        poses = [[0, 0, 0], [0.08, 0, 0], [0.16, 0.02, 0], [0.2, 0.05, -0.03]]
        for i, p in enumerate(poses):
            state, _ = step(state, make_kf(p, i, 0.5 * i), EMPTY_DET, NO_FILTER)
        run = jax.jit(lambda s: ba.run_ba(CFG, K, s))
        state2, res = run(state)
        assert float(res.final_cost) <= float(res.initial_cost)
        assert int(res.n_residuals) > 600
        t_after = np.asarray(state2.keyframes.t[:4])
        assert np.linalg.norm(t_after - np.asarray(poses, np.float32),
                              axis=1).max() < 0.01


class TestKeyframeRingWrap:
    def test_stale_observations_masked_after_wrap(self, step):
        """After the keyframe ring recycles a slot, observations recorded
        against the OLD keyframe in that slot must not be treated as
        observations from the NEW keyframe (code-review finding: obs_kf now
        stores monotone sequence ids)."""
        import dataclasses
        from dynamic_visual_slam_tpu.backend import ba as ba_mod
        from dynamic_visual_slam_tpu.config import MapConfig
        small = CFG.replace(map=dataclasses.replace(CFG.map, max_keyframes=4))
        sstep = jax.jit(lambda s, kf, det, f: mapping.insert_keyframe(
            small, s, kf, det, f))
        state = mapping.init_map(small)
        # 7 keyframes through a 4-slot ring → slots 0..2 recycled
        for i in range(7):
            state, _ = sstep(state, make_kf([0.05 * i, 0, 0], i, 0.1 * i),
                             EMPTY_DET, NO_FILTER)
        lm = state.landmarks
        kdb = state.keyframes
        assert int(kdb.next_slot) == 7
        # monotone ids recorded (some obs reference evicted keyframes 0..2)
        kf_ids = np.asarray(lm.obs_kf)[np.asarray(lm.obs_valid)]
        assert kf_ids.max() == 6
        assert (kf_ids < 3).any()          # stale refs exist in the rings...
        # ...but the BA window only matches live ids
        problem, _, _ = ba_mod.extract_window(small, state, max_landmarks=64)
        assert bool(problem.valid.any())
        # and triangulation's live mask excludes them: recompute valid as the
        # kernel does and check no excluded id sneaks in
        live = np.asarray(lm.obs_kf) >= int(kdb.next_slot) - 4
        used = np.asarray(lm.obs_valid) & live
        assert (np.asarray(lm.obs_kf)[used] >= 3).all()
