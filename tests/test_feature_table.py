"""Unit tests for the fixed-grid feature bank — mirrors FeatureManager
semantics (src/frontend/feature_manager.cpp): add/parallax, triangulation,
slides with depth re-anchoring, failure removal."""

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.frontend import feature_table as ft
from mobile_slam_tpu.models.state import eligible_mask, init_feature_table
from mobile_slam_tpu.utils import rotations as rot

F = 32
W = ft.W


import jax

K_PAD = 32  # fixed K so the jitted add compiles once for the whole module
_add_jit = jax.jit(ft.add_and_check_parallax)


def add(table, ids, rays_xy, fc, min_par=10.0 / 460.0, valid=None):
    ids = np.asarray(ids, np.int32)
    k = len(ids)
    obs = np.concatenate([np.asarray(rays_xy, float).reshape(k, 2),
                          np.ones((k, 1))], axis=1)
    valid = np.ones(k, bool) if valid is None else np.asarray(valid, bool)
    ids_p = np.full(K_PAD, -1, np.int32)
    ids_p[:k] = ids
    obs_p = np.zeros((K_PAD, 3))
    obs_p[:k] = obs
    valid_p = np.zeros(K_PAD, bool)
    valid_p[:k] = valid
    return _add_jit(
        table, jnp.asarray(ids_p), jnp.asarray(obs_p), jnp.zeros((K_PAD, 2)),
        jnp.zeros((K_PAD, 2)), jnp.asarray(valid_p), jnp.asarray(fc, jnp.int32),
        jnp.asarray(min_par),
    )


class TestAddAndParallax:
    def test_new_and_tracked(self):
        t = init_feature_table(F, jnp.float64)
        r = add(t, [7, 9, 11], [[0, 0], [0.1, 0], [0.2, 0]], 0)
        assert bool(r.is_keyframe)          # frame_count < 2 -> keyframe
        assert int(r.last_track_num) == 0
        t = r.table
        assert int((t.fid >= 0).sum()) == 3

        r2 = add(t, [9, 11, 13], [[0.1, 0], [0.2, 0], [0.3, 0]], 1)
        t2 = r2.table
        assert int(r2.last_track_num) == 2
        assert int((t2.fid >= 0).sum()) == 4
        # Tracked feature 9 has obs at frames 0 and 1.
        slot = int(np.argmax(np.asarray(t2.fid) == 9))
        assert np.asarray(t2.mask)[slot, :2].all()
        assert int(np.asarray(t2.start)[slot]) == 0

    def test_parallax_keyframe_decision(self):
        # >= 20 tracked features so the last_track_num shortcut doesn't fire.
        t = init_feature_table(F, jnp.float64)
        ids = list(range(25))
        xy0 = [[0.01 * i, 0.0] for i in range(25)]
        t = add(t, ids, xy0, 0).table
        t = add(t, ids, xy0, 1).table
        # No motion between the 2nd/3rd-last frames -> not a keyframe.
        r = add(t, ids, xy0, 2)
        assert not bool(r.is_keyframe)
        # Large parallax at frame 2... parallax measured between frames 0 & 1,
        # so move features at frame 1 instead.
        t = init_feature_table(F, jnp.float64)
        t = add(t, ids, xy0, 0).table
        xy1 = [[0.01 * i + 0.1, 0.0] for i in range(25)]
        t = add(t, ids, xy1, 1).table
        r = add(t, ids, xy1, 2)
        assert bool(r.is_keyframe)
        assert float(r.parallax) > 0.09

    def test_table_overflow_drops(self):
        t = init_feature_table(4, jnp.float64)
        r = add(t, [1, 2, 3, 4, 5, 6], [[0, 0]] * 6, 0)
        assert int((r.table.fid >= 0).sum()) == 4


class TestTriangulate:
    def test_known_depth(self):
        t = init_feature_table(F, jnp.float64)
        # Landmark at (0.3, -0.2, 4.0) in world; cameras at x=0 and x=0.5
        # looking down +z (identity orientation, identity extrinsics).
        lm = np.array([0.3, -0.2, 4.0])
        p = np.zeros((W, 3))
        p[:, 0] = np.linspace(0, 0.5 * (W - 1) / W, W)
        q = np.tile([1.0, 0, 0, 0], (W, 1))
        for fc in range(4):
            rel = lm - p[fc]
            t = add(t, [42], [[rel[0] / rel[2], rel[1] / rel[2]]], fc).table
        t2 = ft.triangulate(
            t, jnp.asarray(p), jnp.asarray(q),
            jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(5.0),
        )
        slot = int(np.argmax(np.asarray(t2.fid) == 42))
        assert bool(eligible_mask(t2)[slot])
        np.testing.assert_allclose(float(t2.depth[slot]), 4.0, atol=1e-6)

    def test_low_depth_floor(self):
        # Zero baseline -> degenerate DLT -> init_depth fallback (:190-192).
        t = init_feature_table(F, jnp.float64)
        for fc in range(3):
            t = add(t, [1], [[0.1, 0.1]], fc).table
        t2 = ft.triangulate(
            t, jnp.zeros((W, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (W, 1)),
            jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(5.0),
        )
        slot = int(np.argmax(np.asarray(t2.fid) == 1))
        assert float(t2.depth[slot]) == 5.0


class TestSlides:
    def _filled(self):
        t = init_feature_table(F, jnp.float64)
        # Feature 1: frames 0..3. Feature 2: frames 1..2. Feature 3: frame 0 only
        # plus frame 1 (2 obs anchored at 0).
        t = add(t, [1, 3], [[0, 0], [0.5, 0.5]], 0).table
        t = add(t, [1, 2, 3], [[0.01, 0], [0.2, 0.2], [0.5, 0.5]], 1).table
        t = add(t, [1, 2], [[0.02, 0], [0.21, 0.2]], 2).table
        t = add(t, [1], [[0.03, 0]], 3).table
        return t

    def test_slide_old_shifts_and_reanchors(self):
        t = self._filled()
        slot1 = int(np.argmax(np.asarray(t.fid) == 1))
        t = t._replace(depth=t.depth.at[slot1].set(4.0))
        eye = jnp.eye(3)
        # New anchor camera 0.5m to the right along x.
        t2 = ft.slide_old(t, True, eye, jnp.zeros(3), eye,
                          jnp.asarray([0.5, 0.0, 0.0]), jnp.asarray(5.0))
        a = np.asarray
        s1 = int(np.argmax(a(t2.fid) == 1))
        assert a(t2.start)[s1] == 0
        assert a(t2.mask)[s1, :3].all() and not a(t2.mask)[s1, 3]
        # Depth re-anchored: world point (0,0,4), new cam at (0.5,0,0) -> z=4.
        np.testing.assert_allclose(float(t2.depth[s1]), 4.0, atol=1e-9)
        # Feature 2 start 1 -> 0.
        s2 = int(np.argmax(a(t2.fid) == 2))
        assert a(t2.start)[s2] == 0
        # Feature 3 anchored at 0 with 2 obs -> 1 obs left -> freed.
        assert not (a(t2.fid) == 3).any()

    def test_slide_old_initial_keeps_single_obs(self):
        t = self._filled()
        eye = jnp.eye(3)
        t2 = ft.slide_old(t, False, eye, jnp.zeros(3), eye, jnp.zeros(3),
                          jnp.asarray(5.0))
        # removeBack only frees features with ZERO obs left; feature 3 keeps 1.
        assert (np.asarray(t2.fid) == 3).any()

    def test_slide_new_merges_frames(self):
        t = init_feature_table(F, jnp.float64)
        ids = [1, 2]
        for fc in range(W):
            t = add(t, ids, [[0.01 * fc, 0], [0.5, 0.5]], fc).table
        # Feature seen only at the very last frame.
        t = add(t, [9], [[0.7, 0.7]], W - 1).table
        t2 = ft.slide_new(t)
        a = np.asarray
        s1 = int(np.argmax(a(t2.fid) == 1))
        # Obs at slot 9 replaced by old slot 10's; slot 10 cleared.
        np.testing.assert_allclose(a(t2.obs)[s1, W - 2, 0], 0.01 * (W - 1))
        assert not a(t2.mask)[s1, W - 1]
        s9 = int(np.argmax(a(t2.fid) == 9))
        assert a(t2.start)[s9] == W - 2
        assert a(t2.mask)[s9, W - 2]

    def test_remove_failures(self):
        t = self._filled()
        slot1 = int(np.argmax(np.asarray(t.fid) == 1))
        t = t._replace(solve_flag=t.solve_flag.at[slot1].set(2))
        t2 = ft.remove_failures(t)
        assert not (np.asarray(t2.fid) == 1).any()
