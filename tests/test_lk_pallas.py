"""Pallas LK kernel vs the pure-XLA reference implementation.

The kernel (ops/lk_pallas.py) must be a drop-in for ops/lk.py: same
coarse-to-fine KLT, same health checks, same border behavior (its
replicate padding reproduces ops/lk.py's per-pixel clamp). On CPU the
kernel runs in Pallas interpret mode — slow, so shapes here are tiny; the
real-chip parity/throughput checks live in scripts/dev_stage_timing.py
and the bench.

Reference behavior: cv::calcOpticalFlowPyrLK
(/root/reference/src/frontend/feature_tracker.cpp:130-136).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobile_slam_tpu.ops import image as im, lk, lk_pallas

H, W = 64, 96
SEED = 3


@pytest.fixture(autouse=True)
def interpret_mode():
    lk_pallas._INTERPRET = True
    yield
    lk_pallas._INTERPRET = False


def _texture(rs, h=H, w=W):
    """Band-limited random texture (smooth enough for KLT convergence)."""
    base = rs.rand(h // 4 + 2, w // 4 + 2).astype(np.float32) * 255.0
    img = jnp.asarray(base)
    up = jax.image.resize(img, (h, w), "cubic")
    return np.asarray(up)


@pytest.fixture(scope="module")
def world():
    rs = np.random.RandomState(SEED)
    img0 = _texture(rs)
    # Known sub-pixel shift via XLA bilinear resample of the same texture.
    dx, dy = 1.7, -1.2
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    coords = jnp.asarray(np.stack([xx + dx, yy + dy], -1))
    img1 = np.asarray(im.bilinear_sample(jnp.asarray(img0), coords))
    p0 = jax.jit(lambda x: tuple(im.build_pyramid(x, 1)))(
        jnp.asarray(img0, jnp.float32))
    p1 = jax.jit(lambda x: tuple(im.build_pyramid(x, 1)))(
        jnp.asarray(img1, jnp.float32))
    return img0, img1, p0, p1, (dx, dy)


PARAMS = lk.LKParams(window=21, levels=1, iters=12, eps=0.005)


def _points():
    """Interior + deliberately-near-border points, plus a dead slot."""
    pts = np.array([
        [30.0, 30.0], [45.3, 22.7], [60.1, 40.6], [25.8, 44.2],
        [70.0, 25.5], [40.0, 15.0],
        [12.5, 12.5],            # window reaches the border
        [83.0, 50.0],            # window reaches the border
        [5.0, 30.0],             # window well past the border
        [0.0, 0.0],
    ], np.float32)
    act = np.ones(len(pts), bool)
    act[-1] = False
    return jnp.asarray(pts), jnp.asarray(act)


class TestTrackParity:
    @pytest.mark.parametrize("n_pack", [1, 4])
    def test_matches_xla_reference(self, world, n_pack):
        _, _, p0, p1, _ = world
        pts, act = _points()
        pos_x, ok_x = lk.track_pyramidal(list(p0), list(p1), pts, act,
                                         PARAMS)
        pos_p, ok_p = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS,
                                                n_pack)
        pos_x, ok_x = np.asarray(pos_x), np.asarray(ok_x)
        pos_p, ok_p = np.asarray(pos_p), np.asarray(ok_p)

        assert (ok_x == ok_p).all(), f"ok mismatch: {ok_x} vs {ok_p}"
        both = ok_x & ok_p
        assert both.sum() >= 7
        d = np.linalg.norm(pos_x[both] - pos_p[both], axis=-1)
        # Same math, different summation order (block Scharr + matmul
        # selection vs gathers); agreement to well under a hundredth px.
        assert d.max() < 0.02, f"pos diff {d}"

    def test_recovers_known_shift(self, world):
        _, _, p0, p1, (dx, dy) = world
        pts, act = _points()
        pos_p, ok_p = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS)
        pos_p, ok_p = np.asarray(pos_p), np.asarray(ok_p)
        pts_np = np.asarray(pts)
        # img1(x) = img0(x + d)  =>  a feature at p in img0 appears at
        # p - d in img1.
        interior = ok_p.copy()
        interior[6:] = False
        flow = pos_p[interior] - pts_np[interior]
        err = np.linalg.norm(flow - np.array([-dx, -dy]), axis=-1)
        assert np.median(err) < 0.1, f"flow err {err}"

    def test_dead_slots_passthrough(self, world):
        _, _, p0, p1, _ = world
        pts, act = _points()
        pos_p, ok_p = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS)
        assert not bool(ok_p[-1])
        np.testing.assert_allclose(np.asarray(pos_p)[-1],
                                   np.asarray(pts)[-1])


class TestRefineParity:
    def test_matches_xla_reference(self, world):
        img0, img1, _, _, _ = world
        pts, act = _points()
        t, gx, gy = lk.extract_patches(jnp.asarray(img0, jnp.float32), pts,
                                       PARAMS.window)
        start = pts + jnp.asarray([0.9, -0.6])
        args = (t, gx, gy, start, act, PARAMS.window, 8, 0.005, 2.0)
        pos_x, ok_x, res_x = lk.refine_template(
            jnp.asarray(img1, jnp.float32), *args)
        pos_p, ok_p, res_p = lk_pallas.refine_template(
            jnp.asarray(img1, jnp.float32), *args)
        pos_x, pos_p = np.asarray(pos_x), np.asarray(pos_p)
        ok_x, ok_p = np.asarray(ok_x), np.asarray(ok_p)

        assert (ok_x == ok_p).all(), f"ok mismatch: {ok_x} vs {ok_p}"
        both = ok_x & ok_p
        assert both.sum() >= 7
        d = np.linalg.norm(pos_x[both] - pos_p[both], axis=-1)
        assert d.max() < 0.02, f"pos diff {d}"
        r = np.abs(np.asarray(res_x)[both] - np.asarray(res_p)[both])
        assert r.max() < 0.05, f"resid diff {r}"


class TestExtractParity:
    def test_matches_xla_reference(self, world):
        img0, _, _, _, _ = world
        pts, _ = _points()
        t_x, gx_x, gy_x = lk.extract_patches(
            jnp.asarray(img0, jnp.float32), pts, PARAMS.window)
        t_p, gx_p, gy_p = lk_pallas.extract_patches(
            jnp.asarray(img0, jnp.float32), pts, PARAMS.window)
        # Interior points: exact agreement. Border-overlapping windows
        # differ in their outermost gradient pixels (reflect-101 vs
        # replicate padding) — those features are border-culled upstream.
        interior = slice(0, 6)
        for a, b, name in ((t_x, t_p, "t"), (gx_x, gx_p, "gx"),
                           (gy_x, gy_p, "gy")):
            d = np.abs(np.asarray(a)[interior] - np.asarray(b)[interior])
            assert d.max() < 1e-3, f"{name} diff {d.max()}"


class TestPackParity:
    """PACK_POINTS=4 masks converged/dead lanes with `where`, so packed and
    unpacked paths execute the same op sequence on the same values for every
    live point — the results must be BIT-identical, not just close (the
    on-chip A/B in scripts/dev_lk_pack_ab.py checks the same contract on
    real Mosaic lowering)."""

    def test_track_bit_parity(self, world):
        _, _, p0, p1, _ = world
        pts, act = _points()
        pos_1, ok_1 = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS, 1)
        pos_4, ok_4 = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS, 4)
        np.testing.assert_array_equal(np.asarray(ok_1), np.asarray(ok_4))
        np.testing.assert_array_equal(np.asarray(pos_1), np.asarray(pos_4))

    def test_refine_bit_parity(self, world):
        img0, img1, _, _, _ = world
        pts, act = _points()
        t, gx, gy = lk.extract_patches(jnp.asarray(img0, jnp.float32), pts,
                                       PARAMS.window)
        start = pts + jnp.asarray([0.9, -0.6])
        args = (t, gx, gy, start, act, PARAMS.window, 8, 0.005, 2.0)
        out_1 = lk_pallas.refine_template(jnp.asarray(img1, jnp.float32),
                                          *args, 1)
        out_4 = lk_pallas.refine_template(jnp.asarray(img1, jnp.float32),
                                          *args, 4)
        for a, b in zip(out_1, out_4):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_extract_bit_parity(self, world):
        img0, _, _, _, _ = world
        pts, _ = _points()
        out_1 = lk_pallas.extract_patches(jnp.asarray(img0, jnp.float32),
                                          pts, PARAMS.window, 1)
        out_4 = lk_pallas.extract_patches(jnp.asarray(img0, jnp.float32),
                                          pts, PARAMS.window, 4)
        for a, b in zip(out_1, out_4):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSequentialVmap:
    """The custom_vmap fallback (fleet image mode vmaps the whole pipeline;
    the kernel batches via sequential lax.map) must equal per-sequence
    calls exactly."""

    def test_vmapped_track_matches_per_sequence(self, world):
        img0, img1, p0, p1, _ = world
        pts, act = _points()
        # Two "sequences": original and a shifted/flipped variant.
        p0b = tuple(jnp.stack([a, a[::-1]]) for a in p0)
        p1b = tuple(jnp.stack([a, a[::-1]]) for a in p1)
        ptsb = jnp.stack([pts, pts + 1.5])
        actb = jnp.stack([act, act])

        vmapped = jax.vmap(
            lambda a, b, c, d: lk_pallas.track_pyramidal(a, b, c, d, PARAMS))
        pos_v, ok_v = vmapped(p0b, p1b, ptsb, actb)
        for s in range(2):
            pos_s, ok_s = lk_pallas.track_pyramidal(
                tuple(a[s] for a in p0b), tuple(a[s] for a in p1b),
                ptsb[s], actb[s], PARAMS)
            np.testing.assert_array_equal(np.asarray(ok_v[s]),
                                          np.asarray(ok_s))
            np.testing.assert_allclose(np.asarray(pos_v[s]),
                                       np.asarray(pos_s), atol=1e-6)

    def test_vmapped_extract_matches_per_sequence(self, world):
        img0, img1, _, _, _ = world
        pts, _ = _points()
        imgs = jnp.stack([jnp.asarray(img0), jnp.asarray(img1)])
        ptsb = jnp.stack([pts, pts + 2.0])
        t_v, gx_v, gy_v = jax.vmap(
            lambda i, p: lk_pallas.extract_patches(i, p, 21))(imgs, ptsb)
        for s in range(2):
            t_s, gx_s, gy_s = lk_pallas.extract_patches(imgs[s], ptsb[s], 21)
            np.testing.assert_allclose(np.asarray(t_v[s]), np.asarray(t_s),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(gy_v[s]), np.asarray(gy_s),
                                       atol=1e-6)


class TestPackParity:
    """ADVICE r3: pin bit-parity between the unpacked (n_pack=1) and
    ILP-packed (n_pack=4) kernel paths in CI, not just in the on-chip dev
    probe (scripts/dev_lk_pack_ab.py) — the packed path must be a pure
    scheduling change, so any masking regression shows as exact-value
    mismatch here rather than hiding inside a tolerance."""

    def test_track_bit_parity(self, world):
        _, _, p0, p1, _ = world
        pts, act = _points()
        pos1, ok1 = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS, 1)
        pos4, ok4 = lk_pallas.track_pyramidal(p0, p1, pts, act, PARAMS, 4)
        assert np.array_equal(np.asarray(ok1), np.asarray(ok4))
        assert np.array_equal(np.asarray(pos1), np.asarray(pos4))

    def test_extract_and_refine_bit_parity(self, world):
        img0, img1, _, _, _ = world
        pts, act = _points()
        outs = []
        for pack in (1, 4):
            tp, gx, gy = lk_pallas._extract_patches(
                jnp.asarray(img0, jnp.float32), pts, PARAMS.window, pack)
            r = lk_pallas._refine_template(
                jnp.asarray(img1, jnp.float32), tp, gx, gy, pts, act,
                PARAMS.window, 8, 0.01, 4.0, n_pack=pack)
            outs.append((tp, gx, gy) + tuple(r))
        for a, b in zip(*outs):
            assert np.array_equal(np.asarray(a), np.asarray(b))
