"""Frontend kernel regression tests: LK optical flow, CLAHE, Shi-Tomasi
response, F-matrix RANSAC, and the full tracker loop — the TPU-native
replacements for the reference's OpenCV pipeline
(src/frontend/feature_tracker.cpp:97-201).

cv2 is used as the parity oracle where the reference calls into it
(calcOpticalFlowPyrLK, createCLAHE, cornerMinEigenVal); the remaining tests
use synthetic geometry with exact ground truth.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mobile_slam_tpu.config import CameraConfig, TrackerConfig
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.frontend import tracker as trk
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.ops import clahe as clahe_op
from mobile_slam_tpu.ops import corners, image as im, lk, ransac

H, W = 240, 320


def make_texture(h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)


def shift_image(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR)


def grid_points(margin=40, nx=10, ny=7):
    gx, gy = np.meshgrid(np.linspace(margin, W - margin, nx),
                         np.linspace(margin, H - margin, ny))
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Lucas-Kanade
# ---------------------------------------------------------------------------

class TestLK:
    @pytest.fixture(scope="class")
    def tracked(self):
        img0 = make_texture()
        dx, dy = 3.7, -2.3
        img1 = shift_image(img0, dx, dy)
        pts = grid_points()
        params = lk.LKParams()
        pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
        pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
        ours, ok = lk.track_pyramidal(pyr0, pyr1, jnp.asarray(pts),
                                      jnp.ones(len(pts), bool), params)
        cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
            img0.astype(np.uint8), img1.astype(np.uint8),
            pts.reshape(-1, 1, 2), None, winSize=(21, 21), maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                      30, 0.01))
        return (pts, np.array([dx, dy]), np.asarray(ours), np.asarray(ok),
                cv_pts.reshape(-1, 2), cv_st.ravel() > 0)

    def test_accuracy_vs_ground_truth(self, tracked):
        pts, flow, ours, ok, _, _ = tracked
        assert ok.sum() > 0.9 * len(pts)
        err = np.linalg.norm(ours[ok] - (pts[ok] + flow), axis=-1)
        assert err.mean() < 0.2, f"mean LK error {err.mean():.3f}px"
        assert np.median(err) < 0.15

    def test_parity_with_cv2(self, tracked):
        pts, _, ours, ok, cv_pts, cv_ok = tracked
        both = ok & cv_ok
        diff = np.linalg.norm(ours[both] - cv_pts[both], axis=-1)
        # Same algorithm family; sub-pixel internals differ (border
        # handling, Scharr scaling) — trajectory-level parity is the goal
        # (test_vio_engine_parity.cpp:376-378 declares KLT nondeterministic).
        assert np.median(diff) < 0.3

    def test_garbage_frame_kills_tracks(self):
        img0 = make_texture(seed=1)
        img1 = make_texture(seed=99)  # unrelated content
        pts = grid_points()
        params = lk.LKParams()
        pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
        pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
        fwd, ok = lk.track_pyramidal(pyr0, pyr1, jnp.asarray(pts),
                                     jnp.ones(len(pts), bool), params)
        back, ok_b = lk.track_pyramidal(pyr1, pyr0, fwd,
                                        jnp.asarray(ok), params)
        fb = np.linalg.norm(np.asarray(back) - pts, axis=-1)
        surv = np.asarray(ok) & np.asarray(ok_b) & (fb <= 0.5)
        # Forward-backward keeps almost nothing on unrelated frames.
        assert surv.sum() < 0.2 * len(pts)

    def test_anchor_refinement_removes_drift(self):
        img0 = make_texture(seed=2)
        pts = grid_points()
        tp, gx, gy = lk.extract_patches(jnp.asarray(img0), jnp.asarray(pts),
                                        21)
        # Current image shifted by a known subpixel amount; start the
        # refinement from a drifted estimate 0.8 px off the truth.
        true_flow = np.array([1.3, -0.6])
        img1 = shift_image(img0, *true_flow)
        drifted = pts + true_flow + np.array([0.55, -0.55])
        pos, ok, resid = lk.refine_template(
            jnp.asarray(img1), tp, gx, gy, jnp.asarray(drifted),
            jnp.ones(len(pts), bool), 21, 8, 0.01, 2.0)
        pos, ok, resid = np.asarray(pos), np.asarray(ok), np.asarray(resid)
        err = np.linalg.norm(pos[ok] - (pts[ok] + true_flow), axis=-1)
        assert ok.sum() > 0.9 * len(pts)
        assert np.median(err) < 0.1, f"median anchor err {np.median(err):.3f}"
        assert np.median(resid[ok]) < 10.0

    def test_anchor_residual_flags_appearance_change(self):
        img0 = make_texture(seed=3)
        pts = grid_points()
        tp, gx, gy = lk.extract_patches(jnp.asarray(img0), jnp.asarray(pts),
                                        21)
        img1 = make_texture(seed=123)  # different content
        _, ok, resid = lk.refine_template(
            jnp.asarray(img1), tp, gx, gy, jnp.asarray(pts),
            jnp.ones(len(pts), bool), 21, 8, 0.01, 2.0)
        # Residual (0..255 scale) must clearly exceed the re-anchor gate.
        assert np.median(np.asarray(resid)) > 14.0


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

def test_clahe_parity_with_cv2():
    img = make_texture(256, 256, seed=4)
    ours = np.asarray(clahe_op.clahe(jnp.asarray(img), 3.0, 8))
    cv = cv2.createCLAHE(3.0, (8, 8)).apply(img.astype(np.uint8))
    diff = np.abs(ours - cv.astype(np.float32))
    # Interpolation/binning conventions differ slightly from cv2; the
    # tracker needs consistent contrast normalization, not bit-exactness.
    assert diff.mean() < 6.0, f"CLAHE mean diff {diff.mean():.2f}"
    corr = np.corrcoef(ours.ravel(), cv.astype(np.float32).ravel())[0, 1]
    assert corr > 0.98, f"CLAHE correlation {corr:.3f}"


# ---------------------------------------------------------------------------
# Shi-Tomasi corners
# ---------------------------------------------------------------------------

class TestCorners:
    def test_min_eig_parity_with_cv2(self):
        img = make_texture(seed=5)
        ours = np.asarray(corners.min_eig_response(jnp.asarray(img)))
        cv = cv2.cornerMinEigenVal(img.astype(np.float32), 3, 3)
        # Compare away from the border (different padding conventions).
        a, b = ours[8:-8, 8:-8], cv[8:-8, 8:-8]
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.95, f"min-eig response correlation {corr:.3f}"

    def test_detect_grid_spacing_and_quality(self):
        img = make_texture(seed=6)
        resp = corners.min_eig_response(jnp.asarray(img))
        pts, valid = corners.detect_grid(resp, 20, 150, quality_level=0.01)
        pts = np.asarray(pts)[np.asarray(valid)]
        assert len(pts) > 50
        d = pts[:, None, :] - pts[None, :, :]
        dist = np.sqrt((d ** 2).sum(-1)) + np.eye(len(pts)) * 1e9
        # detect_grid guarantees cell-level separation (~min_dist/2 worst
        # case for adjacent-cell picks).
        assert dist.min() >= 10.0

    def test_occupancy_suppression_blocks_existing(self):
        img = make_texture(seed=7)
        resp = corners.min_eig_response(jnp.asarray(img))
        occ = jnp.asarray(np.array([[100.0, 100.0]], np.float32))
        resp2 = corners.occupancy_suppression(
            resp, occ, jnp.ones(1, bool), 20)
        pts, valid = corners.detect_grid(resp2, 20, 150, quality_level=0.01)
        pts = np.asarray(pts)[np.asarray(valid)]
        d = np.linalg.norm(pts - [100.0, 100.0], axis=-1)
        assert d.min() >= 20.0 - 1e-3


# ---------------------------------------------------------------------------
# Fundamental-matrix RANSAC
# ---------------------------------------------------------------------------

def test_fundamental_ransac_inlier_recall():
    rng = np.random.default_rng(8)
    n, k_pad = 120, 160
    # Synthetic two-view geometry: points on a plane + off-plane, camera
    # translating + rotating slightly.
    pts3 = np.concatenate([
        rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3)),
    ])
    f = 300.0
    cx, cy = W / 2, H / 2

    def project(p, R, t):
        pc = p @ R.T + t
        return np.stack([f * pc[:, 0] / pc[:, 2] + cx,
                         f * pc[:, 1] / pc[:, 2] + cy], axis=-1)

    c, s = np.cos(0.05), np.sin(0.05)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t = np.array([0.3, 0.05, 0.0])
    uv1 = project(pts3, np.eye(3), np.zeros(3))
    uv2 = project(pts3, R, t)
    # Contaminate 25% with gross outliers.
    n_out = n // 4
    idx_out = rng.choice(n, n_out, replace=False)
    uv2_c = uv2.copy()
    uv2_c[idx_out] += rng.uniform(15, 60, (n_out, 2)) * rng.choice(
        [-1, 1], (n_out, 2))

    p1 = np.zeros((k_pad, 2), np.float32)
    p2 = np.zeros((k_pad, 2), np.float32)
    p1[:n], p2[:n] = uv1, uv2_c
    valid = np.zeros(k_pad, bool)
    valid[:n] = True

    F, status = ransac.find_fundamental_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid),
        jnp.asarray(1.0, jnp.float32), jax.random.PRNGKey(0),
        num_hypotheses=64)
    status = np.asarray(status)
    is_out = np.zeros(n, bool)
    is_out[idx_out] = True
    kept_in = status[:n][~is_out].mean()
    kept_out = status[:n][is_out].mean()
    assert kept_in > 0.9, f"inlier recall {kept_in:.2f}"
    assert kept_out < 0.15, f"outlier leakage {kept_out:.2f}"


# ---------------------------------------------------------------------------
# Full tracker over a rendered sequence
# ---------------------------------------------------------------------------

class TestFullTracker:
    @pytest.fixture(scope="class")
    def run(self):
        cam_cfg = CameraConfig(
            model_type="PINHOLE", width=256, height=256,
            focal_length=200.0, fx=200.0, fy=200.0, cx=128.0, cy=128.0)
        cam64 = make_camera(cam_cfg, dtype=jnp.float64)
        cam32 = make_camera(cam_cfg, dtype=jnp.float32)
        cfg = TrackerConfig(max_cnt=80, min_dist=16, max_points=96)
        # 20 fps: at 10 fps this trajectory's inter-frame motion is 20-60 px,
        # beyond pyramidal-LK capture range on small synthetic sprites (which
        # have no coarse-scale structure for the top pyramid levels to lock
        # onto) — the forward-backward check then rightly culls the failures
        # and track counts collapse. Real feeds at the reference's rates move
        # ~5-20 px/frame, which is what this asserts against.
        scfg = sim.SimConfig(duration=1.5, cam_rate=20.0, imu_rate=100.0,
                             num_landmarks=400, max_features=80, seed=11)
        r_ic = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
        t_ic = np.zeros(3)
        data = sim.simulate(scfg, cam64, r_ic, t_ic)
        step = jax.jit(functools.partial(
            trk.detect_and_track, camera=cam32, cfg=cfg, focal=200.0))
        state = trk.init_tracker_state(cfg, 256, 256, jnp.float32)
        key = jax.random.PRNGKey(0)
        outs, states = [], []
        for fi in range(len(data.frames)):
            img = sim.render_frame(data, fi, cam64, r_ic, t_ic)
            state, out = step(state, jnp.asarray(img, jnp.float32),
                              jnp.asarray(data.cam_ts[fi], jnp.float32),
                              key=jax.random.fold_in(key, fi))
            outs.append(jax.tree.map(np.asarray, out))
            states.append(jax.tree.map(np.asarray, state))
        return data, outs, states

    def test_detects_and_sustains_tracks(self, run):
        _, outs, states = run
        # ~30 landmarks fall in the narrow pinhole FOV of this scene.
        assert states[0].active.sum() > 20
        # After warmup, a healthy share of points survives tracking.
        for out in outs[2:]:
            assert out.num_tracked > 15

    def test_ids_monotone_and_unique(self, run):
        _, _, states = run
        for st in states:
            live = st.ids[st.active]
            assert len(np.unique(live)) == len(live)
        assert states[-1].next_id >= states[0].next_id

    def test_track_counts_grow(self, run):
        _, _, states = run
        assert states[-1].track_cnt[states[-1].active].max() >= 5

    def test_emitted_rays_are_unit_z(self, run):
        _, outs, _ = run
        out = outs[-1]
        rays = out.obs[out.valid]
        np.testing.assert_allclose(rays[:, 2], 1.0, atol=1e-6)

    def test_velocity_consistency(self, run):
        """Velocities ~ d(norm_pts)/dt for surviving tracks."""
        data, outs, states = run
        v = outs[-1].vel[outs[-1].valid]
        assert np.isfinite(v).all()
        assert np.abs(v).max() < 5.0  # normalized-plane rad/s, sane bound


class TestNonSquareResolution:
    """The reference runs EuRoC 752x480 and KITTI-360 1408x376 pinhole
    cameras (configs/euroc.yaml, configs/kitti360.yaml), so every image
    kernel must be resolution-agnostic (h != w). A small 384x256 run keeps
    CPU time down while catching any height/width transposition."""

    def test_tracker_full_pipeline_nonsquare(self):
        cam_cfg = CameraConfig(
            model_type="PINHOLE", width=384, height=256,
            focal_length=200.0, fx=200.0, fy=200.0, cx=192.0, cy=128.0)
        cam64 = make_camera(cam_cfg, dtype=jnp.float64)
        cam32 = make_camera(cam_cfg, dtype=jnp.float32)
        cfg = TrackerConfig(max_cnt=80, min_dist=16, max_points=96)
        scfg = sim.SimConfig(duration=0.25, cam_rate=20.0, imu_rate=100.0,
                             num_landmarks=400, max_features=80, seed=11)
        r_ic = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
        t_ic = np.zeros(3)
        data = sim.simulate(scfg, cam64, r_ic, t_ic)
        step = jax.jit(functools.partial(
            trk.detect_and_track, camera=cam32, cfg=cfg, focal=200.0))
        state = trk.init_tracker_state(cfg, 256, 384, jnp.float32)
        key = jax.random.PRNGKey(0)
        for fi in range(len(data.frames)):
            img = sim.render_frame(data, fi, cam64, r_ic, t_ic)
            assert img.shape == (256, 384)
            state, out = step(state, jnp.asarray(img, jnp.float32),
                              jnp.asarray(data.cam_ts[fi], jnp.float32),
                              key=jax.random.fold_in(key, fi))
        state = jax.tree.map(np.asarray, state)
        out = jax.tree.map(np.asarray, out)
        assert state.active.sum() > 20
        assert out.num_tracked > 15
        uv = out.uv[out.valid]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 384).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 256).all()
        # Points actually use the wide dimension (not clipped to a square).
        assert uv[:, 0].max() > 260.0
