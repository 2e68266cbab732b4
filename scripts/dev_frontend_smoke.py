"""Dev smoke for the image frontend: LK vs OpenCV, corner detection, CLAHE,
full tracker on a synthetic shifting texture."""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import cv2
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import CameraConfig, TrackerConfig
from mobile_slam_tpu.frontend import tracker as trk
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.ops import clahe as clahe_op
from mobile_slam_tpu.ops import corners, image as im, lk


def make_texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
    return img


def shift_image(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR)


def test_lk():
    h, w = 240, 320
    img0 = make_texture(h, w)
    dx, dy = 3.7, -2.3
    img1 = shift_image(img0, dx, dy)

    gx, gy = np.meshgrid(np.linspace(40, w - 40, 12),
                         np.linspace(40, h - 40, 9))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)
    K = len(pts)

    params = lk.LKParams(window=21, levels=3, iters=30, eps=0.01)
    p0 = jnp.asarray(pts)
    pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
    t0 = time.time()
    ours, ok = lk.track_pyramidal(pyr0, pyr1, p0, jnp.ones(K, bool), params)
    ours = np.asarray(ours)
    print(f"our LK: {time.time()-t0:.1f}s, ok={int(np.sum(np.asarray(ok)))}/{K}")

    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8), pts.reshape(-1, 1, 2),
        None, winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    cv_pts = cv_pts.reshape(-1, 2)

    gt = pts + [dx, dy]
    ok_np = np.asarray(ok)
    err_ours = np.linalg.norm(ours[ok_np] - gt[ok_np], axis=-1)
    err_cv = np.linalg.norm(cv_pts[cv_st.ravel() > 0] - gt[cv_st.ravel() > 0], axis=-1)
    print(f"flow err ours: mean {err_ours.mean():.3f}px max {err_ours.max():.3f}px")
    print(f"flow err cv2 : mean {err_cv.mean():.3f}px max {err_cv.max():.3f}px")
    assert err_ours.mean() < 0.2


def test_corners():
    h, w = 240, 320
    img = make_texture(h, w, 1)
    resp = corners.min_eig_response(jnp.asarray(img))
    pts, valid = corners.detect_grid(resp, 20, 150)
    pts = np.asarray(pts)[np.asarray(valid)]
    print(f"detected {len(pts)} corners")
    cv_pts = cv2.goodFeaturesToTrack(img.astype(np.uint8), 150, 0.01, 20)
    print(f"cv2 detected {len(cv_pts)}")
    # Spatial spread check: min pairwise distance.
    from scipy.spatial.distance import pdist
    print(f"our min dist {pdist(pts).min():.1f}, cv {pdist(cv_pts.reshape(-1,2)).min():.1f}")


def test_clahe():
    img = make_texture(256, 256, 2)
    ours = np.asarray(clahe_op.clahe(jnp.asarray(img), 3.0, 8))
    cv = cv2.createCLAHE(3.0, (8, 8)).apply(img.astype(np.uint8)).astype(np.float32)
    diff = np.abs(ours - cv)
    print(f"CLAHE diff vs cv2: mean {diff.mean():.2f} max {diff.max():.2f} (0..255)")


def test_full_tracker():
    h, w = 240, 320
    cfg = TrackerConfig(max_cnt=100, min_dist=20, max_points=128,
                        lk_pyramid_levels=3, equalize=True)
    cam_cfg = CameraConfig(model_type="PINHOLE", width=w, height=h,
                           focal_length=300.0, fx=300.0, fy=300.0,
                           cx=w / 2, cy=h / 2)
    cam = make_camera(cam_cfg, dtype=jnp.float32)
    state = trk.init_tracker_state(cfg, h, w, jnp.float32)

    import functools
    step = jax.jit(functools.partial(
        trk.detect_and_track, camera=cam, cfg=cfg, focal=300.0))

    img = make_texture(h, w, 3)
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    for fi in range(6):
        cur = shift_image(img, 2.0 * fi, -1.0 * fi)
        state, out = step(state, jnp.asarray(cur), jnp.asarray(0.05 * fi),
                          key=jax.random.fold_in(key, fi))
        print(f"frame {fi}: tracked={int(out.num_tracked)} "
              f"emitted={int(np.sum(np.asarray(out.valid)))} "
              f"active={int(np.sum(np.asarray(state.active)))} "
              f"next_id={int(state.next_id)}")
    print(f"wall {time.time()-t0:.1f}s (incl compile)")
    # Track velocity sanity: flow is (2, -1) px/frame at 20fps in normalized
    # coords -> vx = 2/300/0.05 = 0.133.
    v = np.asarray(out.vel)[np.asarray(out.valid)]
    print(f"mean vel: {v.mean(axis=0)} (expect ~[0.133, -0.067])")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("lk", "all"):
        test_lk()
    if which in ("corners", "all"):
        test_corners()
    if which in ("clahe", "all"):
        test_clahe()
    if which in ("tracker", "all"):
        test_full_tracker()
