"""On-chip Pallas parity checks (run by tests/test_tpu_onchip.py).

Executes the REAL Mosaic lowering of every lk_pallas kernel on the TPU and
compares against the XLA reference path (ops/lk.py) — the CI suite proper
runs the kernels only in interpret mode (tests/test_lk_pallas.py), so a
silent Mosaic miscompile (the class of bug lk_pallas.py's own header warns
about: pltpu.roll on non-power-of-2 sizes) would otherwise surface as
mysterious end-to-end drift instead of a test failure.

Exit codes: 0 pass, 1 fail, 42 no TPU available (test skips).
Standalone: PYTHONPATH=/root/repo:/root/.axon_site python tests/onchip_parity.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

# Match the production configuration (bench.py / cli.py pin this) so the
# matmul-based jax.image.resize builds the same test texture here as the
# CPU reference run.
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> int:
    if jax.devices()[0].platform not in ("tpu", "axon"):
        print(f"no TPU (platform={jax.devices()[0].platform})")
        return 42

    from mobile_slam_tpu.ops import image as im, lk, lk_pallas

    assert not lk_pallas._INTERPRET, "must run the real Mosaic lowering"

    H, W = 128, 192
    rs = np.random.RandomState(7)
    base = rs.rand(H // 4 + 2, W // 4 + 2).astype(np.float32) * 255.0
    img0 = np.asarray(jax.image.resize(jnp.asarray(base), (H, W), "cubic"))
    dx, dy = 1.7, -1.2
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img1 = np.asarray(im.bilinear_sample(
        jnp.asarray(img0), jnp.asarray(np.stack([xx + dx, yy + dy], -1))))
    pyr0 = jax.jit(lambda x: tuple(im.build_pyramid(x, 2)))(
        jnp.asarray(img0, jnp.float32))
    pyr1 = jax.jit(lambda x: tuple(im.build_pyramid(x, 2)))(
        jnp.asarray(img1, jnp.float32))

    K = 64
    pts = jnp.asarray(
        np.stack([rs.uniform(24, W - 24, K), rs.uniform(24, H - 24, K)],
                 -1).astype(np.float32))
    act = jnp.asarray(rs.random(K) > 0.15)
    params = lk.LKParams(window=21, levels=2, iters=12, eps=0.005)

    failures = []

    def check(name, cond, detail=""):
        status = "ok" if cond else "FAIL"
        print(f"[{status}] {name} {detail}")
        if not cond:
            failures.append(name)

    # --- full pyramidal track: Mosaic vs XLA reference -----------------
    pos_x, ok_x = jax.jit(
        lambda a, b, p, m: lk.track_pyramidal(list(a), list(b), p, m, params)
    )(pyr0, pyr1, pts, act)
    pos_p, ok_p = jax.jit(
        lambda a, b, p, m: lk_pallas.track_pyramidal(a, b, p, m, params)
    )(pyr0, pyr1, pts, act)
    pos_x, ok_x = np.asarray(pos_x), np.asarray(ok_x)
    pos_p, ok_p = np.asarray(pos_p), np.asarray(ok_p)
    agree = ok_x == ok_p
    check("track ok-mask parity", agree.mean() >= 0.95,
          f"({(~agree).sum()}/{K} mismatched)")
    both = ok_x & ok_p
    d = np.linalg.norm(pos_x[both] - pos_p[both], axis=-1)
    check("track position parity", both.sum() >= K // 2 and d.max() < 0.05,
          f"(n={both.sum()}, max={d.max():.4f} px)")
    # axis=-1 (NOT positional: np.linalg.norm's third positional arg is
    # ord — ord=-1 on an (n, 2) matrix is the min column absolute sum,
    # which summed 59 per-point errors into one 0.56 "median" and made
    # this check fail spuriously since it landed).
    flow_err = np.linalg.norm(
        (pos_p[both] - np.asarray(pts)[both]) - np.array([-dx, -dy]),
        axis=-1)
    check("track recovers shift", np.median(flow_err) < 0.1,
          f"(median={np.median(flow_err):.4f} px)")

    # --- pack 1 vs 4: pure-scheduling claim must hold bit-exactly ------
    o1 = jax.jit(lambda a, b, p, m: lk_pallas.track_pyramidal(
        a, b, p, m, params, 1))(pyr0, pyr1, pts, act)
    o4 = jax.jit(lambda a, b, p, m: lk_pallas.track_pyramidal(
        a, b, p, m, params, 4))(pyr0, pyr1, pts, act)
    check("track pack1==pack4 bits",
          all(np.array_equal(np.asarray(a), np.asarray(b))
              for a, b in zip(o1, o4)))

    # --- template extract + refine (anchor path) -----------------------
    ex1 = jax.jit(lambda i, c: lk_pallas._extract_patches(i, c, 21, 1))(
        jnp.asarray(img0), pts)
    ex4 = jax.jit(lambda i, c: lk_pallas._extract_patches(i, c, 21, 4))(
        jnp.asarray(img0), pts)
    check("extract pack1==pack4 bits",
          all(np.array_equal(np.asarray(a), np.asarray(b))
              for a, b in zip(ex1, ex4)))
    r1 = jax.jit(lambda i, t, gx, gy, p, m: lk_pallas._refine_template(
        i, t, gx, gy, p, m, 21, 8, 0.01, 4.0, n_pack=1))(
            jnp.asarray(img1), *ex1, pts, act)
    r4 = jax.jit(lambda i, t, gx, gy, p, m: lk_pallas._refine_template(
        i, t, gx, gy, p, m, 21, 8, 0.01, 4.0, n_pack=4))(
            jnp.asarray(img1), *ex4, pts, act)
    check("refine pack1==pack4 bits",
          all(np.array_equal(np.asarray(a), np.asarray(b))
              for a, b in zip(r1, r4)))
    rpos, rok = np.asarray(r1[0]), np.asarray(r1[1])
    rerr = np.linalg.norm(
        (rpos[rok] - np.asarray(pts)[rok]) - np.array([-dx, -dy]),
        axis=-1)
    check("refine recovers shift", rok.sum() >= K // 2
          and np.median(rerr) < 0.15,
          f"(n={rok.sum()}, median={np.median(rerr):.4f} px)")

    # --- donated-state rebuild (serving recovery) on real silicon ------
    # Donation is a no-op on CPU, so only this tier executes the failure
    # mode fixed in vio_engine._rebuild_estimator / serving._recover: the
    # chunked step donates its carry (engine/chunked.py donate_argnums)
    # and the td-preserving rebuild then read state.td off a dead buffer
    # (INVALID_ARGUMENT at the next host read, adversarial level 1).
    from tests.test_serving_recovery import donate_away, small_cfg
    from mobile_slam_tpu.engine.vio_engine import VIOEngine

    eng = VIOEngine(small_cfg(), jnp.float32)
    eng.state = eng.state._replace(td=jnp.asarray(0.0123, jnp.float32))
    _ = donate_away(eng.state)
    try:
        eng._rebuild_estimator()
        fc = int(eng.state.frame_count)
        td = float(eng.state.td)
        check("donated-state rebuild", fc == 0 and np.isfinite(td),
              f"(frame_count={fc}, td={td})")
    except Exception as e:  # noqa: BLE001 - any raise is the regression
        check("donated-state rebuild", False, f"raised {type(e).__name__}")

    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all on-chip parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
