"""Quantify monocular-scale observability at a TRACKING state.

ROUND2_NOTES open lead (b): on some noise draws, ~1e-7-relative numeric
perturbations (dense vs restricted-support marginalization factorization)
move end-to-end ATE 10x, always through scale drift. This probe measures
WHY: the curvature (Rayleigh quotient d'Hd) of the windowed cost along the
global-scale direction, compared against gauge directions (yaw-about-
gravity, global translation: provably flat up to the prior) and against
well-observed directions — i.e. how close monocular scale sits to the
gauge group for this motion profile.

Scale direction in tangent space (p_i -> (1+e)(p_i - p_anchor),
v_i -> (1+e)v_i, depth_f -> (1+e)depth_f i.e. lam_f -> lam_f/(1+e)):
  dp_i = p_i - p_0, dtheta = 0, dv_i = v_i, dba = dbg = 0,
  dlam_f = -lam_f.
Visual factors are exactly invariant along it (projective); all scale
stiffness must come from the IMU factors (accelerometer excitation) and
the accumulated prior.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_scale_observability.py \
      [--cpu] [--seeds=4] [--duration=10]
"""

import os
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mobile_slam_tpu.engine import estimator as est_mod  # noqa: E402
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.models.state import eligible_mask  # noqa: E402
from mobile_slam_tpu.solver import assembly, layout  # noqa: E402
from mobile_slam_tpu.utils import rotations as rot  # noqa: E402

W = layout.W if hasattr(layout, "W") else 11


def arg(name, default):
    return next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


SEEDS = int(arg("seeds", "4"))
DURATION = float(arg("duration", "10"))


def tangent_dir_scale(x, elig):
    """Unit tangent along global scale (anchored at pose 0)."""
    dp = x.p - x.p[0]
    dv = x.v
    dlam = jnp.where(elig, -x.lam, 0.0)
    return pack_dir(dp, jnp.zeros((W, 3)), dv, dlam)


def tangent_dir_yaw(x, elig, g_world):
    """Gauge: rotation of the whole window about gravity at pose 0.

    The solver's rotation tangent is BODY-frame (retract is q ⊗ δq(dθ),
    lm.py:_retract / rotations.quat_boxplus), so the world-axis generator
    must be expressed in each body frame: dθ_i = R_i^T ax."""
    ax = g_world / (jnp.linalg.norm(g_world) + 1e-12)
    dp = jnp.cross(jnp.broadcast_to(ax, x.p.shape), x.p - x.p[0])
    r_wb = jax.vmap(rot.quat_to_rot)(x.q)                        # (W,3,3)
    dth = jnp.einsum("wij,i->wj", r_wb, ax)                      # R^T ax
    dv = jnp.cross(jnp.broadcast_to(ax, x.v.shape), x.v)
    return pack_dir(dp, dth, dv, jnp.zeros_like(x.lam))


def tangent_dir_trans(x, elig, axis):
    dp = jnp.broadcast_to(axis, x.p.shape)
    return pack_dir(dp, jnp.zeros((W, 3)), jnp.zeros((W, 3)),
                    jnp.zeros_like(x.lam))


def pack_dir(dp, dth, dv, dlam):
    dpose = jnp.concatenate([dp, dth], axis=-1).reshape(-1)      # 66
    dsb = jnp.concatenate(
        [dv, jnp.zeros((W, 3)), jnp.zeros((W, 3))], axis=-1).reshape(-1)
    ds = jnp.concatenate([dpose, dsb, jnp.zeros(6)])             # 171
    return ds, dlam


def rayleigh(eqs, ds, dlam, elig):
    """d' H d over the full (state + landmark) tangent."""
    dlam = jnp.where(elig, dlam, 0.0)
    n2 = jnp.sum(ds * ds) + jnp.sum(dlam * dlam)
    ds, dlam = ds / jnp.sqrt(n2), dlam / jnp.sqrt(n2)
    q = (ds @ eqs.H_ss @ ds + 2.0 * ds @ (eqs.H_sl @ dlam)
         + jnp.sum(eqs.H_ll * dlam * dlam))
    return float(q)


def main():
    cfg = bench.make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    print(f"device={jax.devices()[0]} seeds={SEEDS} dur={DURATION}s")
    rows = []
    for seed in range(SEEDS):
        scfg = sim.SimConfig(
            duration=DURATION, cam_rate=20.0, imu_rate=200.0,
            num_landmarks=900, max_features=150,
            acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
            acc_bias=(0.01, -0.005, 0.015),
            gyr_bias=(0.001, -0.0005, 0.0008), seed=100 + seed,
        )
        data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat,
                            cfg.camera.t_ic_vec)
        engine = VIOEngine(cfg, jnp.float32)
        imu_i = 0
        tracking_frames = 0
        for fi, ts in enumerate(data.cam_ts):
            while (imu_i < len(data.imu_ts)
                   and data.imu_ts[imu_i] <= ts + 1e-9):
                engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                                data.imu_gyr[imu_i])
                imu_i += 1
            f = data.frames[fi]
            r = engine.process_features(ts, f["ids"], f["rays"],
                                        uv=f["uv"], vel=f["vel"])
            if r.status == Status.TRACKING:
                tracking_frames += 1
                if tracking_frames >= 40:  # settled window + prior
                    break

        st = engine.state
        pp = engine.params
        sp = est_mod.solver_params(pp)
        wdw = st.window
        table = st.table
        elig = eligible_mask(table) & (table.depth > 0)
        safe_depth = jnp.where(table.depth > 0, table.depth, pp.init_depth)
        x0 = assembly.XState(
            p=wdw.p.astype(jnp.float64), q=wdw.q.astype(jnp.float64),
            v=wdw.v.astype(jnp.float64), ba=wdw.ba.astype(jnp.float64),
            bg=wdw.bg.astype(jnp.float64),
            lam=jnp.where(elig, 1.0 / safe_depth, 1.0).astype(jnp.float64),
            td=jnp.asarray(0.0, jnp.float64),
        )
        x0 = jax.tree.map(lambda a: a.astype(jnp.float64), x0)
        pre64 = jax.tree.map(lambda a: a.astype(jnp.float64)
                             if a.dtype == jnp.float32 else a, wdw.pre)
        prior64 = jax.tree.map(lambda a: a.astype(jnp.float64)
                               if a.dtype == jnp.float32 else a, st.prior)
        imu_sqrt_info = sqrt_info_from_cov(pre64.cov[1:])
        imu_valid = (pre64.sum_dt[1:] < 10.0) & (wdw.imu_cnt[1:] > 0)
        proj_valid = assembly.proj_valid_mask(table)
        prior_H0 = prior64.J0.T @ prior64.J0
        ex_t = pp.ex_t.astype(jnp.float64)
        ex_q = pp.ex_q.astype(jnp.float64)
        sp64 = jax.tree.map(lambda a: a.astype(jnp.float64)
                            if hasattr(a, "dtype")
                            and a.dtype == jnp.float32 else a, sp)

        def eqs_at(use_prior):
            return assembly.build_normal_eqs(
                x0, table, pre64, imu_sqrt_info, imu_valid, prior64,
                prior_H0, ex_t, ex_q, sp64, proj_valid,
                use_prior=use_prior)

        for use_prior, tag in ((True, "with-prior"), (False, "no-prior")):
            eqs = eqs_at(use_prior)
            g = pp.gravity.astype(jnp.float64)
            dirs = {
                "scale": tangent_dir_scale(x0, elig),
                "yaw(gauge)": tangent_dir_yaw(x0, elig, g),
                "trans-x(gauge)": tangent_dir_trans(
                    x0, elig, jnp.asarray([1.0, 0, 0])),
                "random": (jax.random.normal(jax.random.PRNGKey(seed),
                                             (layout.S,), jnp.float64),
                           jax.random.normal(jax.random.PRNGKey(seed + 99),
                                             x0.lam.shape, jnp.float64)),
            }
            quot = {k: rayleigh(eqs, *d, elig=elig)
                    for k, d in dirs.items()}
            h_diag_med = float(jnp.median(jnp.diag(eqs.H_ss)))
            row = dict(seed=100 + seed, prior=tag, **quot,
                       h_diag_median=h_diag_med)
            rows.append(row)
            print(f"seed={row['seed']} [{tag:10s}] "
                  f"scale={quot['scale']:.3e} yaw={quot['yaw(gauge)']:.3e} "
                  f"trans={quot['trans-x(gauge)']:.3e} "
                  f"random={quot['random']:.3e} "
                  f"(H diag median {h_diag_med:.2e})")

    print("\nInterpretation: scale within ~10-100x of the gauge directions "
          "=> effectively unobservable on this excitation; scale within "
          "~1e-4 of 'random' => soft but determined. The prior row shows "
          "how much scale stiffness the marginalized history contributes.")


if __name__ == "__main__":
    main()
