"""Rebuild-and-continue recovery vs buffer donation.

The chunked serving path donates its scan carry to the device program
(engine/chunked.py ``donate_argnums=(0,)``), which invalidates every array
the carry was built from — including ``VIOEngine.state``, whose buffers
entered the first chunk call. On CPU donation is a no-op, so only the real
chip ever saw the failure mode these tests pin: the td-preserving
estimator rebuild (vio_engine.cpp:188-207 analog) reading ``state.td``
off a donated buffer and poisoning the fresh state with it (observed as
``INVALID_ARGUMENT: TPU backend error`` on the next host read at
adversarial level 1, first recovery).

The mechanics are testable backend-independently: ``_recover`` must
refresh ``engine.state`` from the live chunk carry (the last step's
OUTPUT, which is valid) before rebuilding, and ``_rebuild_estimator``
must fetch td to host defensively. tests/onchip_parity.py additionally
executes the donation itself on silicon.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import chunked, estimator as est
from mobile_slam_tpu.engine.serving import ChunkedImageServer
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])


def small_cfg():
    cam = CameraConfig(
        model_type="KANNALA_BRANDT", width=512, height=512,
        focal_length=190.97847715128717,
        fx=190.97847715128717, fy=190.9733070521226,
        cx=254.93170605935475, cy=256.8974428996504,
        dist=(0.0034823894022493434, 0.0007150348452162257,
              -0.0020532361418706202, 0.00020293673591811182),
        r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.045, 0.073, -0.044),
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=60, max_points=64, fisheye=True),
        estimator=EstimatorConfig(
            max_features=128, max_imu_per_interval=8, num_iterations=2,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
            estimate_td=True, td_init=0.0,
        ),
    )


def donate_away(state):
    """Donate the state buffers the rebuild path reads (td, frame_count)
    through an identity jit, mimicking what the chunked step does to its
    whole input carry. On TPU this invalidates those buffers; on CPU it is
    a no-op — either way the caller's references now point at 'used'
    inputs. (Donating the full tree in one call trips 'donate the same
    buffer twice': init_state's identical zero-filled leaves share
    device buffers.)"""
    f32 = jax.jit(lambda x: x + 0, donate_argnums=0)
    i32 = jax.jit(lambda x: x + 0, donate_argnums=0)
    f32(state.td)
    i32(state.frame_count)


def test_rebuild_survives_donated_state():
    """_rebuild_estimator must never raise (or keep a dead buffer) when
    the current state was donated to a chunk program."""
    eng = VIOEngine(small_cfg(), jnp.float32)
    eng.state = eng.state._replace(td=jnp.asarray(0.0123, jnp.float32))
    _ = donate_away(eng.state)   # eng.state now references donated inputs
    eng._rebuild_estimator()
    # Every field of the fresh state must be host-readable.
    assert int(eng.state.frame_count) == 0
    td = float(eng.state.td)
    # CPU keeps the donated buffer readable -> learned td survives; a
    # backend that really invalidates it must fall back to td_init. Both
    # are finite, valid states (the learned value is best-effort).
    assert np.isfinite(td)
    assert min(abs(td - 0.0123), abs(td - 0.0)) < 1e-6
    assert eng.status == Status.INITIALIZING


def test_rebuild_discards_nan_td():
    """A NaN-diverged tail carries td=NaN; float(NaN) succeeds, so without
    an explicit finiteness check the rebuild seeds the fresh state with a
    poisoned td that re-enters every observation residual after re-init —
    making the failure permanent. The rebuild must fall back to td_init."""
    eng = VIOEngine(small_cfg(), jnp.float32)
    eng.state = eng.state._replace(td=jnp.asarray(float("nan"), jnp.float32))
    eng._rebuild_estimator()
    assert float(eng.state.td) == pytest.approx(
        float(eng.cfg.estimator.td_init), abs=1e-9)
    assert eng.status == Status.INITIALIZING


def test_recover_refreshes_state_from_carry():
    """serving._recover must adopt the live carry's est_state (the chunk
    output) so the rebuild reads td from a valid buffer — and the learned
    td must survive the recovery."""
    cfg = small_cfg()
    server = ChunkedImageServer(cfg, jnp.float32, chunk_size=4)
    eng = server.engine
    # Fabricate a post-chunk world: the live carry holds the current
    # estimator state with a learned td; the engine's own state reference
    # is stale (was donated into the first chunk call).
    live_state = eng.state._replace(td=jnp.asarray(0.0077, jnp.float32))
    server._carry = chunked.ImageChunkCarry(
        est_state=live_state, tracker_state=eng.tracker_state,
        banned_ids=eng._banned_ids, key=eng._key,
        depth_ema=jnp.asarray(1.0, jnp.float32),
        vel_ema=jnp.asarray(0.3, jnp.float32),
    )
    stale = eng.state
    _ = donate_away(stale)
    server._mode = "chunked"
    server._recover()

    assert server.mode == "stream"
    assert server.n_recoveries == 1
    assert eng.status == Status.INITIALIZING
    assert int(eng.state.frame_count) == 0
    assert float(eng.state.td) == pytest.approx(0.0077, abs=1e-7)


def test_growth_gate_detects_compounding_runaway():
    """In-scan lagged-ratio detector (engine/chunked.growth_gate): a
    compounding ~2%/frame joint depth+velocity inflation (the bad-init
    signature from the level-1 adversarial probe) must trip within the
    ring window, while a depth-only viewpoint change must not."""
    L = chunked.GROWTH_WINDOW
    d = jnp.full((L,), 3.0, jnp.float32)
    v = jnp.full((L,), 1.0, jnp.float32)
    i = jnp.asarray(0, jnp.int32)

    # Compounding runaway: depth and velocity both grow 2.3%/frame.
    depth, vel = 3.0, 1.0
    tripped_at = None
    for k in range(3 * L):
        depth *= 1.023
        vel *= 1.023
        d, v, i, g = chunked.growth_gate(
            d, v, i, jnp.asarray(depth, jnp.float32),
            jnp.asarray(vel, jnp.float32))
        if bool(g):
            tripped_at = k
            break
    assert tripped_at is not None and tripped_at < 2 * L

    # Depth-only change (legit viewpoint shift): never trips.
    d = jnp.full((L,), 3.0, jnp.float32)
    v = jnp.full((L,), 1.0, jnp.float32)
    i = jnp.asarray(0, jnp.int32)
    depth = 3.0
    for k in range(3 * L):
        depth *= 1.03
        d, v, i, g = chunked.growth_gate(
            d, v, i, jnp.asarray(depth, jnp.float32),
            jnp.asarray(1.0, jnp.float32))
        assert not bool(g)

    # Steady state: no trip.
    d = jnp.full((L,), 3.0, jnp.float32)
    v = jnp.full((L,), 1.0, jnp.float32)
    i = jnp.asarray(0, jnp.int32)
    for k in range(2 * L):
        d, v, i, g = chunked.growth_gate(
            d, v, i, jnp.asarray(3.2, jnp.float32),
            jnp.asarray(1.1, jnp.float32))
        assert not bool(g)


def test_growth_gate_ignores_acceleration_from_hover():
    """Legit motion (ADVICE r4): accelerating from a standstill toward open
    space — vel 0.02 -> 1.0 m/s over one lag window while depth grows ~2%/
    frame, then cruise. With the old max(lagv, floor) ratio this held the
    gate for a sustained stretch and forced a rebuild of a healthy state;
    requiring the lagged baseline itself to be moving must not trip."""
    L = chunked.GROWTH_WINDOW
    d = jnp.full((L,), 2.0, jnp.float32)
    v = jnp.full((L,), 0.02, jnp.float32)
    i = jnp.asarray(0, jnp.int32)
    depth, vel = 2.0, 0.02
    for k in range(3 * L):
        if k < L:                      # acceleration phase
            depth *= 1.02
            vel = min(1.0, vel + (1.0 - 0.02) / L)
        d, v, i, g = chunked.growth_gate(
            d, v, i, jnp.asarray(depth, jnp.float32),
            jnp.asarray(vel, jnp.float32))
        assert not bool(g), f"false positive at frame {k}"
