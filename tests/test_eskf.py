"""ESKF predict/update algebra vs the float64 reference oracle (SURVEY.md §4a).

Every test builds a random-but-plausible filter state, runs the reference
formulas in NumPy float64 (tests/oracle.py) and the TPU-native JAX float32
implementation, and compares within f32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from legkilo_tpu.config import EskfConfig
from legkilo_tpu.core import eskf
from legkilo_tpu.core.state import State, boxplus, boxminus, make_state
import oracle


def random_state(rng, speed=1.0):
    s = oracle.OracleState()
    s.rot = oracle.exp_so3(rng.normal(size=3))
    s.pos = rng.normal(size=3) * 5
    s.vel = rng.normal(size=3) * speed
    s.ba = rng.normal(size=3) * 0.05
    s.bw = rng.normal(size=3) * 0.01
    s.grav = np.array([0.1, -0.2, -9.79])
    s.imu_a = rng.normal(size=3) * 2
    s.imu_w = rng.normal(size=3) * 1.5
    s.bv = rng.normal(size=3) * 0.01
    s.contact = rng.normal(size=3) * 0.1
    return s


def to_jax(s: oracle.OracleState) -> State:
    lin = np.concatenate(
        [s.pos, s.vel, s.ba, s.bw, s.grav, s.imu_a, s.imu_w, s.bv, s.contact]
    )
    return State(
        rot=jnp.asarray(s.rot, dtype=jnp.float32), lin=jnp.asarray(lin, dtype=jnp.float32)
    )


def random_cov(rng, scale=1e-2):
    a = rng.normal(size=(30, 30)) * scale
    return a @ a.T + 1e-4 * np.eye(30)


def assert_state_close(js: State, os_: oracle.OracleState, atol=2e-4):
    np.testing.assert_allclose(np.asarray(js.rot), os_.rot, atol=atol)
    np.testing.assert_allclose(np.asarray(js.pos), os_.pos, atol=atol)
    np.testing.assert_allclose(np.asarray(js.vel), os_.vel, atol=atol)
    np.testing.assert_allclose(np.asarray(js.imu_a), os_.imu_a, atol=atol)


def test_boxplus_boxminus_roundtrip(rng):
    s = random_state(rng)
    js = to_jax(s)
    delta = rng.normal(size=30).astype(np.float32) * 0.1
    s2 = s.copy()
    s2.boxplus(delta.astype(np.float64))
    js2 = boxplus(js, jnp.asarray(delta))
    assert_state_close(js2, s2)
    back = np.asarray(boxminus(js2, js))
    np.testing.assert_allclose(back, delta, atol=1e-5)


def test_default_state():
    js = make_state()
    assert np.allclose(np.asarray(js.rot), np.eye(3))
    assert np.allclose(np.asarray(js.grav), [0, 0, -9.81])


def test_predict_matches_oracle(rng):
    cfg = EskfConfig()
    noise = eskf.make_noise_params(cfg)
    q_diag = np.zeros(30)
    q_diag[6:9] = cfg.vel_process_cov
    q_diag[9:12] = cfg.acc_bias_process_cov
    q_diag[12:15] = cfg.gyr_bias_process_cov
    q_diag[18:21] = cfg.imu_acc_process_cov
    q_diag[21:24] = cfg.imu_gyr_process_cov
    q_diag[24:27] = cfg.kin_bias_process_cov
    q_diag[27:30] = cfg.contact_process_cov
    np.testing.assert_allclose(np.asarray(noise.q_diag), q_diag)

    s = random_state(rng)
    cov = random_cov(rng)
    dt_mean, dt_cov = 0.002, 0.006
    js0 = to_jax(s)

    # Oracle: cov with dt_cov using pre-update state, then mean with dt_mean
    # (KILO.cc:110-115 call pattern).
    ocov = oracle.predict(s, cov, q_diag, dt_cov, prop_state=False, prop_cov=True)
    oracle.predict(s, ocov, q_diag, dt_mean, prop_state=True, prop_cov=False)

    js, jcov = eskf.predict(
        js0,
        jnp.asarray(cov, dtype=jnp.float32),
        noise.q_diag,
        jnp.float32(dt_mean),
        jnp.float32(dt_cov),
    )
    assert_state_close(js, s)
    np.testing.assert_allclose(np.asarray(jcov), ocov, atol=2e-3)


def test_update_by_points_matches_oracle(rng):
    s = random_state(rng)
    cov = random_cov(rng)
    n = 17
    h6 = rng.normal(size=(n, 6))
    z = rng.normal(size=n) * 0.05
    r = rng.uniform(0.01, 0.5, size=n)

    s_o = s.copy()
    ocov = oracle.update_by_points(s_o, cov, h6, z, r)

    js, jcov = eskf.update_by_points(
        to_jax(s),
        jnp.asarray(cov, dtype=jnp.float32),
        jnp.asarray(h6, dtype=jnp.float32),
        jnp.asarray(z, dtype=jnp.float32),
        jnp.asarray(r, dtype=jnp.float32),
        jnp.ones(n, dtype=bool),
    )
    assert_state_close(js, s_o, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jcov), ocov, atol=2e-3)


def test_update_by_points_single_row_matches_reference_fast_path(rng):
    """The N==1 case must equal the reference rank-1 path incl. 1e-4 jitter."""
    s = random_state(rng)
    cov = random_cov(rng)
    h = rng.normal(size=6)
    z, r = 0.03, 0.2

    # Reference eskf.cc:98-104 exactly.
    pht = cov[:, 0:6] @ h
    gain = 1.0 / (1e-4 + h @ pht[0:6] + r)
    K = gain * pht
    s_o = s.copy()
    s_o.boxplus(K * z)
    ocov = cov - np.outer(K, h) @ cov[0:6, :]

    js, jcov = eskf.update_by_points(
        to_jax(s),
        jnp.asarray(cov, dtype=jnp.float32),
        jnp.asarray(h[None, :], dtype=jnp.float32),
        jnp.asarray([z], dtype=jnp.float32),
        jnp.asarray([r], dtype=jnp.float32),
        jnp.ones(1, dtype=bool),
    )
    assert_state_close(js, s_o, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jcov), ocov, atol=2e-3)


def test_update_by_points_masking(rng):
    """Padded rows with mask=0 must reproduce the unpadded result exactly."""
    s = random_state(rng)
    cov = random_cov(rng)
    n, pad = 9, 32
    h6 = rng.normal(size=(pad, 6))
    z = rng.normal(size=pad)
    r = rng.uniform(0.01, 0.5, size=pad)
    mask = np.zeros(pad, dtype=bool)
    mask[:n] = True

    js_a, jcov_a = eskf.update_by_points(
        to_jax(s),
        jnp.asarray(cov, dtype=jnp.float32),
        jnp.asarray(h6, dtype=jnp.float32),
        jnp.asarray(z, dtype=jnp.float32),
        jnp.asarray(r, dtype=jnp.float32),
        jnp.asarray(mask),
    )
    js_b, jcov_b = eskf.update_by_points(
        to_jax(s),
        jnp.asarray(cov, dtype=jnp.float32),
        jnp.asarray(h6[:n], dtype=jnp.float32),
        jnp.asarray(z[:n], dtype=jnp.float32),
        jnp.asarray(r[:n], dtype=jnp.float32),
        jnp.ones(n, dtype=bool),
    )
    np.testing.assert_allclose(np.asarray(js_a.lin), np.asarray(js_b.lin), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jcov_a), np.asarray(jcov_b), atol=1e-6)


def test_update_by_points_empty_is_noop(rng):
    s = random_state(rng)
    cov = random_cov(rng)
    js, jcov = eskf.update_by_points(
        to_jax(s),
        jnp.asarray(cov, dtype=jnp.float32),
        jnp.zeros((8, 6), dtype=jnp.float32),
        jnp.zeros(8, dtype=jnp.float32),
        jnp.ones(8, dtype=jnp.float32),
        jnp.zeros(8, dtype=bool),
    )
    np.testing.assert_allclose(np.asarray(jcov), cov.astype(np.float32), atol=1e-7)
    np.testing.assert_allclose(np.asarray(js.rot), s.rot, atol=1e-6)


def test_update_by_imu_matches_oracle(rng):
    cfg = EskfConfig()
    s = random_state(rng)
    cov = random_cov(rng)
    acc = rng.normal(size=3) + np.array([0, 0, 9.8])
    gyr = rng.normal(size=3)
    g_over_an = 9.81 / 9.79

    z6_o = np.concatenate([g_over_an * acc - s.imu_a - s.ba, gyr - s.imu_w - s.bw])
    r6 = np.array(
        [
            cfg.imu_acc_meas_noise,
            cfg.imu_acc_meas_noise,
            cfg.imu_acc_z_meas_noise,
            cfg.imu_gyr_meas_noise,
            cfg.imu_gyr_meas_noise,
            cfg.imu_gyr_meas_noise,
        ]
    )
    s_o = s.copy()
    ocov = oracle.update_by_imu(s_o, cov, z6_o, r6)

    js = to_jax(s)
    z6 = eskf.imu_innovation(
        js, jnp.asarray(acc, dtype=jnp.float32), jnp.asarray(gyr, dtype=jnp.float32),
        jnp.float32(g_over_an),
    )
    np.testing.assert_allclose(np.asarray(z6), z6_o, atol=1e-4)
    js2, jcov = eskf.update_by_imu(
        js, jnp.asarray(cov, dtype=jnp.float32), z6, jnp.asarray(r6, dtype=jnp.float32)
    )
    assert_state_close(js2, s_o, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jcov), ocov, atol=2e-3)


def test_update_by_kin_imu_matches_oracle(rng):
    cfg = EskfConfig()
    noise = eskf.make_noise_params(cfg)
    s = random_state(rng)
    cov = random_cov(rng)
    acc = rng.normal(size=3) + np.array([0, 0, 9.8])
    gyr = rng.normal(size=3)
    foot_pos = rng.normal(size=(4, 3)) * 0.3
    foot_vel = rng.normal(size=(4, 3)) * 0.2
    contact = np.array([True, False, True, True])
    g_over_an = 9.81 / 9.77

    h_o, z_o, r_o = oracle.build_kin_obs(
        s, acc, gyr, foot_pos, foot_vel, contact, cfg, g_over_an
    )
    s_o = s.copy()
    ocov = oracle.update_by_kin_imu(s_o, cov, h_o, z_o, r_o)

    js = to_jax(s)
    h, z, r, mask = eskf.build_kin_obs(
        js,
        jnp.asarray(acc, dtype=jnp.float32),
        jnp.asarray(gyr, dtype=jnp.float32),
        jnp.asarray(foot_pos, dtype=jnp.float32),
        jnp.asarray(foot_vel, dtype=jnp.float32),
        jnp.asarray(contact),
        noise,
        jnp.float32(g_over_an),
    )
    js2, jcov = eskf.update_by_kin_imu(js, jnp.asarray(cov, dtype=jnp.float32), h, z, r)
    assert_state_close(js2, s_o, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jcov), ocov, atol=3e-3)


def test_kin_imu_inv18_equals_solve_path(rng):
    """The closed-form inv18 gain must equal the generic solve gain.

    update_by_kin_imu replaced jnp.linalg.solve with eskf_fused.inv18
    (solve lowers to unfusable LU loops on TPU); this pins the two
    algebraic routes to each other on the exact innovation system the
    update builds (SPD: H P H^T + diag(R))."""
    from legkilo_tpu.core.eskf_fused import inv18

    cfg = EskfConfig()
    noise = eskf.make_noise_params(cfg)
    for contact in (
        np.array([True, False, True, True]),
        np.array([False, False, False, False]),
        np.array([True, True, True, True]),
    ):
        s = random_state(rng)
        cov = random_cov(rng)
        js = to_jax(s)
        h, z, r, _ = eskf.build_kin_obs(
            js,
            jnp.asarray(rng.normal(size=3) + np.array([0, 0, 9.8]), dtype=jnp.float32),
            jnp.asarray(rng.normal(size=3), dtype=jnp.float32),
            jnp.asarray(rng.normal(size=(4, 3)) * 0.3, dtype=jnp.float32),
            jnp.asarray(rng.normal(size=(4, 3)) * 0.2, dtype=jnp.float32),
            jnp.asarray(contact),
            noise,
            jnp.float32(1.004),
        )
        jcov = jnp.asarray(cov, dtype=jnp.float32)
        pht = jcov @ h.T
        svar = h @ pht + jnp.diag(r)
        k_closed = np.asarray(pht @ inv18(svar))
        k_solve = np.asarray(
            jnp.linalg.solve(svar.T, pht.T).T
        )
        np.testing.assert_allclose(k_closed, k_solve, atol=2e-4)
        # and the full update stays pinned to the float64 oracle route
        s2, c2 = eskf.update_by_kin_imu(js, jcov, h, z, r)
        assert np.isfinite(np.asarray(c2)).all()


def test_batched_predict_update_vmap(rng):
    """Batched leading axis must agree with per-item results (replica axis)."""
    cfg = EskfConfig()
    noise = eskf.make_noise_params(cfg)
    B = 4
    states = [random_state(rng) for _ in range(B)]
    covs = [random_cov(rng) for _ in range(B)]

    jstates = State(
        rot=jnp.stack([to_jax(s).rot for s in states]),
        lin=jnp.stack([to_jax(s).lin for s in states]),
    )
    jcovs = jnp.stack([jnp.asarray(c, dtype=jnp.float32) for c in covs])

    step = jax.vmap(
        lambda st, cv: eskf.predict(st, cv, noise.q_diag, jnp.float32(0.002), jnp.float32(0.004))
    )
    bs, bc = step(jstates, jcovs)
    for i in range(B):
        ss, sc = eskf.predict(
            State(rot=jstates.rot[i], lin=jstates.lin[i]),
            jcovs[i],
            noise.q_diag,
            jnp.float32(0.002),
            jnp.float32(0.004),
        )
        np.testing.assert_allclose(np.asarray(bs.lin[i]), np.asarray(ss.lin), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bc[i]), np.asarray(sc), atol=1e-6)
