"""eskf_fused must agree with eskf: same algebra, elementwise-only graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legkilo_tpu.core import eskf, eskf_fused as ef
from legkilo_tpu.core.state import DIM_STATE, State, make_state


def rand_state(rng, batch=()):
    from scipy.spatial.transform import Rotation

    n = int(np.prod(batch)) if batch else 1
    rots = Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)
    rot = jnp.asarray(rots.reshape(batch + (3, 3)) if batch else rots[0])
    lin = jnp.asarray(rng.normal(size=batch + (27,)).astype(np.float32) * 0.5)
    return State(rot=rot, lin=lin)


def rand_cov(rng, batch=()):
    a = rng.normal(size=batch + (DIM_STATE, DIM_STATE)).astype(np.float32) * 0.05
    cov = a @ np.swapaxes(a, -1, -2) + 0.1 * np.eye(DIM_STATE, dtype=np.float32)
    return jnp.asarray(cov)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def tree_close(a, b, atol):
    np.testing.assert_allclose(np.asarray(a.rot), np.asarray(b.rot), atol=atol)
    np.testing.assert_allclose(np.asarray(a.lin), np.asarray(b.lin), atol=atol)


def test_inv18_matches_numpy(rng):
    a = rng.normal(size=(18, 18)).astype(np.float32)
    m = a @ a.T + 18 * np.eye(18, dtype=np.float32)
    got = np.asarray(ef.inv18(jnp.asarray(m)))
    np.testing.assert_allclose(got, np.linalg.inv(m), atol=2e-4)


def test_predict_matches(rng):
    st, cov = rand_state(rng), rand_cov(rng)
    q = jnp.asarray(np.abs(rng.normal(size=(30,))).astype(np.float32))
    s1, c1 = eskf.predict(st, cov, q, 0.004, 0.007)
    s2, c2 = ef.predict(st, cov, q, 0.004, 0.007)
    tree_close(s1, s2, 1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_predict_zero_dt_is_identity(rng):
    st, cov = rand_state(rng), rand_cov(rng)
    q = jnp.asarray(np.abs(rng.normal(size=(30,))).astype(np.float32))
    s2, c2 = ef.predict(st, cov, q, 0.0, 0.0)
    tree_close(st, s2, 1e-7)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(c2), atol=1e-6)


def test_update_by_imu_matches(rng):
    st, cov = rand_state(rng), rand_cov(rng)
    z6 = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.1)
    r6 = jnp.asarray(np.abs(rng.normal(size=(6,))).astype(np.float32) + 0.05)
    s1, c1 = eskf.update_by_imu(st, cov, z6, r6)
    s2, c2 = ef.update_by_imu(st, cov, z6, r6)
    tree_close(s1, s2, 1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-4)


def test_update_by_kin_imu_matches(rng):
    from legkilo_tpu.config import Config

    st, cov = rand_state(rng), rand_cov(rng)
    noise = eskf.make_noise_params(Config().eskf)
    acc = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    gyr = jnp.asarray(rng.normal(size=(3,)).astype(np.float32) * 0.2)
    fp = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32) * 0.3)
    fv = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32) * 0.1)
    ct = jnp.asarray([True, False, True, True])
    g = jnp.asarray(1.02, dtype=jnp.float32)

    h1, z1, r1, m1 = eskf.build_kin_obs(st, acc, gyr, fp, fv, ct, noise, g)
    h2, z2, r2, m2 = ef.build_kin_obs(st, acc, gyr, fp, fv, ct, noise, g)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    s1, c1 = eskf.update_by_kin_imu(st, cov, h1, z1, r1)
    s2, c2 = ef.update_by_kin_imu(st, cov, h2, z2, r2)
    tree_close(s1, s2, 2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-4)


def test_point_update_from_stats_matches_direct(rng):
    """Sufficient-statistic normal equations == direct h/z computation."""
    st, cov = rand_state(rng), rand_cov(rng)
    nb, p = 4, 32
    p_i = jnp.asarray(rng.normal(size=(nb, p, 3)).astype(np.float32) * 5.0)
    n_raw = rng.normal(size=(nb, p, 3)).astype(np.float32)
    normal = jnp.asarray(n_raw / np.linalg.norm(n_raw, axis=-1, keepdims=True))
    center = jnp.asarray(rng.normal(size=(nb, p, 3)).astype(np.float32) * 5.0)
    r = jnp.asarray(np.abs(rng.normal(size=(nb, p))).astype(np.float32) * 0.01)
    matched = jnp.asarray(rng.random(size=(nb, p)) < 0.7)

    s40 = ef.point_suffstats(p_i, normal, center, r, matched)

    for b in range(nb):
        # Direct path: h6/z exactly as _chain_jax builds them.
        rt_n = normal[b] @ st.rot
        cr_u = jnp.cross(p_i[b], rt_n)
        h6 = jnp.concatenate([cr_u, normal[b]], axis=-1)
        p_w = p_i[b] @ st.rot.T + st.pos
        z = -jnp.sum(normal[b] * (p_w - center[b]), axis=-1)
        s_ref, c_ref = eskf.update_by_points(st, cov, h6, z, r[b], matched[b])

        s_got, c_got = ef.point_update_from_stats(st, cov, s40[b])
        tree_close(s_ref, s_got, 5e-4)
        np.testing.assert_allclose(
            np.asarray(c_ref), np.asarray(c_got), atol=5e-3
        )


def test_point_update_empty_bucket_noop(rng):
    st, cov = rand_state(rng), rand_cov(rng)
    s40 = jnp.zeros((ef.N_FEAT, ef.N_FEAT), dtype=jnp.float32)
    s2, c2 = ef.point_update_from_stats(st, cov, s40)
    tree_close(st, s2, 0.0)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(c2), atol=0.0)


def test_hinted_insert_tracks_unhinted():
    """Probe-reusing insertion (predicted-pose voxel keys) must stay on the
    same trajectory as the exact re-probe path."""
    from legkilo_tpu.config import Config
    from legkilo_tpu.models import sim
    from legkilo_tpu.runner import run_offline

    data = sim.simulate(sim.SimConfig(duration=3.0, scan_points=2000, seed=9))

    def run(reuse):
        cfg = Config()
        cfg.only_imu_use = True
        cfg.lidar.filter_num = 1
        cfg.lidar.blind = 0.3
        cfg.lidar.voxel_grid_resolution = 0.4
        cfg.voxel_map.capacity_log2 = 13
        cfg.tpu.max_buckets = 56
        cfg.tpu.max_points_per_bucket = 96
        cfg.tpu.max_imu_per_bucket = 3
        cfg.tpu.pipeline = "deferred"
        cfg.tpu.chain_impl = "fused"
        cfg.tpu.insert_reuse_probe = reuse
        res = run_offline(cfg, data.scans, data.imu)
        return np.stack([r.pos for r in res])

    ph = run(True)
    pe = run(False)
    n = min(len(ph), len(pe))
    diff = np.linalg.norm(ph[:n] - pe[:n], axis=-1)
    assert diff.max() < 0.02, f"hinted-insert divergence {diff.max():.4f} m"


def test_fused_chain_matches_jax_chain():
    """End-to-end: chain_impl='fused' tracks chain_impl='jax' closely."""
    from legkilo_tpu.config import Config
    from legkilo_tpu.models import sim
    from legkilo_tpu.runner import run_offline

    data = sim.simulate(sim.SimConfig(duration=3.0, scan_points=2000, seed=5))

    def run(chain_impl, use_kin):
        cfg = Config()
        cfg.only_imu_use = not use_kin
        cfg.lidar.filter_num = 1
        cfg.lidar.blind = 0.3
        cfg.lidar.voxel_grid_resolution = 0.4
        cfg.voxel_map.capacity_log2 = 13
        cfg.tpu.max_buckets = 56
        cfg.tpu.max_points_per_bucket = 96
        cfg.tpu.max_imu_per_bucket = 3
        cfg.tpu.pipeline = "deferred"
        cfg.tpu.chain_impl = chain_impl
        events = data.kin if use_kin else data.imu
        res = run_offline(cfg, data.scans, events)
        return np.stack([r.pos for r in res])

    for use_kin in (False, True):
        ps = run("jax", use_kin)
        pf = run("fused", use_kin)
        n = min(len(ps), len(pf))
        diff = np.linalg.norm(ps[:n] - pf[:n], axis=-1)
        assert diff.max() < 0.02, f"kin={use_kin} divergence {diff.max():.4f} m"
