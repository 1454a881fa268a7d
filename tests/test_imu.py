"""IMU propagation tests: strapdown correctness, exact F/G, bias
observability structure — the north-star capability the reference lacks
(its imu_callback only logs, EKFVIO.cpp:113-115)."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core import filter as ekf, imu, lie

CFG = VIOConfig(max_features=8, use_imu=True)
G_W = jnp.array([0.0, 0.0, -9.81])  # world z-up

# jit once — the eager path retraces two jacfwds per call
_step = jax.jit(lambda s, smp: imu.propagate_imu_step(s, CFG, smp, G_W))


def rest_state():
    return ekf.init_state(CFG)


def stationary_sample(dt=0.005):
    # at rest: specific force = −g_w
    return imu.ImuSample(dt=jnp.float32(dt), gyro=jnp.zeros(3), accel=-G_W)


class TestStrapdown:
    def test_stationary_stays_put(self):
        s = rest_state()
        for _ in range(20):
            s = _step(s, stationary_sample())
        np.testing.assert_allclose(np.asarray(s.base_mu[0:3]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.base_mu[7:10]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.base_mu[3:7]), [1, 0, 0, 0],
                                   atol=1e-6)

    def test_constant_rotation_integrates(self):
        s = rest_state()
        w = jnp.array([0.0, 0.0, np.pi / 2])  # 90°/s yaw
        # while rotating (still no translation), specific force tracks
        # the body-frame gravity direction
        for _ in range(100):  # 0.5 s at 200 Hz
            q = s.base_mu[3:7]
            f = -lie.quat_rotate(lie.quat_conj(q), G_W)
            smp = imu.ImuSample(dt=jnp.float32(0.005), gyro=w, accel=f)
            s = _step(s, smp)
        # expect 45° about z
        expect = np.array([np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)])
        np.testing.assert_allclose(np.asarray(s.base_mu[3:7]), expect, atol=1e-3)
        np.testing.assert_allclose(np.asarray(s.base_mu[0:3]), 0.0, atol=1e-3)

    def test_constant_acceleration_integrates(self):
        s = rest_state()
        # accelerate +x at 1 m/s² for 1 s: v=1, p=0.5
        for _ in range(200):
            smp = imu.ImuSample(dt=jnp.float32(0.005),
                                gyro=jnp.zeros(3),
                                accel=jnp.array([1.0, 0, 0]) - G_W)
            s = _step(s, smp)
        np.testing.assert_allclose(float(s.base_mu[7]), 1.0, atol=5e-3)
        np.testing.assert_allclose(float(s.base_mu[0]), 0.5, atol=5e-3)

    def test_gyro_bias_is_compensated(self):
        s = rest_state()
        bias = jnp.array([0.02, -0.01, 0.03])
        s = s.replace(base_mu=s.base_mu.at[19:22].set(bias))
        # gyro reads bias while actually at rest
        for _ in range(50):
            smp = imu.ImuSample(dt=jnp.float32(0.005), gyro=bias, accel=-G_W)
            s = _step(s, smp)
        np.testing.assert_allclose(np.asarray(s.base_mu[3:7]), [1, 0, 0, 0],
                                   atol=1e-5)


class TestJacobians:
    def test_F_couples_biases(self):
        """Gyro-bias columns must influence orientation — the coupling the
        reference's identity bias rows lack."""
        s = rest_state()
        smp = stationary_sample()
        Fb = imu._jac_base_imu(s.base_mu, smp.gyro, smp.accel, smp.dt, G_W)
        # dq/db_g block nonzero
        assert np.abs(np.asarray(Fb[3:7, 19:22])).max() > 1e-4
        # dv/db_a block nonzero
        assert np.abs(np.asarray(Fb[7:10, 16:19])).max() > 1e-4

    def test_F_matches_numeric(self):
        s = rest_state()
        mu = s.base_mu.at[7:10].set(jnp.array([0.3, -0.2, 0.1]))
        mu = mu.at[3:7].set(lie.quat_normalize(jnp.array([0.9, 0.1, -0.2, 0.3])))
        gyro = jnp.array([0.1, 0.2, -0.1])
        accel = jnp.array([0.5, -9.0, 1.0])
        dt = jnp.float32(0.005)
        Fb = np.asarray(imu._jac_base_imu(mu, gyro, accel, dt, G_W))

        d = 1e-3
        eye = jnp.eye(22) * d
        hi = jax.vmap(lambda e: imu.convolve_base_imu(mu + e, gyro, accel, dt, G_W))(eye)
        lo = jax.vmap(lambda e: imu.convolve_base_imu(mu - e, gyro, accel, dt, G_W))(eye)
        Fn = np.asarray((hi - lo).T / (2 * d))
        np.testing.assert_allclose(Fb, Fn, atol=2e-3)

    def test_G_structure(self):
        s = rest_state()
        smp = stationary_sample()
        G = np.asarray(imu._jac_noise(s.base_mu, smp.gyro, smp.accel,
                                      jnp.zeros(12), smp.dt, G_W))
        assert G.shape == (22, 12)
        # gyro noise reaches orientation; accel noise reaches velocity
        assert np.abs(G[3:7, 0:3]).max() > 1e-4
        assert np.abs(G[7:10, 3:6]).max() > 1e-4
        # bias walks reach the bias states
        assert np.abs(G[19:22, 6:9]).max() > 1e-4
        assert np.abs(G[16:19, 9:12]).max() > 1e-4


class TestCovariance:
    def test_uncertainty_grows_without_measurements(self):
        s = rest_state()
        # anchor released: position uncertainty must grow under IMU noise
        d0 = float(jnp.diag(s.Sigma)[7])
        for _ in range(40):
            s = _step(s, stationary_sample())
        min_diag, asym = ekf.check_sigma(s)
        assert float(min_diag) >= -1e-6
        assert float(asym) < 1e-3
        assert float(jnp.diag(s.Sigma)[0]) > 0.0  # position picked up noise

    def test_batch_scan_matches_loop(self):
        s0 = rest_state()
        k = 10
        batch = imu.ImuSample(
            dt=jnp.full((k,), 0.005, jnp.float32),
            gyro=jnp.tile(jnp.array([0.05, 0.0, 0.1]), (k, 1)),
            accel=jnp.tile(-G_W, (k, 1)),
        )
        s_scan = imu.propagate_imu_batch(s0, CFG, batch, G_W)
        s_loop = s0
        for i in range(k):
            s_loop = imu.propagate_imu_step(
                s_loop, CFG,
                imu.ImuSample(batch.dt[i], batch.gyro[i], batch.accel[i]), G_W)
        np.testing.assert_allclose(np.asarray(s_scan.base_mu),
                                   np.asarray(s_loop.base_mu), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_scan.Sigma),
                                   np.asarray(s_loop.Sigma), rtol=1e-5, atol=1e-6)

    def test_padded_rows_are_noops(self):
        s0 = rest_state()
        k = 6
        dt = jnp.array([0.005, 0.005, 0.0, 0.0, 0.005, 0.0], jnp.float32)
        batch = imu.ImuSample(dt=dt, gyro=jnp.zeros((k, 3)),
                              accel=jnp.tile(-G_W, (k, 1)))
        s_pad = imu.propagate_imu_batch(s0, CFG, batch, G_W)
        batch3 = imu.ImuSample(dt=jnp.full((3,), 0.005, jnp.float32),
                               gyro=jnp.zeros((3, 3)),
                               accel=jnp.tile(-G_W, (3, 1)))
        s_ref = imu.propagate_imu_batch(s0, CFG, batch3, G_W)
        np.testing.assert_allclose(np.asarray(s_pad.base_mu),
                                   np.asarray(s_ref.base_mu), atol=1e-6)


class TestGravityInit:
    def test_estimate_gravity(self):
        f = jnp.tile(jnp.array([[0.1, 0.05, 9.80]]), (50, 1))
        g = imu.estimate_gravity_world(f)
        np.testing.assert_allclose(float(jnp.linalg.norm(g)), 9.81, atol=1e-4)
        assert float(g[2]) < -9.7  # opposite the measured specific force


def test_extend_batch_with_remainder():
    """Zero-order-hold remainder row: rem > 0 appends the last VALID
    sample's gyro/accel over rem seconds; rem = 0 appends exact dt=0
    padding (engine.step relies on the no-op property)."""
    import jax.numpy as jnp
    import numpy as np

    from ekf_vio_tpu.core.imu import ImuSample, extend_batch_with_remainder

    batch = ImuSample(
        dt=jnp.array([0.005, 0.005, 0.0]),          # trailing padding
        gyro=jnp.array([[1.0, 0, 0], [0, 2.0, 0], [0, 0, 0]]),
        accel=jnp.array([[0, 0, 9.0], [0, 0, 9.5], [0, 0, 0]]))
    ext = extend_batch_with_remainder(batch, jnp.float32(0.002))
    assert ext.dt.shape == (4,)
    np.testing.assert_allclose(float(ext.dt[3]), 0.002)
    np.testing.assert_allclose(np.asarray(ext.gyro[3]), [0, 2.0, 0])
    np.testing.assert_allclose(np.asarray(ext.accel[3]), [0, 0, 9.5])

    ext0 = extend_batch_with_remainder(batch, jnp.float32(0.0))
    assert float(ext0.dt[3]) == 0.0
    # sub-threshold remainder is clamped to exact padding
    exts = extend_batch_with_remainder(batch, jnp.float32(5e-7))
    assert float(exts.dt[3]) == 0.0
