"""Closed-form visual-inertial alignment (core/vi_init.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.core import vi_init


def _exact_scene(v0, acc, n=40, k=8, seed=1):
    """Exact tracks + camera actions for an analytic trajectory."""
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
                    rng.uniform(1.5, 3.0, n)], -1)

    def yaw(t):
        c, s = np.cos(0.1 * t), np.sin(0.1 * t)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    times = np.arange(k) * 0.05
    h = np.zeros((k, n, 2))
    Rs, tcs = [], []
    for i, t in enumerate(times):
        pos = v0 * t + 0.5 * acc * t * t
        R = yaw(t)
        pc = (pts - pos) @ R
        h[i] = pc[:, :2] / pc[:, 2:3]
        Rs.append(R.T)
        tcs.append(-R.T @ (0.5 * acc * t * t))  # v0-free component
    return (pts, jnp.asarray(h),
            jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(tcs), jnp.float32),
            jnp.asarray(times, jnp.float32))


class TestAlign:
    def test_recovers_v0_and_depths_exactly(self):
        v0 = np.array([0.4, -0.15, 0.1])
        acc = np.array([0.2, 0.5, -0.3])
        pts, h, R, tc, tau = _exact_scene(v0, acc)
        valid = jnp.ones(h.shape[:2][::-1], bool).T
        res = vi_init.align(h, jnp.ones((8, 40), bool), R, tc, tau)
        np.testing.assert_allclose(np.asarray(res.v0_world), v0, atol=1e-3)
        assert int(res.depth_ok.sum()) == 40
        np.testing.assert_allclose(np.asarray(res.depths0), pts[:, 2],
                                   atol=2e-3)
        err = vi_init.reprojection_errors(res, h, jnp.ones((8, 40), bool))
        assert float(err) < 1e-5

    def test_invalid_tracks_excluded(self):
        v0 = np.array([0.3, 0.0, 0.0])
        acc = np.array([0.0, 0.4, 0.0])
        pts, h, R, tc, tau = _exact_scene(v0, acc)
        valid = np.ones((8, 40), bool)
        valid[:, :10] = False  # kill 10 features
        h = h.at[:, :10, :].set(1e3)  # and corrupt their data
        res = vi_init.align(h, jnp.asarray(valid), R, tc, tau)
        np.testing.assert_allclose(np.asarray(res.v0_world), v0, atol=1e-3)
        assert not np.asarray(res.depth_ok)[:10].any()

    def test_zero_parallax_rejected(self):
        """Pure rotation: no feature is depth-solvable, v0 stays finite."""
        v0 = np.zeros(3)
        acc = np.zeros(3)
        pts, h, R, tc, tau = _exact_scene(v0, acc)
        res = vi_init.align(h, jnp.ones((8, 40), bool), R, tc, tau)
        assert int(res.depth_ok.sum()) == 0
        assert np.isfinite(np.asarray(res.v0_world)).all()


class TestIntegrateMotion:
    def test_matches_rendered_ground_truth(self):
        from ekf_vio_tpu.sim import rendered

        seq = rendered.generate(num_frames=8, w=64, h=48, gyro_noise=0.0,
                                accel_noise=0.0, gyro_bias=(0, 0, 0),
                                accel_bias=(0, 0, 0))
        R_i, tc_i, tau, base22 = vi_init.integrate_motion(
            jnp.asarray(seq.times), jnp.asarray(seq.imu_dt),
            jnp.asarray(seq.imu_gyro), jnp.asarray(seq.imu_accel),
            jnp.asarray(seq.gravity_w))
        # rest-start: v0 = 0, so tc_i is the full camera action translation
        tr = rendered._Trajectory()
        i = 7
        t = seq.times[i]
        R_true = tr.R(t).T
        t_true = -R_true @ tr.pos(t)
        np.testing.assert_allclose(np.asarray(R_i[i]), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc_i[i]), t_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(base22[0:3]), tr.pos(t),
                                   atol=1e-4)


def test_engine_initialize_imu_end_to_end():
    """initialize_imu produces a filter state with metric depths."""
    from ekf_vio_tpu import engine
    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.sim import rendered

    seq = rendered.generate(num_frames=12, gyro_noise=0.0, accel_noise=0.0,
                            gyro_bias=(0, 0, 0), accel_bias=(0, 0, 0))
    cfg = VIOConfig(max_features=64, min_new_feature_dist=10.0,
                    fast_threshold=25, triangulate_new_features=True)
    h, w = seq.frames.shape[1:]
    cam = engine.make_hashable_camera(seq.K, w, h)
    estate = engine.initialize_imu(
        jnp.asarray(seq.frames), jnp.asarray(seq.times),
        jnp.asarray(seq.imu_dt), jnp.asarray(seq.imu_gyro),
        jnp.asarray(seq.imu_accel), jnp.asarray(seq.gravity_w),
        cfg, cam, init_frames=12)
    f = estate.filt
    act = np.asarray(f.active)
    assert act.sum() > 20
    z = 1.0 / np.asarray(f.feat_mu)[act, 2]
    # plane at 2 m, depths spread by viewing geometry — median close to it
    assert 1.5 < np.median(z) < 2.6
    # base state close to the analytic pose at frame 11
    tr = rendered._Trajectory()
    np.testing.assert_allclose(np.asarray(f.base_mu[0:3]),
                               tr.pos(seq.times[11]), atol=0.02)
