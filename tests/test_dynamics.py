"""Process-model unit tests.

Mirrors the reference's manual inspection programs with hard asserts:
* canonical-motion transport cases (reference: test/test_ekf.cpp:154-204)
* Jacobian cross-check: exact jacfwd F vs. the reference's central
  difference scheme with DELTA_SHIFT=1e-3
  (reference: test/jacobian_test.cpp:34-47, TightlyCoupledEKF.cpp:176-325)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.config import BASE_STATE_SIZE, VIOConfig
from ekf_vio_tpu.core import dynamics, lie


def make_base(pos=(0, 0, 0), quat=(1, 0, 0, 0), vel=(0, 0, 0), omega=(0, 0, 0),
              accel=(0, 0, 0), biases=(0,) * 6):
    return jnp.array(list(pos) + list(quat) + list(vel) + list(omega) + list(accel)
                     + list(biases), dtype=jnp.float32)


class TestConvolveBaseState:
    def test_rest_is_identity(self):
        mu = make_base()
        out = dynamics.convolve_base_state(mu, 0.1)
        np.testing.assert_allclose(out, mu, atol=1e-7)

    def test_dt_zero_is_identity(self):
        mu = make_base(vel=(1, 2, 3), omega=(0.5, 0, 0), accel=(0, 0, 9))
        out = dynamics.convolve_base_state(mu, 0.0)
        np.testing.assert_allclose(out, mu, atol=1e-7)

    def test_pure_velocity(self):
        # v = (1,0,0), dt=1 -> position advances 1m along x; nothing else moves.
        mu = make_base(vel=(1, 0, 0))
        out = dynamics.convolve_base_state(mu, 1.0)
        np.testing.assert_allclose(out[0:3], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[3:7], [1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[7:10], [1, 0, 0], atol=1e-6)

    def test_pi_rotation_about_x(self):
        # ω = (π,0,0), dt=1 -> half turn about x; qw≈cos(π/2)=0, qx≈1.
        mu = make_base(omega=(np.pi, 0, 0))
        out = dynamics.convolve_base_state(mu, 1.0)
        np.testing.assert_allclose(out[3:7], [0, 1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0:3], [0, 0, 0], atol=1e-6)

    def test_rotation_reexpresses_velocity_in_new_body_frame(self):
        # yaw rate π/2 over dt=1 with v=(1,0,0): new body frame is rotated
        # +90° about z, so the (unchanged world) velocity reads (0,-1,0).
        mu = make_base(vel=(1, 0, 0), omega=(0, 0, np.pi / 2))
        out = dynamics.convolve_base_state(mu, 1.0)
        np.testing.assert_allclose(out[7:10], [0, -1, 0], atol=1e-6)

    def test_acceleration_kinematics(self):
        # a=(1,0,0), dt=2: pos += ½t²a = 2, vel += t·a = 2.
        mu = make_base(accel=(1, 0, 0))
        out = dynamics.convolve_base_state(mu, 2.0)
        np.testing.assert_allclose(out[0:3], [2, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[7:10], [2, 0, 0], atol=1e-6)

    def test_biases_and_omega_unchanged(self):
        mu = make_base(vel=(1, 1, 1), omega=(0.3, 0.2, 0.1), accel=(1, 0, 0),
                       biases=(9, 8, 7, 6, 5, 4))
        out = dynamics.convolve_base_state(mu, 0.5)
        np.testing.assert_allclose(out[10:13], mu[10:13], atol=1e-7)
        np.testing.assert_allclose(out[16:22], mu[16:22], atol=1e-7)


class TestConvolveFeature:
    def test_static_camera_fixed_point(self):
        base = make_base()
        feat = jnp.array([0.2, -0.1, 2.0])  # u, v, 1/d
        out = dynamics.convolve_feature(base, feat, 0.05)
        np.testing.assert_allclose(out, feat, atol=1e-6)

    def test_forward_motion_decreases_depth(self):
        # Camera moves +z toward the scene: depth shrinks, ρ grows.
        base = make_base(vel=(0, 0, 1))
        feat = jnp.array([0.0, 0.0, 1.0])  # on-axis point at 1m
        out = dynamics.convolve_feature(base, feat, 0.1)
        assert out[2] > feat[2]
        np.testing.assert_allclose(1.0 / out[2], 0.9, atol=1e-6)

    def test_lateral_motion_shifts_u(self):
        # Camera moves +x: point appears to move -u.
        base = make_base(vel=(1, 0, 0))
        feat = jnp.array([0.0, 0.0, 2.0])  # 0.5m depth
        out = dynamics.convolve_feature(base, feat, 0.1)
        np.testing.assert_allclose(out[0], -0.1 / 0.5, atol=1e-6)
        np.testing.assert_allclose(out[1], 0.0, atol=1e-7)

    def test_round_trip_consistency_with_projection(self):
        # Transport must equal: lift to 3D, rigid transform, re-project.
        base = make_base(vel=(0.3, -0.2, 0.5), omega=(0.1, 0.2, -0.3),
                         accel=(0.5, 0, -0.5))
        feat = jnp.array([0.3, -0.4, 1.25])
        dt = 0.07
        out = dynamics.convolve_feature(base, feat, dt)

        z = 1.0 / feat[2]
        p = jnp.array([feat[0] * z, feat[1] * z, z])
        tr = dt * base[7:10] + 0.5 * dt * dt * base[13:16]
        dq_inv = lie.quat_conj(lie.quat_exp_omega(base[10:13], dt))
        p2 = lie.quat_rotate(dq_inv, p - tr)
        expect = jnp.array([p2[0] / p2[2], p2[1] / p2[2], 1.0 / p2[2]])
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def numeric_jacobian(fn, x, delta=1e-3):
    """Central differences — the reference's linearization scheme
    (TightlyCoupledEKF.cpp:182).  Evaluated as one vmapped batch of
    perturbed states so the function is traced exactly once."""
    x = jnp.asarray(x, jnp.float32)
    eye = jnp.eye(x.size, dtype=jnp.float32) * delta
    hi = jax.vmap(fn)(x[None, :] + eye)
    lo = jax.vmap(fn)(x[None, :] - eye)
    return np.asarray((hi - lo).T / (2 * delta), np.float64)


class TestJacobians:
    @pytest.mark.parametrize(
        "mu",
        [
            make_base(),
            make_base(omega=(np.pi, 0, 0)),
            make_base(omega=(np.pi, 0, 0), vel=(1, 0, 0)),
            make_base(pos=(1, -2, 3), quat=(0.9, 0.1, -0.2, 0.3),
                      vel=(0.5, -0.3, 0.2), omega=(0.2, -0.1, 0.3),
                      accel=(0.1, 0.2, -0.4), biases=(0.1,) * 6),
        ],
        ids=["rest", "omega_pi", "omega_pi_vel", "general"],
    )
    def test_base_jacobian_matches_central_difference(self, mu):
        dt = 0.05
        Fb, _, _ = dynamics.process_jacobian_blocks(mu, jnp.zeros((1, 3)) + 1.0, dt)
        Fn = numeric_jacobian(lambda m: dynamics.convolve_base_state(m, dt), mu)
        np.testing.assert_allclose(np.asarray(Fb), Fn, atol=2e-3)

    def test_base_jacobian_rest_dt0_is_identity(self):
        Fb, _, _ = dynamics.process_jacobian_blocks(
            make_base(), jnp.ones((1, 3)), 0.0)
        np.testing.assert_allclose(np.asarray(Fb), np.eye(BASE_STATE_SIZE), atol=1e-6)

    def test_feature_jacobian_matches_central_difference(self):
        base = make_base(vel=(0.4, -0.1, 0.3), omega=(0.1, 0.3, -0.2),
                         accel=(0.2, 0, 0.1))
        feats = jnp.array([[0.3, -0.2, 2.0], [-0.5, 0.4, 1.0]])
        dt = 0.05
        _, Ffb, Ff = dynamics.process_jacobian_blocks(base, feats, dt)
        for i in range(2):
            Jn_self = numeric_jacobian(
                lambda f: dynamics.convolve_feature(base, f, dt), feats[i])
            np.testing.assert_allclose(np.asarray(Ff[i]), Jn_self, atol=2e-3)
            Jn_base = numeric_jacobian(
                lambda b: dynamics.convolve_feature(b, feats[i], dt), base)
            np.testing.assert_allclose(np.asarray(Ffb[i]), Jn_base, atol=2e-3)

    def test_feature_jacobian_sparsity_structure(self):
        """Feature rows couple only to base cols 7..15
        (TightlyCoupledEKF.cpp:191-257)."""
        base = make_base(vel=(0.4, -0.1, 0.3), omega=(0.1, 0.3, -0.2),
                         accel=(0.2, 0, 0.1), pos=(1, 2, 3),
                         quat=(0.9, 0.1, -0.2, 0.3))
        feats = jnp.array([[0.3, -0.2, 2.0]])
        _, Ffb, _ = dynamics.process_jacobian_blocks(base, feats, 0.05)
        np.testing.assert_allclose(np.asarray(Ffb[0][:, 0:7]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(Ffb[0][:, 16:22]), 0.0, atol=1e-7)

    def test_bias_rows_identity(self):
        """Bias columns of F are identity (TightlyCoupledEKF.cpp:255-257)."""
        Fb, _, _ = dynamics.process_jacobian_blocks(
            make_base(vel=(1, 1, 1), omega=(0.1, 0.2, 0.3)), jnp.ones((1, 3)), 0.05)
        np.testing.assert_allclose(np.asarray(Fb[:, 16:22]),
                                   np.eye(22)[:, 16:22], atol=1e-6)


class TestCovariancePropagation:
    def test_structured_equals_dense(self):
        """propagate_covariance must equal the naive dense FΣFᵀ + Q."""
        rng = np.random.RandomState(0)
        n = 5
        d = BASE_STATE_SIZE + 3 * n
        A = rng.randn(d, d).astype(np.float32)
        Sigma = jnp.asarray(A @ A.T / d)
        base = make_base(vel=(0.4, -0.1, 0.3), omega=(0.1, 0.3, -0.2),
                         accel=(0.2, 0, 0.1))
        feats = jnp.asarray(rng.uniform(0.5, 2.0, (n, 3)).astype(np.float32))
        active = jnp.ones((n,), bool)
        dt = 0.05

        Fb, Ffb, Ff = dynamics.process_jacobian_blocks(base, feats, dt)
        Ffb, Ff = dynamics.mask_feature_jacobians(Ffb, Ff, active)
        cfg = VIOConfig(max_features=n)
        q = dynamics.process_noise_diag(dt, n, active, cfg)

        F = dynamics.build_dense_F(Fb, Ffb, Ff)
        want = F @ Sigma @ F.T + jnp.diag(q)
        want = 0.5 * (want + want.T)
        for fn in (dynamics.propagate_covariance,
                   dynamics.propagate_covariance_blocked):
            got = fn(Sigma, Fb, Ffb, Ff, q)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-5)


class TestAnalyticTransportJacobians:
    """The analytic action-space Jacobians (dynamics.transport_jacobians)
    must match the per-feature autodiff ground truth exactly."""

    def _state(self):
        mu = jnp.zeros(22).at[3:7].set(lie.quat_normalize(
            jnp.array([0.9, 0.1, -0.2, 0.3])))
        mu = mu.at[7:10].set(jnp.array([0.3, -0.2, 0.5]))
        mu = mu.at[10:13].set(jnp.array([0.4, -0.3, 0.2]))
        mu = mu.at[13:16].set(jnp.array([0.1, 0.2, -0.4]))
        feats = jnp.array([[0.1, -0.2, 2.0], [0.5, 0.4, 0.8],
                           [-0.3, 0.0, 1.3], [0.0, 0.0, 2.0]])
        return mu, feats

    def test_blocks_match_autodiff(self):
        mu, feats = self._state()
        dt = jnp.float32(0.05)
        Fb_a, Ffb_a, Ff_a = dynamics.process_jacobian_blocks(mu, feats, dt)
        Fb_d, Ffb_d, Ff_d = dynamics.process_jacobian_blocks_autodiff(
            mu, feats, dt)
        np.testing.assert_allclose(np.asarray(Fb_a), np.asarray(Fb_d),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Ff_a), np.asarray(Ff_d),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Ffb_a), np.asarray(Ffb_d),
                                   rtol=1e-5, atol=1e-6)

    def test_transport_matches_convolve_feature(self):
        mu, feats = self._state()
        dt = jnp.float32(0.05)
        qt = dynamics.camera_motion_qt(mu, dt)
        f2, _, _ = dynamics.transport_jacobians(feats, qt)
        f2_ref = dynamics.convolve_features(mu, feats, dt)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f2_ref),
                                   rtol=1e-5, atol=1e-6)
        f2_qt = dynamics.transport_by_qt(feats, qt)
        np.testing.assert_allclose(np.asarray(f2_qt), np.asarray(f2_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_rotate_jac_quat_matches_autodiff(self):
        q = lie.quat_normalize(jnp.array([0.8, -0.2, 0.4, 0.1]))
        p = jnp.array([[0.3, -0.5, 2.0], [1.0, 0.0, 0.5]])
        J_a = np.asarray(dynamics._rotate_jac_quat(q, p))
        J_d = np.asarray(jax.vmap(
            lambda pp: jax.jacfwd(lambda qq: lie.quat_rotate(qq, pp))(q))(p))
        np.testing.assert_allclose(J_a, J_d, rtol=1e-5, atol=1e-6)
