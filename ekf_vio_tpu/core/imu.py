"""IMU-driven state propagation — the capability the reference declares
but never implements.

The reference subscribes to IMU messages and then only logs the timestamp
(reference: EKFVIO.cpp:113-115; `imu_update_buffer` is declared at
EKFVIO.h:59-64 and never touched) — ω and a are random-walk states steered
purely by vision.  This module closes that gap with a real strapdown
propagation in the *same 22-state layout*, so the vision-only mode remains
bit-compatible with the reference behavior (use_imu=False).

Model: the gyro/accel measurements act as control inputs through the bias
states:

    ω      = ω_m − b_g                        (body rate)
    a_body = (a_m − b_a) + R(q)ᵀ g_w          (kinematic acceleration)

substituted into the reference kinematics (convolve_base_state /
convolve_feature), which makes the bias columns of F couple into pose,
velocity and every feature — exactly the observability structure the
reference's identity bias rows lack (TightlyCoupledEKF.cpp:255-257).

Covariance propagates as  P' = F P Fᵀ + G Q_imu Gᵀ  per IMU sample, with
F = ∂f/∂x and G = ∂f/∂n over the noise vector n = [n_g, n_a, n_bg, n_ba]
— both exact via jacfwd (closed-form autodiff of an analytic model; no
finite differences anywhere).  A camera interval's IMU batch (EuRoC:
~10 samples at 200 Hz between 20 Hz frames) is one lax.scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ekf_vio_tpu.config import BASE_STATE_SIZE, VIOConfig
from ekf_vio_tpu.core import dynamics, lie
from ekf_vio_tpu.core.state import FilterState


class ImuSample(NamedTuple):
    dt: jnp.ndarray      # [..] seconds since previous sample
    gyro: jnp.ndarray    # [.., 3] rad/s
    accel: jnp.ndarray   # [.., 3] m/s² (specific force)


def substitute_imu_controls(base_mu, gyro_m, accel_m, gravity_w):
    """Replace the ω and a states with their IMU-derived values."""
    q = base_mu[3:7]
    b_acc = base_mu[16:19]
    b_gyr = base_mu[19:22]
    omega = gyro_m - b_gyr
    a_body = (accel_m - b_acc) + lie.quat_rotate(lie.quat_conj(q), gravity_w)
    return base_mu.at[10:13].set(omega).at[13:16].set(a_body)


def convolve_base_imu(base_mu, gyro_m, accel_m, dt, gravity_w):
    """One strapdown step of the base state under IMU controls.

    The propagated ω/a slots hold the IMU-derived values so the camera-
    frame feature transport (convolve_feature) and any vision update see
    a consistent state.
    """
    mu2 = substitute_imu_controls(base_mu, gyro_m, accel_m, gravity_w)
    return dynamics.convolve_base_state(mu2, dt)


def _f_with_noise(base_mu, gyro_m, accel_m, noise, dt, gravity_w):
    """Propagation with additive noise injections (for G = ∂f/∂n).

    n = [n_g(3), n_a(3), n_bg(3), n_ba(3)] — measurement white noise and
    bias random walks."""
    n_g, n_a, n_bg, n_ba = noise[0:3], noise[3:6], noise[6:9], noise[9:12]
    mu = base_mu.at[16:19].add(n_ba * dt).at[19:22].add(n_bg * dt)
    return convolve_base_imu(mu, gyro_m + n_g, accel_m + n_a, dt, gravity_w)


_jac_base_imu = jax.jacfwd(convolve_base_imu, argnums=0)
_jac_noise = jax.jacfwd(_f_with_noise, argnums=3)


def imu_noise_psd(cfg: VIOConfig) -> jnp.ndarray:
    """Diagonal continuous-time noise PSD for n = [n_g, n_a, n_bg, n_ba]."""
    return jnp.concatenate(
        [
            jnp.full((3,), cfg.imu_gyro_noise**2),
            jnp.full((3,), cfg.imu_accel_noise**2),
            jnp.full((3,), cfg.imu_gyro_bias_walk**2),
            jnp.full((3,), cfg.imu_accel_bias_walk**2),
        ]
    )


def propagate_imu_step(state: FilterState, cfg: VIOConfig, sample: ImuSample,
                       gravity_w) -> FilterState:
    """One IMU sample: exact F/G, blocked P' = FPFᵀ + GQGᵀ.

    Features are transported with the IMU-substituted kinematics (their
    Jacobian blocks see the bias coupling through the substituted state)."""
    dt = sample.dt
    mu_sub = substitute_imu_controls(state.base_mu, sample.gyro, sample.accel,
                                     gravity_w)

    # F: base block w.r.t. the *original* state (bias coupling included).
    Fb = _jac_base_imu(state.base_mu, sample.gyro, sample.accel, dt, gravity_w)

    # Feature blocks: transport uses the substituted kinematic state; the
    # chain rule back to the original state runs through the substitution.
    def feat_transport(b_mu, f_mu):
        return dynamics.convolve_feature(
            substitute_imu_controls(b_mu, sample.gyro, sample.accel, gravity_w),
            f_mu, dt)

    Ffb = jax.vmap(jax.jacfwd(feat_transport, argnums=0), in_axes=(None, 0))(
        state.base_mu, state.feat_mu)
    Ff = jax.vmap(jax.jacfwd(feat_transport, argnums=1), in_axes=(None, 0))(
        state.base_mu, state.feat_mu)
    Ffb, Ff = dynamics.mask_feature_jacobians(Ffb, Ff, state.active)

    # G Q Gᵀ folded into the additive term: G is [22, 12]; features have
    # no direct noise input beyond their small transport noise.
    G = _jac_noise(state.base_mu, sample.gyro, sample.accel,
                   jnp.zeros(12), dt, gravity_w)
    Qn = jnp.diag(imu_noise_psd(cfg).astype(state.Sigma.dtype) / jnp.maximum(dt, 1e-6))
    GQG = G @ Qn @ G.T  # [22, 22]

    q_feat = jnp.where(state.active[:, None], cfg.q_feature, 0.0) * jnp.ones(
        (state.n_max, 3)) * dt
    q_diag = jnp.concatenate([jnp.zeros(BASE_STATE_SIZE), q_feat.reshape(-1)])

    Sigma = dynamics.propagate_covariance(
        state.Sigma, Fb, Ffb, Ff, q_diag.astype(state.Sigma.dtype))
    Sigma = Sigma.at[:BASE_STATE_SIZE, :BASE_STATE_SIZE].add(GQG)
    Sigma = 0.5 * (Sigma + Sigma.T)

    new_feat = dynamics.convolve_features(mu_sub, state.feat_mu, dt)
    feat_mu = jnp.where(state.active[:, None], new_feat, state.feat_mu)
    base_mu = dynamics.convolve_base_state(mu_sub, dt)

    return state.replace(base_mu=base_mu, feat_mu=feat_mu, Sigma=Sigma,
                         t=state.t + dt)


def propagate_imu_batch(state: FilterState, cfg: VIOConfig, batch: ImuSample,
                        gravity_w) -> FilterState:
    """Scan a camera interval's IMU samples ([K] leading dim; zero-dt rows
    are padding and become no-ops)."""

    def body(s, smp):
        dt_ok = smp.dt > 0
        s2 = propagate_imu_step(s, cfg, smp, gravity_w)
        s = jax.tree.map(lambda a, b: jnp.where(dt_ok, b, a), s, s2)
        return s, None

    state, _ = jax.lax.scan(body, state, batch)
    return state


def estimate_gravity_world(accel_samples: jnp.ndarray, g: float = 9.81):
    """Initial gravity in the world (= initial body) frame from a
    stationary window: specific force at rest is f = −g_w."""
    mean_f = jnp.mean(accel_samples, axis=0)
    return -mean_f / jnp.linalg.norm(mean_f) * g
