"""Closed-loop convergence tests — the six reference simulation scenarios
(reference: test/analyzeEKFSimulation.cpp:232-244) with hard asserts on the
covariance invariants (checkSigma, TightlyCoupledEKF.cpp:699-714) and on
filter consistency (feature means track the noiseless measurements).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.sim import simulator


@pytest.mark.parametrize("idx", range(len(simulator.REFERENCE_SCENARIOS)),
                         ids=lambda i: f"scenario{i}")
def test_reference_scenario(idx):
    scn = simulator.REFERENCE_SCENARIOS[idx]
    cfg = VIOConfig(max_features=max(scn.feature_count, 32))
    num_steps = int(round(scn.tf / scn.dt))
    state, gt, telem = simulator.run_scenario(jax.random.PRNGKey(idx), scn, cfg,
                                              num_steps)
    min_diag, asym, pos_err, feat_err = (np.asarray(t) for t in telem)

    # covariance invariants hold at every step
    assert min_diag.min() >= -1e-5, f"negative variance: {min_diag.min()}"
    assert asym.max() < 1e-3, f"asymmetry: {asym.max()}"

    # feature means lock onto the (noiseless, low-R) measurements
    assert feat_err[-1] < 5e-3, f"final feature err: {feat_err[-1]}"

    # the vision-only filter cannot observe absolute scale instantly, but
    # position error must stay bounded over the run
    assert np.isfinite(pos_err).all()
    assert pos_err[-1] < 1.0, f"final pos err: {pos_err[-1]}"


def test_depth_converges_with_known_velocity():
    """Inverse-depth observability: with the velocity anchored to truth
    (resolving the monocular scale ambiguity — with both velocity and depth
    free only their ratio is observable), lateral translation must pull the
    depth estimates from the 0.5 m DEFAULT_POINT_DEPTH prior toward the
    true 1.0 m."""
    import jax.numpy as jnp
    from ekf_vio_tpu.core import filter as ekf, lie

    scn = simulator.Scenario(30, 1e-6, 1.0, (0.5, 0, 0), (0, 0, 0), (0, 0, 0),
                             0.05, 2.0)
    cfg = VIOConfig(max_features=32)
    n_steps = 40

    pts, valid = simulator.generate_scene(jax.random.PRNGKey(0), scn,
                                          cfg.max_features)
    state = ekf.init_state(cfg)
    state = ekf.add_features(state, cfg, pts[:, :2] / pts[:, 2:3], valid)

    # anchor the velocity: mean = truth, variance tiny
    vel = jnp.asarray(scn.b_vel, jnp.float32)
    state = state.replace(
        base_mu=state.base_mu.at[7:10].set(vel),
        Sigma=state.Sigma.at[jnp.arange(7, 16), jnp.arange(7, 16)].set(1e-8),
    )

    gt = simulator.GroundTruth(jnp.zeros(3), jnp.array([1.0, 0, 0, 0]),
                               vel, jnp.zeros(3))
    meas_cov = jnp.tile(jnp.eye(2) * 1e-5, (cfg.max_features, 1, 1))
    omega = jnp.zeros(3)
    for _ in range(n_steps):
        state = ekf.predict(state, cfg, scn.dt)
        gt = simulator.advance_ground_truth(gt, omega, scn.dt)
        z = simulator.project(pts, gt.pos, gt.quat)
        state = ekf.update_with_feature_positions(state, cfg, z, meas_cov, valid)

    qi = lie.quat_conj(gt.quat)
    p_cam = lie.quat_rotate(qi, pts) - lie.quat_rotate(qi, gt.pos)[None]
    rho_gt = np.asarray(1.0 / p_cam[:, 2])
    rho_est = np.asarray(state.feat_mu[:, 2])
    v = np.asarray(valid)
    init_err = np.abs(1.0 / 0.5 - rho_gt)[v].mean()
    final_err = np.abs(rho_est - rho_gt)[v].mean()
    assert final_err < init_err * 0.5, (
        f"depth not converging: init {init_err:.3f} final {final_err:.3f}")
