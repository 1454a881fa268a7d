"""State-sharded per-frame VIO pipeline: the FULL engine step with Σ
block-partitioned over a device mesh.

The image front-end (pyramid build, KLT, FAST replenishment) is replicated
— it is O(HW) work on data every device already holds — while every
O(D²)-and-up covariance product runs on Σ row/column blocks via the
explicit shard_map ops in parallel/sharded_filter.py.  This realizes
BASELINE.json config 5 (256+ feature states, block-partitioned covariance
update over ICI collectives) for the *whole* per-frame pipeline, not just
an isolated filter step; parity with the unsharded engine.step is asserted
in tests/test_sharded_filter.py.

Mirrors engine.step frame flow (reference: EKFVIO.cpp:139-196).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ekf_vio_tpu import engine
from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core import filter as ekf
from ekf_vio_tpu.frontend import camera as cam_mod
from ekf_vio_tpu.frontend import klt, pyramid, replenish
from ekf_vio_tpu.parallel import sharded_filter as sf


class ShardedEngineState(NamedTuple):
    filt: sf.ShardedFilterState
    prev_pyr: tuple
    frame_idx: jnp.ndarray = jnp.int32(0)
    lin_base: jnp.ndarray = None  # FEJ anchor (engine.EngineState.lin_base)


def initialize(img, t, cfg: VIOConfig, cam, mesh: Mesh) -> ShardedEngineState:
    """First-frame bootstrap, then split + place Σ on the mesh."""
    estate = engine.initialize(img, t, cfg, cam)
    filt = jax.device_put(sf.split_state(estate.filt),
                          sf.state_shardings(mesh))
    return ShardedEngineState(filt=filt, prev_pyr=estate.prev_pyr,
                              frame_idx=estate.frame_idx,
                              lin_base=estate.filt.base_mu)


def step(estate: ShardedEngineState, img, t, cfg: VIOConfig, cam,
         mesh: Mesh, imu_batch=None, gravity_w=None):
    """One full frame on the sharded state (analog of engine.step)."""
    filt = estate.filt
    filt = filt.replace(age=jnp.where(filt.active, filt.age + 1, 0))
    dt = jnp.maximum(t - filt.t, 0.0)

    # --- predict
    frame_qt = None
    if imu_batch is not None:
        from ekf_vio_tpu.core import imu as imu_mod

        lin = estate.lin_base if (cfg.use_fej and estate.lin_base
                                  is not None) else None
        # interval remainder appended as a zero-order-hold sample (same
        # as engine.step — one propagation graph, no cond)
        rem = jnp.maximum(t - (filt.t + jnp.sum(imu_batch.dt)), 0.0)
        imu_batch = imu_mod.extend_batch_with_remainder(imu_batch, rem)
        filt, frame_qt = sf.sharded_propagate_imu_batch(
            filt, cfg, imu_batch, gravity_w, mesh, lin_base=lin)
    else:
        filt = sf.sharded_predict(filt, cfg, dt, mesh)
    filt = filt.replace(t=jnp.asarray(t, filt.t.dtype))
    new_lin_base = filt.base_mu

    # --- track (replicated front-end)
    cur_pyr = pyramid.build_pyramid(img, cfg.klt_max_pyramid_level)
    prev_px = cam_mod.metric_to_pixel(cam, filt.klt_ref)
    seed_px = cam_mod.metric_to_pixel(cam, filt.feat_mu[:, :2])
    res = klt.track(estate.prev_pyr, cur_pyr, prev_px, seed_px, filt.active,
                    cfg)
    passed = res.status & cam_mod.in_kill_box(cam, res.points, cfg.kill_pad)
    if cfg.min_eigen_rel_gate > 0:  # structure gate (engine.step parity)
        passed = passed & engine._rel_eig_keep(res.min_eig, passed,
                                               cfg.min_eigen_rel_gate)
    measured_uv = cam_mod.pixel_to_metric(cam, res.points)
    if cfg.innovation_gate_chi2 > 0:
        # chi-square innovation gate (engine.step parity): per-feature
        # 2x2 uv blocks live on the diagonal of the sharded ff block —
        # a [N, 2, 2] extraction, tiny under GSPMD
        nis_f = _innovation_nis_sharded(filt, cfg, measured_uv, cam)
        passed = passed & (nis_f <= cfg.innovation_gate_chi2)

    if imu_batch is not None and cfg.triangulate_new_features:
        # depth bootstrap (engine.step's re-init of young wrong-depth
        # features): wipe ρ rows/cols of Σ and set the triangulated prior
        from ekf_vio_tpu.core import depth_init, lie

        Rt = (lie.quat_to_matrix(frame_qt[0:4]), frame_qt[4:7])
        z_boot, tri_ok, rel_sig = depth_init.triangulate_depths(
            filt.klt_ref, measured_uv, filt.base_mu, dt,
            cfg.default_point_depth, Rt=Rt, return_rel_sigma=True)
        rho_new = 1.0 / z_boot
        # shared gate/width policy (core/depth_init.py) — same call as
        # engine.step, so dense and sharded cannot fork
        good, rel = depth_init.triangulation_confidence(
            cfg, cam.fx, cam.fy, rel_sig, exact_baseline=True)
        sig_tri = rel * rho_new
        disagrees = jnp.abs(rho_new - filt.feat_mu[:, 2]) > sig_tri
        boot = ((filt.age <= cfg.bootstrap_max_age) & tri_ok & good & passed
                & filt.active & disagrees)

        n = cfg.max_features
        zb = jnp.zeros((n,), bool)
        wipe3 = jnp.stack([zb, zb, boot], -1).reshape(-1)
        diag3 = jnp.zeros((3 * n,), filt.bb.dtype).at[
            3 * jnp.arange(n) + 2].set(jnp.where(boot, sig_tri * sig_tri, 0.0))
        filt = sf.sigma_slot_reset(filt, wipe3, diag3, mesh)
        filt = filt.replace(feat_mu=filt.feat_mu.at[:, 2].set(
            jnp.where(boot, rho_new, filt.feat_mu[:, 2])))

    # --- update
    meas_cov = klt.measurement_covariance_metric(cam.fx, cam.fy,
                                                 cfg.max_features, cfg)
    innov = _innovation(filt, measured_uv, passed)
    filt = sf.sharded_update(filt, cfg, measured_uv, meas_cov, passed, mesh)
    num_tracked = jnp.sum((passed & filt.active).astype(jnp.int32))
    filt = sf.sharded_drop_features(filt, filt.active & ~passed, mesh)

    # --- failure detection + recovery (same flow position as engine.step:
    # before replenish, so re-detection happens in the same frame)
    lost = (num_tracked < cfg.minimum_trackable_features)
    lost |= ~jnp.isfinite(filt.base_mu).all()
    lost |= ~jnp.isfinite(jnp.diagonal(filt.bb)).all()
    lost |= ~jnp.isfinite(jnp.diagonal(filt.ff)).all()
    if cfg.recover_on_tracking_lost:
        filt = _recover_tracking_lost(filt, cfg, lost)
        new_lin_base = jnp.where(lost, filt.base_mu, new_lin_base)

    # --- replenish
    feat_px = cam_mod.metric_to_pixel(cam, filt.feat_mu[:, :2])
    cand_px, cand_valid = replenish.replenish(
        img, feat_px, filt.active, cfg, cfg.max_features)
    cand_uv = cam_mod.pixel_to_metric(cam, cand_px)
    depths = None
    depth_vars = None
    if cfg.triangulate_new_features and imu_batch is None:
        # at-birth two-view depth init — vision-only mode; IMU mode skips
        # the second tracker invocation, the per-frame exact-baseline
        # bootstrap above covers the transient (engine.step parity)
        from ekf_vio_tpu.core import depth_init, lie

        back = klt.track(cur_pyr, estate.prev_pyr, cand_px, cand_px,
                         cand_valid, cfg)
        h_prev = cam_mod.pixel_to_metric(cam, back.points)
        Rt = None
        if frame_qt is not None:
            Rt = (lie.quat_to_matrix(frame_qt[0:4]), frame_qt[4:7])
        z_cur, tri_ok, rel_sig = depth_init.triangulate_depths(
            h_prev, cand_uv, filt.base_mu, dt, cfg.default_point_depth,
            Rt=Rt, return_rel_sigma=True)
        good, rel = depth_init.triangulation_confidence(
            cfg, cam.fx, cam.fy, rel_sig, exact_baseline=Rt is not None)
        used = tri_ok & back.status & good
        depths = jnp.where(used, z_cur, cfg.default_point_depth)
        sig_rho = rel / jnp.maximum(depths, 1e-3)
        depth_vars = jnp.where(used, sig_rho * sig_rho,
                               cfg.default_point_depth_variance)
    filt = sf.sharded_add_features(filt, cfg, cand_uv, cand_valid, mesh,
                                   depths=depths, depth_vars=depth_vars)

    out = engine.StepOutputs(
        base_mu=filt.base_mu,
        num_tracked=num_tracked,
        num_active=jnp.sum(filt.active.astype(jnp.int32)),
        mean_innovation=innov,
        pose_cov_diag=jnp.diag(filt.bb)[:7],
        tracking_lost=lost,
        pos_cov=filt.bb[:3, :3],
        mean_nis=jnp.float32(0.0),  # consistency telemetry: dense path only
    )
    return ShardedEngineState(filt=filt, prev_pyr=cur_pyr,
                              frame_idx=estate.frame_idx + 1,
                              lin_base=new_lin_base), out


def _innovation_nis_sharded(filt: sf.ShardedFilterState, cfg: VIOConfig,
                            measured_uv, cam):
    """[N] per-feature NIS on the split-Σ state (engine parity: the same
    statistic as core/update.innovation_nis_per_feature with constant
    metric R)."""
    n = filt.n_max
    y = measured_uv - filt.feat_mu[:, :2]                    # [N, 2]
    rows = filt.ff.reshape(n, 3, 3 * n)[:, :2, :]            # [N, 2, 3N]
    col = 3 * jnp.arange(n)[:, None] + jnp.arange(2)[None]   # [N, 2]
    Suv = jnp.take_along_axis(rows, col[:, None, :], axis=2)  # [N, 2, 2]
    r = cfg.klt_measurement_variance_px
    Rm = jnp.array([[r / (cam.fx * cam.fx), 0.0],
                    [0.0, r / (cam.fy * cam.fy)]])
    S = Suv + Rm[None]
    det = jnp.maximum(S[:, 0, 0] * S[:, 1, 1] - S[:, 0, 1] * S[:, 1, 0],
                      1e-30)
    return (S[:, 1, 1] * y[:, 0] ** 2
            - 2 * S[:, 0, 1] * y[:, 0] * y[:, 1]
            + S[:, 0, 0] * y[:, 1] ** 2) / det


def _recover_tracking_lost(filt: sf.ShardedFilterState, cfg: VIOConfig, lost):
    """Sharded port of engine._recover_tracking_lost: keep pose gauge and
    bias estimates, free every slot, wipe all cross-correlations (bf/ff),
    re-inflate the kinematic variances to the cold-start prior.  The wipes
    are elementwise on the (bf, ff) blocks, so GSPMD keeps their sharding."""
    dtype = filt.bb.dtype
    n = filt.n_max

    init_mu = jnp.zeros((22,), dtype).at[3].set(1.0)
    base = jnp.where(jnp.isfinite(filt.base_mu), filt.base_mu, init_mu)
    qn = jnp.linalg.norm(base[3:7])
    q = jnp.where(qn > 1e-6, base[3:7] / jnp.maximum(qn, 1e-6), init_mu[3:7])
    base = base.at[3:7].set(q)

    diag = jnp.diagonal(filt.bb)
    safe = lambda d, fb: jnp.clip(jnp.where(jnp.isfinite(d), d, fb), 0.0, None)
    bb_diag = jnp.concatenate([
        safe(diag[:7], cfg.init_pose_variance),
        jnp.full((9,), cfg.init_kinematic_variance, dtype),
        safe(diag[16:22], cfg.init_bias_variance),
    ])

    rec = filt.replace(
        base_mu=base,
        active=jnp.zeros((n,), bool),
        bb=jnp.diag(bb_diag),
        bf=jnp.zeros_like(filt.bf),
        ff=jnp.zeros_like(filt.ff),
        age=jnp.zeros((n,), jnp.int32),
    )
    return jax.tree.map(lambda a, b: jnp.where(lost, b, a), filt, rec)


def _innovation(filt: sf.ShardedFilterState, measured_uv, passed):
    meas = passed & filt.active
    y = measured_uv - filt.feat_mu[:, :2]
    mag = jnp.linalg.norm(y, axis=-1)
    cnt = jnp.maximum(jnp.sum(meas), 1)
    return jnp.sum(jnp.where(meas, mag, 0.0)) / cnt


@partial(jax.jit, static_argnames=("cfg", "cam", "mesh"))
def run_sequence(images, times, cfg: VIOConfig, cam, mesh: Mesh):
    """Whole-sequence rollout with the state-sharded step."""
    estate = initialize(images[0], times[0], cfg, cam, mesh)

    def body(estate, inp):
        img, t = inp
        return step(estate, img, t, cfg, cam, mesh)

    return jax.lax.scan(body, estate, (images[1:], times[1:]))


@partial(jax.jit, static_argnames=("cfg", "cam", "mesh", "init_frames"))
def run_sequence_imu(images, times, imu_dt, imu_gyro, imu_accel, gravity_w,
                     cfg: VIOConfig, cam, mesh: Mesh, init_frames: int = 0):
    """Mono-inertial rollout on the sharded engine (analog of
    engine.run_sequence_imu): the closed-form VI initialization runs
    replicated (it is O(N) work on a handful of frames), then the state
    splits onto the mesh and every frame runs the sharded step."""
    from ekf_vio_tpu.core import imu as imu_mod

    if init_frames > 1:
        dense = engine.initialize_imu(images, times, imu_dt, imu_gyro,
                                      imu_accel, gravity_w, cfg, cam,
                                      init_frames)
        start = init_frames
    else:
        dense = engine.initialize(images[0], times[0], cfg, cam)
        start = 1
    filt = jax.device_put(sf.split_state(dense.filt),
                          sf.state_shardings(mesh))
    estate = ShardedEngineState(filt=filt, prev_pyr=dense.prev_pyr,
                                frame_idx=dense.frame_idx,
                                lin_base=dense.filt.base_mu)

    def body(estate, inp):
        img, t, dts, gy, ac = inp
        batch = imu_mod.ImuSample(dt=dts, gyro=gy, accel=ac)
        return step(estate, img, t, cfg, cam, mesh, imu_batch=batch,
                    gravity_w=gravity_w)

    return jax.lax.scan(
        body, estate,
        (images[start:], times[start:], imu_dt[start - 1:],
         imu_gyro[start - 1:], imu_accel[start - 1:]))
