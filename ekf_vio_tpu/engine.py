"""Engine: the per-frame VIO pipeline, scan-composable and jittable.

Mirrors the reference orchestrator's per-frame flow
(reference: EKFVIO.cpp:139-196 ``addFrame``):

    predict(dt) → KLT track (seeded at EKF-predicted positions) →
    masked EKF update → drop failed features → FAST replenishment

re-expressed as one pure function ``step`` over an ``EngineState`` pytree,
so a whole sequence is a single ``lax.scan`` (and a batch of sequences a
``vmap`` over it — the reference's ROS-callback loop has no analog of
either).  The first frame follows the reference's bootstrap path
(EKFVIO.cpp:141-153): set the clock, replenish, no predict/update.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core import filter as ekf
from ekf_vio_tpu.frontend import camera as cam_mod
from ekf_vio_tpu.frontend import klt, pyramid, replenish


class EngineState(NamedTuple):
    filt: ekf.FilterState
    prev_pyr: tuple  # pyramid of the previous (processed-scale) frame
    frame_idx: jnp.ndarray = jnp.int32(0)  # frames processed so far
    # FEJ linearization point: the base state as predicted at the current
    # frame BEFORE its vision update (x̂_{k|k-1}).  The next interval's
    # transition Jacobians are evaluated along a chain propagated from
    # here (core/imu.py propagate_imu_batch_with_motion), which preserves
    # the unobservable yaw-about-gravity subspace (cfg.use_fej).
    lin_base: jnp.ndarray = None


class StepOutputs(NamedTuple):
    base_mu: jnp.ndarray      # [22] pose/vel/omega/accel/biases
    num_tracked: jnp.ndarray  # features that passed this frame
    num_active: jnp.ndarray   # live features after replenishment
    mean_innovation: jnp.ndarray
    pose_cov_diag: jnp.ndarray  # [7] position+quaternion variance
    tracking_lost: jnp.ndarray  # bool — too few tracks or non-finite state
    # consistency telemetry (benchmarks/consistency_diag.py): full 3x3
    # position covariance block (for proper 3-dof pose NEES) and the mean
    # per-feature innovation NIS of this frame's PRE-update innovations
    # (E[NIS] = 2 when calibrated; core/update.innovation_nis)
    pos_cov: jnp.ndarray = None        # [3, 3]
    mean_nis: jnp.ndarray = None       # scalar


def _sigma_diag(filt: ekf.FilterState, cfg: VIOConfig) -> jnp.ndarray:
    """diag(Σ) for either state form (factor mode stores L in .Sigma)."""
    if cfg.square_root_form:
        from ekf_vio_tpu.core import sqrt_filter

        return sqrt_filter.sigma_diag_factor(filt.Sigma)
    from ekf_vio_tpu.core.state import diag_of

    return diag_of(filt.Sigma)


def _pose_cov_diag(filt: ekf.FilterState, cfg: VIOConfig) -> jnp.ndarray:
    return _sigma_diag(filt, cfg)[:7]


def initialize(
    img: jnp.ndarray, t: jnp.ndarray, cfg: VIOConfig, cam: cam_mod.CameraModel
) -> EngineState:
    """First-frame bootstrap (EKFVIO.cpp:141-153): start the filter clock
    and detect the initial feature set."""
    filt = ekf.init_state(cfg)
    filt = filt.replace(t=jnp.asarray(t, filt.t.dtype))

    px, valid = replenish.replenish(
        img, jnp.zeros((cfg.max_features, 2)), jnp.zeros(cfg.max_features, bool),
        cfg, cfg.max_features,
    )
    uv = cam_mod.pixel_to_metric(cam, px)
    filt = ekf.add_features(filt, cfg, uv, valid)
    # seed the tracker cache with the detected positions
    filt = filt.replace(klt_ref=jnp.where(valid[:, None], uv, filt.klt_ref))

    if cfg.square_root_form:  # factor once; the loop never re-factors
        from ekf_vio_tpu.core import sqrt_filter

        filt = sqrt_filter.to_factor(filt)

    pyr = pyramid.build_pyramid(img, cfg.klt_max_pyramid_level)
    return EngineState(filt=filt, prev_pyr=pyr, frame_idx=jnp.int32(1),
                       lin_base=filt.base_mu)


def _rel_eig_keep(min_eig, mask, rel):
    """Keep mask for the relative min-eigen structure gate: min_eig above
    (frame median over ``mask`` features) / rel.  With no masked features
    the median is NaN and every comparison is False — callers AND this
    with ``mask``, so the degenerate case stays all-failed."""
    med = jnp.nanquantile(jnp.where(mask, min_eig, jnp.nan), 0.5)
    return min_eig > med / rel


def _recover_tracking_lost(filt: ekf.FilterState, cfg: VIOConfig, lost):
    """Re-bootstrap when tracking collapses (the *action* on the flag the
    reference only logs, EKFVIO.cpp:192).

    Keeps the pose (the anchored gauge) and the bias estimates, but frees
    every feature slot, wipes all cross-correlations, and re-inflates the
    kinematic (vel/ω/a) variances to the cold-start prior — the same
    ignorance declaration as TightlyCoupledEKF.cpp:29-54.  Non-finite mean
    entries fall back to the init values.  The regular replenish path then
    re-detects from the current frame, and in IMU mode the VI depth
    bootstrap re-establishes metric depths as parallax appears.

    All slots selected by a where() so the branch scans/vmaps (a lax.cond
    would be retraced under vmap anyway)."""
    dtype = filt.Sigma.dtype
    n = filt.n_max

    init_mu = jnp.zeros((22,), dtype).at[3].set(1.0)
    base = jnp.where(jnp.isfinite(filt.base_mu), filt.base_mu, init_mu)
    qn = jnp.linalg.norm(base[3:7])
    q = jnp.where(qn > 1e-6, base[3:7] / jnp.maximum(qn, 1e-6),
                  init_mu[3:7])
    base = base.at[3:7].set(q)

    diag = _sigma_diag(filt, cfg)
    safe = lambda d, fb: jnp.clip(jnp.where(jnp.isfinite(d), d, fb), 0.0, None)
    sig_diag = jnp.concatenate([
        safe(diag[:7], cfg.init_pose_variance),
        jnp.full((9,), cfg.init_kinematic_variance, dtype),
        safe(diag[16:22], cfg.init_bias_variance),
        jnp.zeros((3 * n,), dtype),
    ])

    from ekf_vio_tpu.core.state import diag_embed

    # diag(σ²) in covariance form; its own Cholesky diag(σ) in factor form
    new_sigma = (diag_embed(jnp.sqrt(sig_diag)) if cfg.square_root_form
                 else diag_embed(sig_diag))
    rec = filt.replace(
        base_mu=base,
        active=jnp.zeros((n,), bool),
        Sigma=new_sigma,
        age=jnp.zeros((n,), jnp.int32),
    )
    return jax.tree.map(lambda a, b: jnp.where(lost, b, a), filt, rec)


def step(
    estate: EngineState,
    img: jnp.ndarray,
    t: jnp.ndarray,
    cfg: VIOConfig,
    cam: cam_mod.CameraModel,
    imu_batch=None,
    gravity_w=None,
):
    """One full frame (steady-state branch of addFrame, EKFVIO.cpp:154-173).

    With ``imu_batch`` (an ImuSample pytree of this camera interval's
    samples) the predict is the IMU strapdown propagation (mono-inertial
    mode — the capability the reference never wired up); otherwise the
    vision-driven random-walk process, matching reference behavior.
    """
    sq = cfg.square_root_form  # factor-native mode: filt.Sigma holds L
    if sq:
        from ekf_vio_tpu.core import sqrt_filter

    filt = estate.filt
    filt = filt.replace(age=jnp.where(filt.active, filt.age + 1, 0))
    dt = jnp.maximum(t - filt.t, 0.0)  # dt >= 0 assert (EKFVIO.cpp:162)

    # --- predict (process, EKFVIO.cpp:163)
    frame_qt = None  # exact inter-frame camera motion (IMU mode)
    predict_fn = sqrt_filter.predict_sqrt_factor if sq else ekf.predict
    if imu_batch is not None:
        from ekf_vio_tpu.core import imu as imu_mod

        lin = estate.lin_base if (cfg.use_fej and estate.lin_base
                                  is not None) else None
        # cover any remainder of the interval not spanned by IMU samples
        # by APPENDING it as a zero-order-hold sample (the last valid
        # gyro/accel persisted over the gap): one propagation graph, no
        # lax.cond around a full dense predict (that cond compiled a
        # second [D,D] covariance subgraph into every scan body; zero
        # remainder makes the appended row dt=0 padding — an exact no-op)
        rem = jnp.maximum(t - (filt.t + jnp.sum(imu_batch.dt)), 0.0)
        imu_batch = imu_mod.extend_batch_with_remainder(imu_batch, rem)
        if sq:
            filt, frame_qt = sqrt_filter.propagate_imu_factor(
                filt, cfg, imu_batch, gravity_w, lin_base=lin)
        else:
            filt, frame_qt = imu_mod.propagate_imu_batch_with_motion(
                filt, cfg, imu_batch, gravity_w, lin_base=lin)
    else:
        filt = predict_fn(filt, cfg, dt)
    filt = filt.replace(t=jnp.asarray(t, filt.t.dtype))
    # FEJ anchor for the NEXT interval: this frame's prior estimate
    new_lin_base = filt.base_mu

    # --- track (updateStateWithNewImage, EKFVIO.cpp:207-219)
    cur_pyr = pyramid.build_pyramid(img, cfg.klt_max_pyramid_level)
    prev_px = cam_mod.metric_to_pixel(cam, filt.klt_ref)       # KLTTracker.cpp:53-55
    seed_px = cam_mod.metric_to_pixel(cam, filt.feat_mu[:, :2])  # predicted seeds, :57-59
    res = klt.track(estate.prev_pyr, cur_pyr, prev_px, seed_px, filt.active, cfg)

    # border kill-pad rejection (KLTTracker.cpp:73)
    passed = res.status & cam_mod.in_kill_box(cam, res.points, cfg.kill_pad)

    if cfg.min_eigen_rel_gate > 0:
        # relative structure gate (see VIOConfig.min_eigen_rel_gate):
        # features in gradient-degenerate regions (grazing-angle
        # foreshortening, blur) slide without failing LK's own checks
        passed = passed & _rel_eig_keep(res.min_eig, passed,
                                        cfg.min_eigen_rel_gate)

    # --- update
    measured_uv = cam_mod.pixel_to_metric(cam, res.points)

    if cfg.innovation_gate_chi2 > 0:
        # chi-square innovation gate (Mahalanobis outlier rejection —
        # the robustness layer the reference lacks): a mis-track whose
        # innovation is beyond-gate sigma fails the frame and frees its
        # slot instead of feeding the update.  Uses the constant-R
        # metric covariance regardless of cfg.klt_covariance (the gate
        # needs a stable yardstick, not the per-frame SSD estimate).
        from ekf_vio_tpu.core.update import innovation_nis_per_feature

        gate_cov = klt.measurement_covariance_metric(
            cam.fx, cam.fy, cfg.max_features, cfg)
        nis_f = innovation_nis_per_feature(filt, measured_uv, gate_cov,
                                           factor=sq)
        passed = passed & (nis_f <= cfg.innovation_gate_chi2)

    if imu_batch is not None and cfg.triangulate_new_features:
        # Depth bootstrap: with an IMU the metric scale is observable, so
        # features carrying a wrong depth prior pull the velocity estimate
        # off while the filter drags them to true scale (a ~10x
        # trajectory-error multiplier, measured).  Young features whose
        # triangulated depth (against the exact IMU-integrated baseline)
        # disagrees with their estimate get depth mean AND variance
        # re-initialized — a consistent re-init: the ρ row/col of Σ is
        # wiped, like a fresh slot with an informed prior.
        from ekf_vio_tpu.core import depth_init, lie

        Rt = (lie.quat_to_matrix(frame_qt[0:4]), frame_qt[4:7])
        z_boot, tri_ok, rel_sig = depth_init.triangulate_depths(
            filt.klt_ref, measured_uv, filt.base_mu, dt,
            cfg.default_point_depth, Rt=Rt, return_rel_sigma=True)
        rho_new = 1.0 / z_boot
        # shared gate/width policy (core/depth_init.py): mean accepted
        # only under bounded expected error (a wrong mean poisons the
        # transport linearization), prior width matched to the
        # triangulation geometry (round-4 fix — the r3 vision/mono
        # divergence transients traced to confidently-wrong depths)
        good, rel = depth_init.triangulation_confidence(
            cfg, cam.fx, cam.fy, rel_sig, exact_baseline=True)
        sig_tri = rel * rho_new
        disagrees = jnp.abs(rho_new - filt.feat_mu[:, 2]) > sig_tri
        boot = ((filt.age <= cfg.bootstrap_max_age) & tri_ok & good & passed
                & filt.active & disagrees)

        rho = jnp.where(boot, rho_new, filt.feat_mu[:, 2])

        def rho_vec(vals):
            """[D] vector with vals at the ρ slots (22+3i+2), zeros
            elsewhere — interleave build, no scatter fusion."""
            z = jnp.zeros((cfg.max_features,), filt.Sigma.dtype)
            return jnp.concatenate([
                jnp.zeros((22,), filt.Sigma.dtype),
                jnp.stack([z, z, vals.astype(filt.Sigma.dtype)],
                          -1).reshape(-1)])

        if sq:
            wipe = rho_vec(boot)
            new_diag = rho_vec(sig_tri * sig_tri)
            Sigma = sqrt_filter.wipe_rows_factor(filt.Sigma, wipe, new_diag)
        else:
            from ekf_vio_tpu.core.state import diag_embed

            keep = 1.0 - rho_vec(boot)
            Sigma = filt.Sigma * (keep[:, None] * keep[None, :])
            # booted ρ rows were just wiped to zero diag — adding the
            # new prior is exact; non-booted rows add zero
            Sigma = Sigma + diag_embed(
                rho_vec(jnp.where(boot, sig_tri * sig_tri, 0.0)))
        filt = filt.replace(feat_mu=filt.feat_mu.at[:, 2].set(rho),
                            Sigma=Sigma)

    if cfg.klt_covariance == "sample":
        # per-feature R from the SSD response surface (the reference's
        # unwired estimator, KLTTracker.cpp:111-175, live as an option);
        # pixel² -> metric² via the 1/f scaling (KLTTracker.cpp:75-84),
        # floored at the constant-R value so a flat response surface
        # cannot claim better-than-constant precision
        cov_px = klt.estimate_uncertainty_sample_based(
            estate.prev_pyr[0], cur_pyr[0], prev_px, res.points)
        floor = cfg.klt_measurement_variance_px
        eye2 = jnp.eye(2)
        cov_px = cov_px + floor * eye2[None]
        scale = jnp.array([[1.0 / (cam.fx * cam.fx), 1.0 / (cam.fx * cam.fy)],
                           [1.0 / (cam.fx * cam.fy), 1.0 / (cam.fy * cam.fy)]])
        meas_cov = cov_px * scale[None]
    else:
        meas_cov = klt.measurement_covariance_metric(
            cam.fx, cam.fy, cfg.max_features, cfg)
    innov = ekf.innovation_stats(filt, measured_uv, passed)
    from ekf_vio_tpu.core.update import innovation_nis

    nis = innovation_nis(filt, measured_uv, meas_cov, passed, factor=sq)
    if sq:
        filt = sqrt_filter.update_sqrt_factor(filt, cfg, measured_uv,
                                              meas_cov, passed)
    else:
        filt = ekf.update_with_feature_positions(filt, cfg, measured_uv,
                                                 meas_cov, passed)
    num_tracked = jnp.sum((passed & filt.active).astype(jnp.int32))

    # failed features free their slots (closing the reference's
    # flag-but-never-erase gap, TightlyCoupledEKF.cpp:525-529)
    if sq:
        filt = sqrt_filter.drop_features_factor(filt, filt.active & ~passed)
    else:
        filt = ekf.drop_features(filt, filt.active & ~passed)

    # failure detection: the reference declares a tracking_lost flag but
    # never raises it (EKFVIO.h:55, logged at EKFVIO.cpp:192); here it is
    # computed — too few surviving tracks or a non-finite state — AND acted
    # on: the filter re-bootstraps instead of filtering on garbage.
    lost = (num_tracked < cfg.minimum_trackable_features) | ~jnp.isfinite(
        filt.base_mu
    ).all() | ~jnp.isfinite(_sigma_diag(filt, cfg)).all()
    if cfg.recover_on_tracking_lost:
        filt = _recover_tracking_lost(filt, cfg, lost)
        # a re-bootstrapped filter re-anchors its linearization point
        new_lin_base = jnp.where(lost, filt.base_mu, new_lin_base)

    # --- replenish (EKFVIO.cpp:224-311)
    feat_px = cam_mod.metric_to_pixel(cam, filt.feat_mu[:, :2])
    cand_px, cand_valid = replenish.replenish(
        img, feat_px, filt.active, cfg, cfg.max_features
    )
    cand_uv = cam_mod.pixel_to_metric(cam, cand_px)
    depths = None
    depth_vars = None
    if cfg.triangulate_new_features and imu_batch is None:
        # two-view depth init: track candidates back into the previous
        # frame and triangulate against the filter's own frame-to-frame
        # motion (core/depth_init.py; falls back to the prior without
        # parallax).  IMU mode skips this SECOND tracker invocation: the
        # per-frame depth bootstrap above re-triangulates every young
        # feature against the exact IMU baseline as soon as parallax
        # appears, which covers the same transient at zero extra tracker
        # cost (measured: mono ATE unchanged, ~1.5x step speedup).
        from ekf_vio_tpu.core import depth_init, lie

        back = klt.track(cur_pyr, estate.prev_pyr, cand_px, cand_px,
                         cand_valid, cfg)
        h_prev = cam_mod.pixel_to_metric(cam, back.points)
        Rt = None
        if frame_qt is not None:  # exact IMU-integrated baseline
            Rt = (lie.quat_to_matrix(frame_qt[0:4]), frame_qt[4:7])
        z_cur, tri_ok, rel_sig = depth_init.triangulate_depths(
            h_prev, cand_uv, filt.base_mu, dt, cfg.default_point_depth,
            Rt=Rt, return_rel_sigma=True)
        # shared gate/width policy (core/depth_init.py — measured on the
        # rendered benchmark: tight vision-baseline priors cost 31% ATE)
        good, rel = depth_init.triangulation_confidence(
            cfg, cam.fx, cam.fy, rel_sig, exact_baseline=Rt is not None)
        used = tri_ok & back.status & good
        depths = jnp.where(used, z_cur, cfg.default_point_depth)
        sig_rho = rel / jnp.maximum(depths, 1e-3)
        depth_vars = jnp.where(used, sig_rho * sig_rho,
                               cfg.default_point_depth_variance)
    # add_features also seeds klt_ref for the new slots
    if sq:
        filt = sqrt_filter.add_features_factor(
            filt, cfg, cand_uv, cand_valid, depths=depths,
            depth_vars=depth_vars)
    else:
        filt = ekf.add_features(filt, cfg, cand_uv, cand_valid,
                                depths=depths, depth_vars=depth_vars)

    if sq:
        L3 = filt.Sigma[:3, :]
        pos_cov = L3 @ L3.T
    else:
        pos_cov = filt.Sigma[:3, :3]
    out = StepOutputs(
        base_mu=filt.base_mu,
        num_tracked=num_tracked,
        num_active=filt.num_active(),
        mean_innovation=innov,
        pose_cov_diag=_pose_cov_diag(filt, cfg),
        tracking_lost=lost,
        pos_cov=pos_cov,
        mean_nis=nis,
    )
    return EngineState(filt=filt, prev_pyr=cur_pyr,
                       frame_idx=estate.frame_idx + 1,
                       lin_base=new_lin_base), out


@partial(jax.jit, static_argnames=("cfg", "cam"))
def run_sequence(
    images: jnp.ndarray,  # [T, H, W] processed-scale grayscale f32
    times: jnp.ndarray,   # [T]
    cfg: VIOConfig,
    cam: cam_mod.CameraModel,
):
    """Whole-sequence rollout: bootstrap on frame 0, scan over the rest.

    Returns (final EngineState, stacked StepOutputs for frames 1..T-1).
    """
    estate = initialize(images[0], times[0], cfg, cam)

    def body(estate, inp):
        img, t = inp
        return step(estate, img, t, cfg, cam)

    return jax.lax.scan(body, estate, (images[1:], times[1:]))


def initialize_imu(
    images, times, imu_dt, imu_gyro, imu_accel, gravity_w,
    cfg: VIOConfig, cam: cam_mod.CameraModel, init_frames: int,
) -> EngineState:
    """Closed-form visual-inertial initialization over the first
    ``init_frames`` frames (core/vi_init.py), producing an EngineState at
    frame init_frames-1 with a metric velocity and metrically-consistent
    feature depths.  Without it, wrong-depth features drag the velocity
    estimate within a few frames of a cold start (a ~10x trajectory-error
    multiplier on the rendered benchmark).

    The world frame is frame 0's camera frame; the (small) IMU-integration
    pose uncertainty at frame init_frames-1 is absorbed into the anchored
    pose gauge."""
    from ekf_vio_tpu.core import vi_init

    k = init_frames

    # frame-0 detection + chained tracking through frames 1..K-1 as ONE
    # scan (pyramids have static shapes, so the tracker graph compiles
    # once instead of K-1 unrolled copies — a large slice of the
    # mono-inertial cold-compile cost)
    px0, valid0 = replenish.replenish(
        images[0], jnp.zeros((cfg.max_features, 2)),
        jnp.zeros(cfg.max_features, bool), cfg, cfg.max_features)
    pyr0 = pyramid.build_pyramid(images[0], cfg.klt_max_pyramid_level)

    def chain_body(carry, img_i):
        pyr_prev, px_p, valid_p = carry
        pyr_i = pyramid.build_pyramid(img_i, cfg.klt_max_pyramid_level)
        res = klt.track(pyr_prev, pyr_i, px_p, px_p, valid_p, cfg)
        valid_i = valid_p & res.status & cam_mod.in_kill_box(
            cam, res.points, cfg.kill_pad)
        if cfg.min_eigen_rel_gate > 0:  # structure gate, as in step()
            valid_i = valid_i & _rel_eig_keep(res.min_eig, valid_i,
                                              cfg.min_eigen_rel_gate)
        return (pyr_i, res.points, valid_i), (
            cam_mod.pixel_to_metric(cam, res.points), valid_i)

    (pyr, px, valid), (h_scan, valid_scan) = jax.lax.scan(
        chain_body, (pyr0, px0, valid0), images[1:k])
    h_obs = jnp.concatenate(
        [cam_mod.pixel_to_metric(cam, px0)[None], h_scan])   # [K, N, 2]
    valid_obs = jnp.concatenate([valid0[None], valid_scan])  # [K, N]

    # IMU integration + joint (v0, depths[, biases]) alignment
    if cfg.vi_init_estimate_gyro_bias:
        res_a, bg0, ba0 = vi_init.align_with_gyro_bias(
            times[:k], imu_dt[:k - 1], imu_gyro[:k - 1], imu_accel[:k - 1],
            gravity_w, h_obs, valid_obs, rounds=cfg.vi_init_gn_rounds,
            estimate_accel_bias=cfg.vi_init_estimate_accel_bias)
    else:
        R_i, tc_i, tau, _ = vi_init.integrate_motion(
            times[:k], imu_dt[:k - 1], imu_gyro[:k - 1], imu_accel[:k - 1],
            gravity_w)
        res_a = vi_init.align(h_obs, valid_obs, R_i, tc_i, tau)
        bg0 = ba0 = jnp.zeros(3)
    _, _, _, base22 = vi_init.integrate_motion(
        times[:k], imu_dt[:k - 1], imu_gyro[:k - 1], imu_accel[:k - 1],
        gravity_w, v0=res_a.v0_world, gyro_bias=bg0, accel_bias=ba0)
    base22 = base22.at[16:19].set(ba0).at[19:22].set(bg0)

    # aligned features expressed in frame K-1
    RK, tcK = res_a.R_i[k - 1], res_a.tc_i[k - 1]
    tK = tcK - res_a.tau_i[k - 1] * (RK @ res_a.v0_world)
    h0 = jnp.concatenate([h_obs[0], jnp.ones((cfg.max_features, 1))], -1)
    pK = (jnp.einsum("ab,nb->na", RK, h0)
          * res_a.depths0[:, None] + tK)
    keep = valid_obs[k - 1] & res_a.depth_ok & (pK[:, 2] > 0.02)

    filt = ekf.init_state(cfg)
    filt = filt.replace(base_mu=base22,
                        t=jnp.asarray(times[k - 1], filt.t.dtype))
    filt = ekf.add_features(filt, cfg, h_obs[k - 1], keep, depths=pK[:, 2])

    # tightened post-alignment variances: velocity is solved (not a 30-σ²
    # guess), aligned depths carry a relative sigma instead of the prior
    d = jnp.diag(filt.Sigma)
    d = d.at[7:10].set(cfg.init_aligned_velocity_variance)
    d = d.at[16:19].set(cfg.init_accel_bias_sigma**2)
    d = d.at[19:22].set(cfg.init_gyro_bias_sigma**2)
    rho_idx = 22 + 3 * jnp.arange(cfg.max_features) + 2
    sig_rho = cfg.bootstrap_depth_sigma_rel * filt.feat_mu[:, 2]
    d = d.at[rho_idx].set(jnp.where(filt.active, sig_rho * sig_rho,
                                    d[rho_idx]))
    idx = jnp.arange(filt.state_dim)
    filt = filt.replace(Sigma=filt.Sigma.at[idx, idx].set(d))

    if cfg.square_root_form:  # factor once; the loop never re-factors
        from ekf_vio_tpu.core import sqrt_filter

        filt = sqrt_filter.to_factor(filt)

    return EngineState(filt=filt, prev_pyr=pyr, frame_idx=jnp.int32(k),
                       lin_base=filt.base_mu)


@partial(jax.jit, static_argnames=("cfg", "cam", "init_frames"))
def run_sequence_imu(
    images: jnp.ndarray,   # [T, H, W]
    times: jnp.ndarray,    # [T]
    imu_dt: jnp.ndarray,   # [T-1, K] per-interval sample dts (0 = padding)
    imu_gyro: jnp.ndarray,  # [T-1, K, 3]
    imu_accel: jnp.ndarray,  # [T-1, K, 3]
    gravity_w: jnp.ndarray,  # [3]
    cfg: VIOConfig,
    cam: cam_mod.CameraModel,
    init_frames: int = 0,
):
    """Mono-inertial rollout: IMU strapdown between frames, vision update
    at frames (the full north-star pipeline).

    With init_frames > 0 the first frames run the closed-form
    visual-inertial alignment (initialize_imu) before filtering starts."""
    from ekf_vio_tpu.core import imu as imu_mod

    if init_frames > 1:
        estate = initialize_imu(images, times, imu_dt, imu_gyro, imu_accel,
                                gravity_w, cfg, cam, init_frames)
        start = init_frames
    else:
        estate = initialize(images[0], times[0], cfg, cam)
        start = 1

    def body(estate, inp):
        img, t, dts, gy, ac = inp
        batch = imu_mod.ImuSample(dt=dts, gyro=gy, accel=ac)
        return step(estate, img, t, cfg, cam, imu_batch=batch,
                    gravity_w=gravity_w)

    return jax.lax.scan(
        body, estate,
        (images[start:], times[start:], imu_dt[start - 1:],
         imu_gyro[start - 1:], imu_accel[start - 1:]))


def make_hashable_camera(K, width: int, height: int) -> "_StaticCamera":
    """CameraModel with a hashable K for use as a static jit argument."""
    import numpy as np

    k = tuple(map(tuple, np.asarray(K, dtype=np.float32).tolist()))
    return _StaticCamera(k, width, height)


class _StaticCamera(NamedTuple):
    """Hashable CameraModel stand-in (K stored as nested tuples)."""
    K_tuple: tuple
    width: int
    height: int

    @property
    def K(self):
        return jnp.asarray(self.K_tuple, jnp.float32)

    @property
    def fx(self):
        return self.K_tuple[0][0]

    @property
    def fy(self):
        return self.K_tuple[1][1]

    @property
    def cx(self):
        return self.K_tuple[0][2]

    @property
    def cy(self):
        return self.K_tuple[1][2]
