"""Closed-form visual-inertial initialization (alignment).

The reference has no initialization procedure at all — the filter starts
with arbitrary depth priors and huge kinematic variance and lets vision
sort it out (workable for its vision-only random-walk model, fatal for
real IMU fusion: a hundred coherent wrong-depth innovations drag the
velocity estimate within a few frames, and the corrupted velocity then
corrupts every downstream baseline; measured as a ~10x trajectory-error
multiplier on the rendered benchmark).

This module solves the standard alignment problem over the first K
frames, given gravity (the stationary-window estimate of
``imu.estimate_gravity_world``) and zero initial bias:

* rotations R_i and the v0-free translation component come from IMU
  (gyro/accel) integration of the 29-dim compound-motion chain
  (core/imu.py) with v0 = 0 — translation is exactly AFFINE in the
  unknown initial velocity: T_i = tau_i * v0 + beta_i (world frame),
* every feature j tracked from frame 0 to frame i contributes the
  epipolar-style linear constraint

      [h_ji]x ( R_i h_j0 * z_j + t_i(v0) ) = 0,

  linear in (z_j, v0) jointly,
* per-feature depths are eliminated by a Schur complement, leaving one
  3x3 solve for v0, then back-substitution for all z_j.

The result seeds the filter at frame K-1 with a metric velocity and
metrically-consistent feature depths, after which the tightly-coupled
EKF (the reference architecture) takes over.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core import imu as imu_mod, lie


class AlignmentResult(NamedTuple):
    v0_world: jnp.ndarray     # [3] initial velocity (world = frame-0 cam)
    depths0: jnp.ndarray      # [N] frame-0 depths of the tracked features
    depth_ok: jnp.ndarray     # [N] solved with enough parallax/conditioning
    R_i: jnp.ndarray          # [K, 3, 3] frame-0 -> frame-i camera action
    tc_i: jnp.ndarray         # [K, 3]   translation with v0 = 0
    tau_i: jnp.ndarray        # [K]      elapsed time per frame


def integrate_motion(times, imu_dt, imu_gyro, imu_accel, gravity_w,
                     v0=None, gyro_bias=None, accel_bias=None):
    """Gyro/accel integration across the first K frames.

    With v0 = None (the alignment pass) the initial velocity is zero and
    the returned compound translations are the v0-free component:
    the camera action frame0 -> frame_i is
    p_i = R_i p_0 + (tc_i − tau_i R_i v0)  for any true v0.

    ``gyro_bias`` is subtracted from every gyro sample (the alignment's
    bias estimate — equivalent to a nonzero bias state, which the 29-dim
    chain starts at zero).

    Returns (R_i [K,3,3], tc_i [K,3], tau_i [K], base22) where base22 is
    the integrated base state at frame K-1 (world frame = frame 0)."""
    k = times.shape[0]
    s_per = imu_dt.shape[1]
    v0 = jnp.zeros(3) if v0 is None else v0
    bg = jnp.zeros(3) if gyro_bias is None else gyro_bias
    ba = jnp.zeros(3) if accel_bias is None else accel_bias
    # biases ride the state (imu._mean_chain subtracts them from every
    # sample — identical to subtracting from the measurements); the
    # returned base22's bias slots are overwritten by the caller
    x0 = jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0, 0, 0]),
                          v0, jnp.zeros(6), ba, bg,
                          jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)])

    # closed-form chain over all (k-1)·S samples (imu._mean_chain: one
    # cumulative quaternion product + prefix sums) — the sequential
    # per-sample scan this replaces was ~7 ms per invocation and the
    # GN bias refinement re-invokes it (with jacfwd) every round,
    # ~45 ms of the mono-inertial startup.  Differentiable in the
    # biases through x0 (the GN passes ride jacfwd over this).
    batch = imu_mod.ImuSample(
        dt=imu_dt[:k - 1].reshape(-1),
        gyro=imu_gyro[:k - 1].reshape(-1, 3),
        accel=imu_accel[:k - 1].reshape(-1, 3))
    x_fin, xs_pre = imu_mod._mean_chain(x0, batch, gravity_w)
    # frame boundaries: the state after i·s_per samples is the PRE-state
    # of sample i·s_per (i < k-1), and x_fin for the last frame
    mids = xs_pre[s_per::s_per]                        # [(k-2), 29]
    ends = jnp.concatenate([mids, x_fin[None]])
    quats = jnp.concatenate([jnp.array([[1.0, 0, 0, 0]]), ends[:, 22:26]])
    Rs = jax.vmap(lie.quat_to_matrix)(quats)
    tcs = jnp.concatenate([jnp.zeros((1, 3)), ends[:, 26:29]])
    tau = jnp.asarray(times) - times[0]
    return Rs, tcs, tau, x_fin[0:22]


def align(h_obs, valid, R_i, tc_i, tau_i,
          min_parallax: float = 1e-4):
    """Solve the joint linear system for (v0, depths).

    h_obs: [K, N, 2] metric feature tracks (frame 0 row = initial pos).
    valid: [K, N] per-frame track validity (chained).
    Returns AlignmentResult."""
    k, n = valid.shape
    h0 = jnp.concatenate([h_obs[0], jnp.ones((n, 1))], -1)    # [N, 3]

    # constraints for frames 1..K-1 (frame 0 is the anchor)
    def per_frame(i):
        hi = jnp.concatenate([h_obs[i], jnp.ones((n, 1))], -1)
        Rh0 = jnp.einsum("ab,nb->na", R_i[i], h0)             # [N, 3]
        a = jnp.cross(hi, Rh0)                                # [h_i]x R h0
        # t_i(v0) = tc_i − tau_i R_i v0  →  [h_i]x t_i = c + M v0
        cx_t = jnp.cross(hi, jnp.broadcast_to(tc_i[i], hi.shape))
        # M v0 = −tau_i [h_i]x (R_i v0): build [N, 3, 3]
        M = -tau_i[i] * jnp.einsum("nab,bc->nac", lie.skew(hi), R_i[i])
        ok = valid[i] & valid[0]
        return a, M, cx_t, ok

    A, M, C, OK = [], [], [], []
    for i in range(1, k):
        a, m, c, ok = per_frame(i)
        A.append(a), M.append(m), C.append(c), OK.append(ok)
    A = jnp.stack(A)    # [K-1, N, 3]  coefficient of z_j
    M = jnp.stack(M)    # [K-1, N, 3, 3]  coefficient of v0
    C = -jnp.stack(C)   # [K-1, N, 3]  constants (a z + M v0 + [h]x t = 0)
    OK = jnp.stack(OK)[..., None].astype(A.dtype)  # [K-1, N, 1]

    A = A * OK
    M = M * OK[..., None]
    C = C * OK

    # Schur elimination of each z_j:  rows (a_r z + M_r v0 = c_r)
    ata = jnp.sum(A * A, axis=(0, 2))                         # [N]
    cond_ok = ata > min_parallax
    ata_safe = jnp.where(cond_ok, ata, 1.0)
    atM = jnp.einsum("kna,knab->nb", A, M)                    # [N, 3]
    atc = jnp.einsum("kna,kna->n", A, C)                      # [N]

    # projected normal equations for v0; zero-parallax features carry no
    # translation information and are excluded entirely (including their
    # raw M-blocks — keeping those would bias v0 toward zero)
    MtM = jnp.einsum("knab,knac->nbc", M, M)                  # [N, 3, 3]
    Mtc = jnp.einsum("knab,kna->nb", M, C)                    # [N, 3]
    w = cond_ok.astype(A.dtype)
    proj = w / ata_safe
    H = jnp.sum(w[:, None, None] * MtM
                - proj[:, None, None] * atM[:, :, None] * atM[:, None, :],
                axis=0)
    b = jnp.sum(w[:, None] * Mtc - proj[:, None] * atM * atc[:, None], axis=0)
    v0 = jnp.linalg.solve(H + 1e-8 * jnp.eye(3), b)

    z = (atc - atM @ v0) / ata_safe
    ok = cond_ok & (z > 0.01) & (z < 100.0)
    return AlignmentResult(v0_world=v0, depths0=z, depth_ok=ok,
                           R_i=R_i, tc_i=tc_i, tau_i=tau_i)


def align_with_gyro_bias(times, imu_dt, imu_gyro, imu_accel, gravity_w,
                         h_obs, valid, rounds: int = 2,
                         estimate_accel_bias: bool = True):
    """Joint alignment with IMU-bias refinement (Gauss-Newton
    alternation).

    A gyro bias of even ~0.005 rad/s, integrated with the zero-bias
    assumption, tilts every R_i of the alignment window and the filter
    then has to burn it off as a yaw/bias transient (measured: a >1°
    yaw excursion in the first 2 s); an unmodeled accel bias likewise
    corrupts tc_i quadratically in τ.  Here both become variables:

        repeat `rounds` times:
          1. integrate R_i, tc_i with the current bias estimates
          2. closed-form (v0, depths) via `align`
          3. Gauss-Newton step on b = [bg, ba] over the epipolar
             residuals
             r_ij(b) = [h_ij]x (R_i(b) h_j0 z_j + tc_i(b) − τ_i R_i(b) v0)
             with dr/db by forward-mode autodiff through the
             integration chain

    Returns (AlignmentResult, bg, ba).  The epipolar geometry over a
    ~60° field of view resolves rotation vs translation well enough to
    pin bg to a few 1e-4 rad/s on the rendered benchmark; ba is only
    observable through its τ²/2 signature and needs a ≳1 s window."""
    b = jnp.zeros(6)

    def residuals(b_, v0, z, depth_ok):
        # depth_ok gates the residual mask too: a feature whose depth was
        # not solved (z forced to 0) would otherwise still contribute the
        # model-inconsistent term [h_i]x t_i and bias the Gauss-Newton
        # bias estimate whenever low-parallax tracks are present.
        R_i, tc_i, tau, _ = integrate_motion(
            times, imu_dt, imu_gyro, imu_accel, gravity_w,
            gyro_bias=b_[0:3], accel_bias=b_[3:6])
        k, n = valid.shape
        h0 = jnp.concatenate([h_obs[0], jnp.ones((n, 1))], -1)
        out = []
        for i in range(1, k):
            hi = jnp.concatenate([h_obs[i], jnp.ones((n, 1))], -1)
            t_i = tc_i[i] - tau[i] * (R_i[i] @ v0)
            p = (jnp.einsum("ab,nb->na", R_i[i], h0) * z[:, None] + t_i)
            r = jnp.cross(hi, p)
            w = (valid[i] & valid[0] & depth_ok).astype(r.dtype)[:, None]
            out.append(r * w)
        return jnp.concatenate(out).reshape(-1)

    nb = 6 if estimate_accel_bias else 3
    res = None
    for _ in range(rounds):
        R_i, tc_i, tau, _ = integrate_motion(
            times, imu_dt, imu_gyro, imu_accel, gravity_w,
            gyro_bias=b[0:3], accel_bias=b[3:6])
        res = align(h_obs, valid, R_i, tc_i, tau)
        z = jnp.where(res.depth_ok, res.depths0, 0.0)
        r = residuals(b, res.v0_world, z, res.depth_ok)
        J = jax.jacfwd(residuals)(b, res.v0_world, z, res.depth_ok)  # [M, 6]
        J = J[:, :nb]
        JtJ = J.T @ J
        # mild prior (Levenberg) keeps the weakly-observed ba components
        # from absorbing epipolar noise on short windows
        damp = jnp.diag(jnp.concatenate(
            [jnp.full(3, 1e-8), jnp.full(3, 1e-4)])[:nb])
        delta = jnp.linalg.solve(JtJ + damp, -(J.T @ r))
        # trust region: an alignment-window bias is never > ~0.05 / 0.2
        delta = jnp.clip(delta, -0.2, 0.2)
        b = b.at[:nb].add(delta)
        b = b.at[0:3].set(jnp.clip(b[0:3], -0.05, 0.05))
        b = b.at[3:6].set(jnp.clip(b[3:6], -0.3, 0.3))

    R_i, tc_i, tau, _ = integrate_motion(
        times, imu_dt, imu_gyro, imu_accel, gravity_w,
        gyro_bias=b[0:3], accel_bias=b[3:6])
    res = align(h_obs, valid, R_i, tc_i, tau)
    return res, b[0:3], b[3:6]


def reprojection_errors(res: AlignmentResult, h_obs, valid):
    """Mean per-feature reprojection residual of the aligned solution —
    the quality gate for accepting the initialization."""
    k, n = valid.shape
    h0 = jnp.concatenate([h_obs[0], jnp.ones((n, 1))], -1)
    errs = []
    for i in range(1, k):
        t_i = res.tc_i[i] - res.tau_i[i] * (res.R_i[i] @ res.v0_world)
        p = (jnp.einsum("ab,nb->na", res.R_i[i], h0) * res.depths0[:, None]
             + t_i)
        proj = p[:, :2] / jnp.clip(p[:, 2:3], 1e-6, None)
        e = jnp.linalg.norm(proj - h_obs[i], axis=-1)
        errs.append(jnp.where(valid[i] & valid[0] & res.depth_ok, e, 0.0))
    cnt = jnp.maximum(jnp.sum(
        (jnp.stack([valid[i] & valid[0] for i in range(1, k)])
         & res.depth_ok[None]).astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.stack(errs)) / cnt
