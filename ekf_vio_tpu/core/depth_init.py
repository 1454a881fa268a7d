"""Two-view feature depth initialization (triangulation).

The reference initializes every new feature at DEFAULT_POINT_DEPTH=0.5 m
(reference: TightlyCoupledEKF.cpp:79) and carries two *offline Octave
prototypes* for doing better that were never wired into the C++
(reference: octave/linear_depth_sol.m — closed-form depth via orthogonal
projection onto the epipolar line, ending in C-code export; and
octave/depth_optim.m — 1-D Gauss-Newton on the reprojection residual).
Here both are implemented, batched, and wired into the engine behind
``triangulate_new_features``.

Geometry: a feature with homogeneous coords h1 in the previous camera
frame and h2 in the current frame, camera motion taking frame-1 points to
frame-2 points as p2 = R p1 + t.  The linear solve minimizes
‖[h2]× (R h1 z + t)‖² over the frame-1 depth z (closed form); the GN
refinement then polishes z against the reprojection residual
r(z) = π(R h1 z + t) − h2[0:2].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ekf_vio_tpu.core import lie

MIN_POINT_Z = 0.02   # D_MIN_POINT_Z (Params.h:100)
MAX_POINT_Z = 10.0   # D_MAX_POINT_Z (Params.h:99)
MIN_DEPTH_DETERMINANT = 1e-3  # D_MINIMUM_DEPTH_DETERMINANT (Params.h:92)


def relative_motion(base_mu, dt):
    """(R, t) of the frame-to-frame camera motion from the filter state:
    p_cur = R p_prev + t — the same transform feature transport applies
    (TightlyCoupledEKF.cpp:449-450)."""
    omega = base_mu[10:13]
    vel = base_mu[7:10]
    accel = base_mu[13:16]
    dq_inv = lie.quat_conj(lie.quat_exp_omega(omega, dt))
    R = lie.quat_to_matrix(dq_inv)
    t = -lie.quat_rotate(dq_inv, dt * vel + 0.5 * dt * dt * accel)
    return R, t


def linear_depth(h1: jnp.ndarray, h2: jnp.ndarray, R: jnp.ndarray,
                 t: jnp.ndarray):
    """Closed-form frame-1 depth (batched over leading dims).

    h1, h2: [..., 2] homogeneous (normalized) image coords.
    Returns (z1, ok): depth in the previous frame and a validity mask
    (well-conditioned + positive + in [MIN_POINT_Z, MAX_POINT_Z])."""
    h1h = jnp.concatenate([h1, jnp.ones_like(h1[..., :1])], -1)
    h2h = jnp.concatenate([h2, jnp.ones_like(h2[..., :1])], -1)
    rh1 = jnp.einsum("ij,...j->...i", R, h1h)
    a = jnp.cross(h2h, rh1)      # [h2]× R h1
    c = jnp.cross(h2h, jnp.broadcast_to(t, h2h.shape))  # [h2]× t
    den = jnp.sum(a * a, -1)
    ok = den > MIN_DEPTH_DETERMINANT * MIN_DEPTH_DETERMINANT
    z = -jnp.sum(a * c, -1) / jnp.where(ok, den, 1.0)
    ok = ok & (z > MIN_POINT_Z) & (z < MAX_POINT_Z)
    return z, ok


def refine_depth_gn(h1, h2, R, t, z0, iters: int = 5):
    """1-D Gauss-Newton on the reprojection residual (depth_optim.m
    semantics: iterate z ← z − (JᵀJ)⁻¹ Jᵀ r with J = dr/dz), batched."""
    h1h = jnp.concatenate([h1, jnp.ones_like(h1[..., :1])], -1)
    rh1 = jnp.einsum("ij,...j->...i", R, h1h)

    def resid(z):
        p = rh1 * z[..., None] + t
        return p[..., :2] / p[..., 2:3] - h2

    def body(z, _):
        r = resid(z)
        # dr/dz analytically: d/dz [ (a z + tx)/(c z + tz) ] etc.
        p = rh1 * z[..., None] + t
        num = rh1[..., :2]
        den = p[..., 2:3]
        J = (num * den - p[..., :2] * rh1[..., 2:3]) / (den * den)
        jtj = jnp.sum(J * J, -1)
        jtr = jnp.sum(J * r, -1)
        step = jtr / jnp.where(jtj > 1e-12, jtj, 1.0)
        z = jnp.clip(z - step, MIN_POINT_Z, MAX_POINT_Z)
        return z, None

    z, _ = jax.lax.scan(body, z0, None, length=iters)
    return z


def triangulation_confidence(cfg, fx, fy, rel_sigma, exact_baseline: bool):
    """Shared gating/width policy for two-view depths (single source for
    the dense AND sharded engines' boot + replenish paths).

    Returns (mean_ok [N] bool, rel [N]):
      * mean_ok — accept the triangulated MEAN: expected relative depth
        error σ_angle·rel_sigma below cfg.triangulation_max_rel_error
        (a wrong mean poisons the transport linearization no matter how
        wide the prior);
      * rel — relative 1σ width for the depth prior: the geometric
        amplification (2x safety) FLOORED by how much of the error model
        is actually known — with an exact (IMU-integrated) baseline the
        angular-noise model is the whole story (floor = the bootstrap
        relative sigma); a filter-velocity baseline is itself uncertain
        (circular), so the prior stays near-uninformative (100%).
    Use σ_ρ = rel·ρ (equivalently σ_z = rel·z).
    """
    sigma_ang = jnp.sqrt(cfg.klt_measurement_variance_px) * 2.0 / (fx + fy)
    mean_ok = sigma_ang * rel_sigma < cfg.triangulation_max_rel_error
    rel_floor = cfg.bootstrap_depth_sigma_rel if exact_baseline else 1.0
    rel = jnp.maximum(2.0 * sigma_ang * rel_sigma, rel_floor)
    return mean_ok, rel


def triangulate_depths(h_prev, h_cur, base_mu, dt, default_depth: float,
                       refine: bool = True, Rt=None, return_rel_sigma=False):
    """Frame-*current* depths for new features seen in both frames.

    Returns (z_cur [N], used_triangulation [N]) — and, with
    ``return_rel_sigma``, additionally the per-feature RELATIVE depth
    standard error per unit angular measurement noise:

        σ_z / z ≈ σ_angle · rel_sigma,   rel_sigma = 1 / |[h2]× R h1|

    (first-order: the depth solve divides the baseline-induced epipolar
    offset by the ray-crossing magnitude, so angular noise amplifies by
    1/parallax).  Callers scale the new feature's depth-prior variance by
    this instead of trusting a constant — two-view triangulation from
    consecutive frames is near-degenerate (parallax ~ σ) and a
    confidently-wrong depth transported through the filter is the failure
    mode a constant prior invites.

    Rt, when given, is the exact inter-frame camera motion (R, t) —
    mandatory under IMU propagation, where the dt·vel reconstruction of
    ``relative_motion`` does not describe the actual baseline."""
    R, t = Rt if Rt is not None else relative_motion(base_mu, dt)
    z1, ok = linear_depth(h_prev, h_cur, R, t)
    z1 = jnp.where(ok, z1, default_depth)
    if refine:
        z1r = refine_depth_gn(h_prev, h_cur, R, t, z1)
        z1 = jnp.where(ok, z1r, z1)
    # express in the current frame: z_cur = (R h1 z1 + t)_z
    h1h = jnp.concatenate([h_prev, jnp.ones_like(h_prev[..., :1])], -1)
    z_cur = jnp.einsum("ij,...j->...i", R, h1h)[..., 2] * z1 + t[2]
    z_cur = jnp.clip(z_cur, MIN_POINT_Z, MAX_POINT_Z)
    z_out = jnp.where(ok, z_cur, default_depth)
    if not return_rel_sigma:
        return z_out, ok
    h2h = jnp.concatenate([h_cur, jnp.ones_like(h_cur[..., :1])], -1)
    rh1 = jnp.einsum("ij,...j->...i", R, h1h)
    cross = jnp.linalg.norm(jnp.cross(h2h, rh1), axis=-1)
    rel_sigma = 1.0 / jnp.maximum(cross, 1e-6)
    return z_out, ok, rel_sigma
