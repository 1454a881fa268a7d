"""Quaternion / rotation utilities (pure jnp, fully batchable).

The reference vendors the Sophus Lie-group library but uses none of it
(SURVEY.md §2 item 8); all it actually needs are Hamilton quaternion
products, rotations, and the axis-angle exponential used by the motion
model (reference: TightlyCoupledEKF.cpp:340-362).  These are implemented
here as safe, autodiff-friendly closed forms — no branches, so they trace
cleanly under jit/vmap/jacfwd.

Convention: quaternions are stored [w, x, y, z] (Hamilton, matching
Eigen::Quaternionf(w, x, y, z) as the reference constructs them).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, batched over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v.

    Uses the expanded two-cross-product form (cheaper than q v q*):
      v' = v + 2 w (u × v) + 2 u × (u × v),  u = vector part.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_exp_omega(omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Incremental rotation dq for body rate ω over dt.

    Matches the reference's axis-angle construction
    dq = [cos(θ/2), ω̂ sin(θ/2)], θ = dt‖ω‖ (TightlyCoupledEKF.cpp:349-355),
    expressed branch-free so the θ→0 limit *and its derivatives* are exact.
    The norm is never differentiated at 0: the small-θ branch is a
    polynomial in θ² (whose autodiff is finite), and the large-θ branch
    sees a θ² safely bounded away from zero — this avoids the NaN-gradient
    trap of ‖ω‖ at ω=0.  (The reference's small-angle branch at ‖ω‖<1e-10,
    TightlyCoupledEKF.cpp:344-347, normalizes [1, ω·dt]; at that magnitude
    both forms agree to machine precision.)
    """
    t2 = jnp.sum(omega * omega, axis=-1, keepdims=True) * (dt * dt)  # θ²
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    # w = cos(θ/2):       series 1 − θ²/8 + θ⁴/384
    w = jnp.where(small, 1.0 - t2 / 8.0 + t2 * t2 / 384.0, jnp.cos(theta / 2.0))
    # k = sin(θ/2)/θ:     series 1/2 − θ²/48 + θ⁴/3840
    k = jnp.where(
        small, 0.5 - t2 / 48.0 + t2 * t2 / 3840.0, jnp.sin(theta / 2.0) / theta
    )
    xyz = omega * dt * k
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix from unit quaternion (batched)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [v]×, batched."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        axis=-2,
    )
