"""Pyramidal Lucas-Kanade feature tracker — batched, jit-compiled.

Reimplements the tracking semantics the reference gets from
cv::calcOpticalFlowPyrLK (reference: KLTTracker.cpp:61-64):

* 21x21 window, 3 pyramid levels, 30 iterations, eps 0.01
  (Params.h:36,103-104)
* OPTFLOW_USE_INITIAL_FLOW — the search is seeded at the EKF-predicted
  feature positions (KLTTracker.cpp:53-59), which is what couples the
  front-end to the filter
* minimum-eigenvalue rejection: min_eig(G)/window_area < threshold fails
  the feature (KLT_MIN_EIGEN, Params.h:36)
* per-feature constant 2x2 measurement covariance converted to metric by
  1/f² (KLTTracker.cpp:75-84)

TPU-native design: every feature is a row of a batch — patch extraction is
a vectorized bilinear gather [N, window²], the normal equations are
closed-form 2x2 solves on the VPU, and the iteration loop is a
``lax.while_loop`` with a per-feature convergence mask (no data-dependent
shapes).  The pyramid level loop is a static Python unroll (shapes differ
per level).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.frontend import pyramid as pyr_mod


class TrackResult(NamedTuple):
    points: jnp.ndarray   # [N, 2] tracked positions (px, level-0 coords)
    status: jnp.ndarray   # [N] bool — tracked successfully
    error: jnp.ndarray    # [N] mean |residual| over the window
    min_eig: jnp.ndarray  # [N] min eigenvalue of G / window area (level 0)


def sample_bilinear(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation. img: [H, W]; pts: [..., 2] as (x, y).

    Out-of-range coordinates clamp to the border (callers bound-check
    separately); implemented as a flat gather, the TPU-friendly form.
    """
    h, w = img.shape
    x = pts[..., 0]
    y = pts[..., 1]
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(-1)
    idx = y0i * w + x0i
    v00 = jnp.take(flat, idx)
    v01 = jnp.take(flat, idx + 1)
    v10 = jnp.take(flat, idx + w)
    v11 = jnp.take(flat, idx + w + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _window_offsets(win: int) -> jnp.ndarray:
    """[win², 2] integer offsets centered on 0."""
    half = (win - 1) // 2
    r = jnp.arange(win, dtype=jnp.float32) - half
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)


def _track_level(
    prev_img, prev_ix, prev_iy, cur_img, q, g, valid, cfg: VIOConfig
):
    """One pyramid level of LK for all N features.

    q: [N,2] feature positions in *this level's* prev image.
    g: [N,2] current guesses in this level's cur image.
    Returns (g_new, min_eig, mean_abs_residual, in_bounds).
    """
    win = cfg.klt_window_size
    offs = _window_offsets(win)  # [P,2]
    h, w = prev_img.shape
    half = (win - 1) // 2

    pcoords = q[:, None, :] + offs[None]  # [N,P,2]
    patch = sample_bilinear(prev_img, pcoords)
    ix = sample_bilinear(prev_ix, pcoords)
    iy = sample_bilinear(prev_iy, pcoords)

    gxx = jnp.sum(ix * ix, axis=-1)
    gxy = jnp.sum(ix * iy, axis=-1)
    gyy = jnp.sum(iy * iy, axis=-1)

    # min eigenvalue of [[gxx, gxy],[gxy, gyy]] / window area
    tr = gxx + gyy
    det_half = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 / 4.0 + gxy * gxy, 0.0))
    min_eig = (tr / 2.0 - det_half) / (win * win)

    det = gxx * gyy - gxy * gxy
    inv_ok = det > 1e-12
    det_safe = jnp.where(inv_ok, det, 1.0)
    # inverse of G, guarded
    i00 = gyy / det_safe
    i01 = -gxy / det_safe
    i11 = gxx / det_safe

    def body(carry):
        it, g, done = carry
        ccoords = g[:, None, :] + offs[None]
        cur = sample_bilinear(cur_img, ccoords)
        r = patch - cur  # prev − cur
        bx = jnp.sum(r * ix, axis=-1)
        by = jnp.sum(r * iy, axis=-1)
        dx = i00 * bx + i01 * by
        dy = i01 * bx + i11 * by
        delta = jnp.stack([dx, dy], axis=-1)
        step_ok = valid & ~done & inv_ok
        g = g + jnp.where(step_ok[:, None], delta, 0.0)
        done = done | (jnp.sum(delta * delta, axis=-1) < cfg.klt_eps**2)
        return it + 1, g, done

    def cond(carry):
        it, _, done = carry
        return (it < cfg.klt_iterations) & ~jnp.all(done | ~valid)

    done0 = jnp.zeros(q.shape[0], bool)
    _, g, _ = jax.lax.while_loop(cond, body, (0, g, done0))

    # residual error at convergence
    cur = sample_bilinear(cur_img, g[:, None, :] + offs[None])
    err = jnp.mean(jnp.abs(patch - cur), axis=-1)

    # Track-loss test: the point itself must stay inside the level image
    # (windows may overhang — sampling clamp-replicates, the same border
    # model as OpenCV's padded pyramid).  The caller's kill-pad test
    # (KLTTracker.cpp:73) is the real border gate.
    del half
    in_bounds = (
        (g[:, 0] >= 1)
        & (g[:, 1] >= 1)
        & (g[:, 0] < w - 2)
        & (g[:, 1] < h - 2)
        & (q[:, 0] >= 1)
        & (q[:, 1] >= 1)
        & (q[:, 0] < w - 2)
        & (q[:, 1] < h - 2)
    )
    return g, min_eig, err, in_bounds & inv_ok


def track(
    prev_pyr: tuple,
    cur_pyr: tuple,
    prev_pts: jnp.ndarray,
    init_pts: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: VIOConfig,
) -> TrackResult:
    """Pyramidal LK over all features at once.

    prev_pyr / cur_pyr: tuples from build_pyramid (levels+1 images).
    prev_pts: [N,2] px positions in the previous frame (level 0).
    init_pts: [N,2] px initial guesses in the current frame — the
      EKF-predicted positions (OPTFLOW_USE_INITIAL_FLOW seeding,
      KLTTracker.cpp:53-64).
    valid: [N] bool — which rows are real features.
    """
    levels = len(prev_pyr) - 1
    # Skip levels smaller than the tracking window (cv::
    # buildOpticalFlowPyramid clamps maxLevel the same way) — a 21x21
    # window on a 16x16 level only aliases border content.
    win = cfg.klt_window_size
    top = 0
    for lvl in range(levels + 1):
        if min(prev_pyr[lvl].shape) >= win:
            top = lvl
    g = init_pts / float(2**top)
    ok = valid
    min_eig0 = jnp.zeros(prev_pts.shape[0])
    err0 = jnp.zeros(prev_pts.shape[0])

    for lvl in range(top, -1, -1):
        s = float(2**lvl)
        prev_img = prev_pyr[lvl]
        cur_img = cur_pyr[lvl]
        ix, iy = pyr_mod.gradients(prev_img)
        q = prev_pts / s
        g, min_eig, err, inb = _track_level(prev_img, ix, iy, cur_img, q, g, ok, cfg)
        ok = ok & inb
        if lvl > 0:
            g = g * 2.0
        else:
            min_eig0, err0 = min_eig, err

    status = ok & (min_eig0 > cfg.klt_min_eigen)
    return TrackResult(points=g, status=status, error=err0, min_eig=min_eig0)


def measurement_covariance_metric(cam_fx, cam_fy, n: int, cfg: VIOConfig):
    """Constant per-feature 2x2 R in metric units: diag(σ²_px) scaled by
    1/f² (KLTTracker.cpp:75-84, estimateUncertainty cpp:100-106)."""
    var = jnp.stack(
        [cfg.klt_measurement_variance_px / (cam_fx * cam_fx),
         cfg.klt_measurement_variance_px / (cam_fy * cam_fy)]
    )
    return jnp.tile(jnp.diag(var)[None], (n, 1, 1))


def estimate_uncertainty_sample_based(
    prev_img, cur_img, mu_ref, mu, k: float = 0.01, window_size: int = 5
):
    """Sample-based SSD covariance estimator.

    Port of the reference's (written but unused) estimator
    (KLTTracker.cpp:111-175): SSD between the reference patch and patches
    sampled on a 5x5 grid of ±10px offsets, Gaussian-weighted into a 2x2
    covariance.  Batched over features.
    """
    offs = jnp.arange(-10.0, 10.1, 5.0)
    du, dv = jnp.meshgrid(offs, offs, indexing="ij")
    duv = jnp.stack([du.reshape(-1), dv.reshape(-1)], -1)  # [25, 2]
    woffs = _window_offsets(window_size)  # [ws², 2]

    ref = sample_bilinear(prev_img, mu_ref[:, None, :] + woffs[None])  # [N,ws²]
    # samples: [N, 25, ws²]
    pts = mu[:, None, None, :] + duv[None, :, None, :] + woffs[None, None, :, :]
    smp = sample_bilinear(cur_img, pts)
    ssd = jnp.mean((ref[:, None, :] - smp) ** 2, axis=-1)  # [N, 25]
    rd = jnp.exp(-k * ssd)
    s = jnp.sum(rd, axis=-1)
    xx = jnp.sum(rd * (duv[None, :, 0] ** 2), axis=-1) / s
    yy = jnp.sum(rd * (duv[None, :, 1] ** 2), axis=-1) / s
    xy = jnp.sum(rd * duv[None, :, 0] * duv[None, :, 1], axis=-1) / s
    return jnp.stack(
        [jnp.stack([xx, xy], -1), jnp.stack([xy, yy], -1)], axis=-2
    )  # [N, 2, 2]
