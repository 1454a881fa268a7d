"""Pallas pyramidal-LK level kernel — the tracker's hot loop as ONE fused
TPU kernel.

Replaces the XLA one-hot-matmul level tracker (frontend/klt.py
``_track_level``) on TPU for levels of at least 40x40 that fit VMEM.
Two hardware facts drive the design:

* Kernel count: the XLA level loop emits dozens of kernels whose fixed
  dispatch cost dominates measured latency on this hardware; here patch
  extraction, template sampling, Scharr gradients, the 2x2 normal
  equations and all LK iterations run inside a single ``pallas_call``.
* Patch gather: the level image is staged into VMEM once and per-feature
  40x40 patches are extracted with ONE flat bf16 MXU matmul
  ([B*40, H] row selectors x [H, W] image, then a batched column
  compaction).  A DMA-per-feature variant (aligned HBM strips) was
  measured first: 256 small DMAs cost ~0.4 ms of issue latency — more
  than the whole matmul extraction (git history has the implementation).

Window sampling keeps the gather-free formulation: a rigidly-moving
window with one shared fractional offset is exactly ``Ry @ patch @ Cxᵀ``
with interpolating one-hot selectors built on the VPU and contracted on
the MXU; one-hot selectors are exact in bf16 and the image is 8-bit data,
so bf16 extraction costs no accuracy the f32 LK solve would see.

Mosaic constraints honored: everything stays rank>=2 (per-feature
scalars are [B, 1]); reshapes only split/merge leading (non-lane) dims;
loop carries are f32 (i1 vector carries fail legalization).

Semantics match ``klt._track_level``: clamp-replicate borders, min-eigen
rejection, per-level ±margin search bound, eps-squared convergence mask.
Reference semantics: 21x21 window, 30 iters, eps 0.01, min-eigen
rejection (KLTTracker.cpp:61-64, Params.h:36,103-104).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MARGIN = 5          # px search range beyond the seed (klt._SEARCH_MARGIN)
PATCH = 40           # per-feature patch (win + 2*margin + slack)
_BLOCK = 32          # features per grid program
_PAD = 17            # patch origin: floor(pos) - _PAD


def _selector(base_i, frac, rows, size, dtype):
    """[B, rows, size] interpolating one-hot selectors: row i blends
    columns (base+i, base+i+1) with weight frac; indices clamp-replicate
    (the XLA path's border model).  base_i / frac are [B, 1]."""
    nb = base_i.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, rows, size), 2)
    idx = base_i[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (nb, rows, size), 1)
    a = jnp.clip(idx, 0, size - 1)
    b = jnp.clip(idx + 1, 0, size - 1)
    f = frac[:, :, None].astype(dtype)
    return (jnp.where(cols == a, 1.0, 0.0).astype(dtype) * (1.0 - f)
            + jnp.where(cols == b, 1.0, 0.0).astype(dtype) * f)


def _int_selector(base_i, rows, size, dtype):
    """[B, rows, size] plain one-hot selectors at integer offsets."""
    nb = base_i.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, rows, size), 2)
    idx = base_i[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (nb, rows, size), 1)
    return jnp.where(cols == jnp.clip(idx, 0, size - 1), 1.0, 0.0).astype(dtype)


def _bdot(a, b):  # [B,m,k] @ [B,k,n] -> [B,m,n], f32 accumulate
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _bdot_t(a, b):  # [B,m,k] @ [B,n,k] -> [B,m,n]
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _scharr(patch):
    """Scharr x/y derivative patches (smooth [3,10,3]/32 ⊗ derive
    [-1,0,1]), edge-replicated — pure VPU shifts on [B, H, W]."""
    def shift_rows(x, d):
        if d == 0:
            return x
        if d > 0:
            return jnp.concatenate([x[:, d:, :], x[:, -1:, :].repeat(d, 1)], 1)
        return jnp.concatenate([x[:, :1, :].repeat(-d, 1), x[:, :d, :]], 1)

    def shift_cols(x, d):
        if d == 0:
            return x
        if d > 0:
            return jnp.concatenate([x[:, :, d:], x[:, :, -1:].repeat(d, 2)], 2)
        return jnp.concatenate([x[:, :, :1].repeat(-d, 2), x[:, :, :d]], 2)

    s = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
    sm_r = sum(shift_rows(patch, d) * s[d + 1] for d in (-1, 0, 1))
    sm_c = sum(shift_cols(patch, d) * s[d + 1] for d in (-1, 0, 1))
    gx = shift_cols(sm_r, 1) - shift_cols(sm_r, -1)
    gy = shift_rows(sm_c, 1) - shift_rows(sm_c, -1)
    return gx, gy


def _sample(patch, center, win):
    """Bilinear [B, win, win] windows from [B, PATCH, PATCH] patches at
    float in-patch centers [B, 2] (x, y)."""
    base = center - (win - 1) / 2.0
    bx = jnp.floor(base[:, 0:1])
    by = jnp.floor(base[:, 1:2])
    ry = _selector(by.astype(jnp.int32), base[:, 1:2] - by, win, PATCH,
                   patch.dtype)
    cx = _selector(bx.astype(jnp.int32), base[:, 0:1] - bx, win, PATCH,
                   patch.dtype)
    return _bdot_t(_bdot(ry, patch), cx)


def _patches_from_image(img_ref, px0, py0, b):
    """Extract [B, PATCH, PATCH] f32 patches from a VMEM image ref at
    integer origins (px0, py0) [B, 1] each."""
    h, w = img_ref.shape
    img16 = img_ref[:].astype(jnp.bfloat16)
    rowsel = _int_selector(py0, PATCH, h, jnp.bfloat16)       # [B,40,H]
    flat = rowsel.reshape(b * PATCH, h)                       # merge lead dims
    rows = jax.lax.dot_general(
        flat, img16, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [B*40, W]
    rows3 = rows.astype(jnp.bfloat16).reshape(b, PATCH, w)    # split lead dim
    colsel = _int_selector(px0, PATCH, w, jnp.bfloat16)       # [B,40,W]
    return _bdot_t(rows3, colsel)                             # [B,40,40] f32


def _kernel(prev_ref, cur_ref,                # [H, W] f32 in VMEM
            q_ref, g_ref, valid_ref, base_ref,  # per-block VMEM inputs
            out_g_ref, out_eig_ref, out_err_ref, out_ok_ref,
            *, win, iters, eps, min_eigen, level_h, level_w):
    b = q_ref.shape[0]
    q = q_ref[:]                                        # [B,2] level coords
    g0 = g_ref[:]
    valid = valid_ref[:] > 0.5                          # [B,1]
    base = base_ref[:]                                  # [B,4] f32 [px,py,cx,cy]

    ps = _patches_from_image(prev_ref, base[:, 0:1].astype(jnp.int32),
                             base[:, 1:2].astype(jnp.int32), b)
    cs = _patches_from_image(cur_ref, base[:, 2:3].astype(jnp.int32),
                             base[:, 3:4].astype(jnp.int32), b)

    po = base[:, 0:2]                                   # prev patch origin
    co = base[:, 2:4]                                   # cur patch origin

    c_prev = q - po
    tpl = _sample(ps, c_prev, win)                      # [B, win, win]
    gx, gy = _scharr(ps)
    ix = _sample(gx, c_prev, win)
    iy = _sample(gy, c_prev, win)

    def wsum(x, y):  # [B, win, win] pair -> [B, 1]
        return jnp.sum(jnp.sum(x * y, -1), -1, keepdims=True)

    gxx = wsum(ix, ix)
    gxy = wsum(ix, iy)
    gyy = wsum(iy, iy)
    tr = gxx + gyy
    det_half = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 / 4.0 + gxy * gxy, 0.0))
    min_eig = (tr / 2.0 - det_half) / (win * win)       # [B,1]
    det = gxx * gyy - gxy * gxy
    inv_ok = det > 1e-12
    det_safe = jnp.where(inv_ok, det, 1.0)
    i00 = gyy / det_safe
    i01 = -gxy / det_safe
    i11 = gxx / det_safe

    # loop carries stay f32 — i1 vector carries fail Mosaic legalization
    track_f = (valid & inv_ok).astype(jnp.float32)      # [B,1]

    def body(_, carry):
        g, live = carry
        cur = _sample(cs, g - co, win)
        r = tpl - cur
        bx = wsum(r, ix)
        by = wsum(r, iy)
        delta = jnp.concatenate(
            [i00 * bx + i01 * by, i01 * bx + i11 * by], -1)  # [B,2]
        g = g + delta * live                                  # [B,1] mask
        conv = (jnp.sum(delta * delta, -1, keepdims=True)
                < eps * eps).astype(jnp.float32)
        live = live * (1.0 - conv)
        return g, live

    g, _ = jax.lax.fori_loop(0, iters, body, (g0, track_f))

    cur = _sample(cs, g - co, win)
    err = jnp.mean(jnp.mean(jnp.abs(tpl - cur), -1), -1, keepdims=True)

    within = jnp.all(jnp.abs(g - g0) <= _MARGIN, -1, keepdims=True)
    inb = ((g[:, 0:1] >= 1) & (g[:, 1:2] >= 1)
           & (g[:, 0:1] < level_w - 2) & (g[:, 1:2] < level_h - 2)
           & (q[:, 0:1] >= 1) & (q[:, 1:2] >= 1)
           & (q[:, 0:1] < level_w - 2) & (q[:, 1:2] < level_h - 2))
    ok = inb & inv_ok & within & (min_eig > min_eigen)   # [B,1]

    out_g_ref[:] = g
    out_eig_ref[:] = min_eig
    out_err_ref[:] = err
    out_ok_ref[:] = ok.astype(jnp.float32)


def supported(level_shape, n: int, block: int = _BLOCK) -> bool:
    """Kernel applicability: patch must fit the level, both level images
    must fit VMEM (with working set), feature count must tile, and the
    level must be large enough that extraction work dominates the
    kernel's fixed cost (on small levels the fused XLA path is faster —
    measured crossover near 64k px)."""
    h, w = level_shape
    return (h >= PATCH and w >= PATCH and n % block == 0
            and 2 * h * w * 4 <= 6 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eigen", "interpret",
                                             "block"))
def track_level_pallas(prev_img, cur_img, q, g, valid,
                       win=21, iters=30, eps=0.01, min_eigen=1e-4,
                       interpret=False, block=_BLOCK):
    """One LK pyramid level for all N features as a single fused kernel.

    Same contract as klt._track_level: returns (g', min_eig, err, ok)."""
    h, w = prev_img.shape
    n = q.shape[0]

    def origin(pts):
        p = jnp.nan_to_num(pts)
        x = jnp.clip(jnp.floor(p[:, 0]).astype(jnp.int32) - _PAD, 0, w - PATCH)
        y = jnp.clip(jnp.floor(p[:, 1]).astype(jnp.int32) - _PAD, 0, h - PATCH)
        return x, y

    px0, py0 = origin(q)
    cx0, cy0 = origin(g)
    bases = jnp.stack([px0, py0, cx0, cy0], -1).astype(jnp.float32)  # [N,4]

    kern = functools.partial(
        _kernel, win=win, iters=iters, eps=eps, min_eigen=min_eigen,
        level_h=h, level_w=w)

    grid_spec = pl.GridSpec(
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # prev image
            pl.BlockSpec(memory_space=pltpu.VMEM),      # cur image
            pl.BlockSpec((block, 2), lambda i: (i, 0)),
            pl.BlockSpec((block, 2), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 4), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, 2), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((n, 2), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
    ]

    g2, eig, err, okf = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )(prev_img.astype(jnp.float32), cur_img.astype(jnp.float32),
      q.astype(jnp.float32), g.astype(jnp.float32),
      valid.astype(jnp.float32)[:, None], bases)

    return (g2, eig[:, 0], err[:, 0],
            okf[:, 0] > 0.5)
