"""Speed-of-light / MFU analysis of the hot kernels on one TPU chip.

The north star demands "measure covariance-propagation and KLT kernel
speed-of-light per chip".  The reference's timing harnesses print raw
wall-clock only (reference: test/test_ekf.cpp:88-141,
test/jacobian_test.cpp:50-72); this script adds the missing roofline:

1. **Attainable ceilings are measured, not quoted.**  The per-chip
   matmul peak at the filter's mandatory f32 precision (see
   core/dynamics.propagate_covariance — bf16 passes NaN the filter) is
   measured with a large square matmul; attainable HBM bandwidth with a
   large saxpy.  Published v5e spec peaks (197 bf16 TFLOP/s, 819 GB/s)
   are reported alongside for reference.

2. **Each hot kernel gets an analytic FLOP + byte count** and the
   resulting roofline bound t_sol = max(flops/peak_flops,
   bytes/peak_bw); achieved fraction = t_sol / t_measured.

Kernels covered (device time measured via scan-amortized jit, no host
dispatch in the number):

* covariance propagation  Σ ← FΣFᵀ + Q  at N = 128/256/501 slots
  (D = 406/790/1525) — the predict's dominant cost
  (TightlyCoupledEKF.cpp:113-114 is the reference's sparse analog);
* full masked EKF update at the same sizes (S assembly + Cholesky +
  gain solve + Joseph form, TightlyCoupledEKF.cpp:559-596 analog);
* the Pallas pyramidal-LK level-0 kernel at 640x480 / 128 features
  (KLTTracker.cpp:61-64 analog) — counted two ways: algorithmic FLOPs
  (what LK fundamentally needs) and issued MXU FLOPs (incl. the one-hot
  selector matmuls the gather-free formulation trades gathers for);
* the compound IMU interval propagation (10 samples, 128 slots).

Writes benchmarks/speed_of_light.json.  Run on hardware:
    python benchmarks/speed_of_light.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ekf_vio_tpu  # noqa: E402

ekf_vio_tpu.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ekf_vio_tpu.config import VIOConfig  # noqa: E402
from ekf_vio_tpu.core import dynamics, filter as ekf, imu  # noqa: E402

V5E_BF16_PEAK = 197e12     # published spec, FLOP/s
V5E_HBM_BW = 819e9         # published spec, bytes/s


def timeit_device(step_fn, carry, iters=100, calls=3):
    """Pure device seconds per step: iters steps inside one scanned jit."""
    scanned = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (step_fn(cc), None), c, None, length=iters)[0])
    r = scanned(carry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(calls):
        r = scanned(carry)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (calls * iters)


def measure_matmul_peak_f32(m=4096, iters=20):
    """Attainable f32 (HIGHEST precision) matmul FLOP/s — the precision
    the covariance algebra must run at."""
    a = jnp.asarray(np.random.randn(m, m), jnp.float32)

    @jax.default_matmul_precision("float32")
    def step(x):
        return 0.5 * (x @ a)  # rescale to keep values bounded across iters

    t = timeit_device(step, a, iters=iters, calls=3)
    return 2.0 * m**3 / t


def measure_matmul_peak_bf16(m=4096, iters=20):
    a = jnp.asarray(np.random.randn(m, m), jnp.bfloat16)

    def step(x):
        return (0.5 * (x @ a)).astype(jnp.bfloat16)

    t = timeit_device(step, a, iters=iters, calls=3)
    return 2.0 * m**3 / t


def measure_hbm_bw(nbytes=512 * 1024 * 1024, iters=10):
    """Attainable HBM bandwidth: y = x + c reads 4 bytes + writes 4 per
    element → traffic = 2 * nbytes per step."""
    n = nbytes // 4
    x = jnp.zeros((n,), jnp.float32)

    def step(v):
        return v + 1.0

    t = timeit_device(step, x, iters=iters, calls=3)
    return 2.0 * nbytes / t


def roofline(flops, bytes_, t_meas, peak_flops, peak_bw):
    t_compute = flops / peak_flops
    t_memory = bytes_ / peak_bw
    t_sol = max(t_compute, t_memory)
    return {
        "flops": flops,
        "bytes": bytes_,
        "t_measured_us": round(t_meas * 1e6, 2),
        "t_sol_us": round(t_sol * 1e6, 2),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "achieved_frac_of_sol": round(t_sol / t_meas, 4),
        "achieved_tflops": round(flops / t_meas / 1e12, 3),
        "achieved_gbps": round(bytes_ / t_meas / 1e9, 2),
    }


def full_state(cfg):
    s = ekf.init_state(cfg)
    uv = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (cfg.max_features, 2)),
        jnp.float32)
    return ekf.add_features(s, cfg, uv, jnp.ones((cfg.max_features,), bool))


def bench_cov_propagate(n, peak_flops, peak_bw):
    """Σ ← FΣFᵀ + Q as implemented (dense F, two [D,D] matmuls)."""
    cfg = VIOConfig(max_features=n)
    st = full_state(cfg)
    d = st.state_dim

    def step(s):
        return ekf.predict(s, cfg, 0.05)

    t = timeit_device(step, st, iters=50)
    # two dense [D,D]@[D,D] products dominate; Jacobian-block assembly and
    # the symmetrization are O(D^2).
    flops = 4.0 * d**3
    bytes_ = 4 * d * d * 4.0  # F, Sigma in; product out; symmetrized out
    return d, roofline(flops, bytes_, t, peak_flops, peak_bw)


def bench_update(n, peak_flops, peak_bw, measured_frac=1.0):
    cfg = VIOConfig(max_features=n)
    st = full_state(cfg)
    d = st.state_dim
    m = 2 * n
    z = st.feat_mu[:, :2] + 0.001
    mc = jnp.tile(jnp.eye(2, dtype=jnp.float32) * 1e-5, (n, 1, 1))
    k = max(1, int(round(n * measured_frac)))
    passed = jnp.arange(n) < k

    def step(s):
        return ekf.update_with_feature_positions(s, cfg, z, mc, passed)

    t = timeit_device(step, st, iters=50)
    flops = (
        4.0 * d**3          # Joseph triple product (I−KH)Σ(I−KH)ᵀ
        + m**3 / 3.0        # Cholesky of S [M,M]
        + 2.0 * m * m * d   # two triangular solves for K (M×M, D rhs)
        + 2.0 * d * m * m   # K @ R_full
        + 2.0 * d * d * m   # (K R) @ Kᵀ
    )
    bytes_ = (3 * d * d + 2 * d * m + 2 * m * m) * 4.0
    return d, roofline(flops, bytes_, t, peak_flops, peak_bw)


def bench_imu_interval(n, k_samples, peak_flops, peak_bw):
    cfg = VIOConfig(max_features=n)
    st = full_state(cfg)
    d = st.state_dim
    g = jnp.asarray([0.0, 9.81, 0.0])
    batch = imu.ImuSample(
        dt=jnp.full((k_samples,), 0.005),
        gyro=jnp.tile(jnp.asarray([0.01, -0.02, 0.03]), (k_samples, 1)),
        accel=jnp.tile(jnp.asarray([0.1, -9.7, 0.2]), (k_samples, 1)))

    def step(s):
        return imu.propagate_imu_batch(s, cfg, batch, g)

    t = timeit_device(step, st, iters=50)
    # dominated by the single Σ ← FΣFᵀ (the 29-dim chains are noise)
    flops = 4.0 * d**3
    bytes_ = 4 * d * d * 4.0
    return d, roofline(flops, bytes_, t, peak_flops, peak_bw)


def bench_klt_level(peak_flops, peak_bw):
    """SHIPPING tracker (fused corr-table pallas_lk, full 3-level
    pyramid) at the reference's native 640x480, 128 features — round 5:
    the legacy per-level pallas_klt kernel this used to measure is no
    longer the dispatch target at any resolution."""
    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import pallas_lk, pyramid

    h, w, n = 480, 640, 128
    cfg = VIOConfig(max_features=n)
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    pyr0 = pyramid.build_pyramid(img0, cfg.klt_max_pyramid_level)
    pyr1 = pyramid.build_pyramid(img1, cfg.klt_max_pyramid_level)
    pts = jnp.asarray(
        rng.uniform(40, min(h, w) - 40, (n, 2)).astype(np.float32))
    valid = jnp.ones((n,), bool)

    def step(p):
        g, _, _, _ = pallas_lk.track(pyr0, pyr1, p, p, valid, cfg)
        # value-preserving data dependency: 0.0*g could be constant-folded
        # under fast-math, dead-code-eliminating the kernel
        return p + 1e-30 * g

    t = timeit_device(step, pts, iters=30)

    win, iters, patch = 21, 30, pallas_lk.PATCH
    # Algorithmic FLOPs over the FULL pyramid: gradients + normal
    # equations once per level, then per iteration a bilinear window
    # sample (~8 flop/px), residual and two correlations (~5) — the
    # corr-table formulation replaces the per-iteration sampling with
    # table blends, but the roofline counts what LK fundamentally needs.
    levels = 4
    alg = levels * n * (win * win) * (10 + iters * 13.0)
    # Issued MXU FLOPs per level: row-strip extraction + column
    # selection + sampling bmms + the corr-table bmm.
    tw = pallas_lk._TW
    issued = 0.0
    for lvl in range(levels):
        hl, wl = h >> lvl, w >> lvl
        wp = wl + 2 * pallas_lk._PAD_IMG
        hp = hl + 2 * pallas_lk._PAD_IMG
        issued += 2 * (2.0 * n * patch * hp * wp)          # row strips
        issued += 2 * (2.0 * n * patch * patch * wp)       # col select
        issued += 2.0 * n * (3 * win * 3 * patch * patch)  # sampling
        issued += 2.0 * n * 42 * win * (tw + win)          # corr bmm
    bytes_ = 2 * h * w * 4.0 * (1 + 0.25 + 0.0625 + 0.015625)
    r = roofline(alg, bytes_, t, peak_flops, peak_bw)
    r["issued_mxu_flops"] = issued
    r["issued_mxu_frac_of_bf16_peak"] = round(
        issued / t / V5E_BF16_PEAK, 4)
    r["note"] = ("algorithmic-FLOP roofline over the full fused pyramid "
                 "track (pallas_lk); the gap to SoL is per-feature small-"
                 "matmul issue latency, measured invariant to block size "
                 "and operand placement")
    return r


def main():
    dev = jax.devices()[0]
    peak_f32 = measure_matmul_peak_f32()
    peak_bf16 = measure_matmul_peak_bf16()
    bw = measure_hbm_bw()

    report = {
        "device": str(dev),
        "spec_bf16_peak_tflops": V5E_BF16_PEAK / 1e12,
        "spec_hbm_bw_gbps": V5E_HBM_BW / 1e9,
        "measured_bf16_matmul_tflops": round(peak_bf16 / 1e12, 2),
        "measured_f32_matmul_tflops": round(peak_f32 / 1e12, 2),
        "measured_hbm_bw_gbps": round(bw / 1e9, 1),
        "kernels": {},
    }
    print(json.dumps({k: v for k, v in report.items() if k != "kernels"},
                     indent=2))

    for n in (128, 256, 501):
        d, r = bench_cov_propagate(n, peak_f32, bw)
        report["kernels"][f"cov_propagate_D{d}"] = r
        print(f"cov_propagate D={d}: {json.dumps(r)}")
    for n in (128, 256, 501):
        d, r = bench_update(n, peak_f32, bw)
        report["kernels"][f"ekf_update_D{d}"] = r
        print(f"ekf_update    D={d}: {json.dumps(r)}")
    d, r = bench_imu_interval(128, 10, peak_f32, bw)
    report["kernels"][f"imu_interval10_D{d}"] = r
    print(f"imu_interval  D={d}: {json.dumps(r)}")
    r = bench_klt_level(peak_f32, bw)
    report["kernels"]["klt_full_pyramid_640x480_128feat"] = r
    print(f"klt_full_pyramid: {json.dumps(r)}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "speed_of_light.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
