"""Hardware-gated Pallas/compiled-path parity tests.

The regular suite runs the Pallas kernels in interpreter mode on the
virtual CPU mesh (tests/test_pallas_kernels.py); these tests exercise the
COMPILED Mosaic path and skip unless a real TPU is attached.  Run with:

    EKF_VIO_TESTS_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -q

so a kernel regression is visible the moment a TPU is present, not only
in the end-of-round bench (VERDICT r1, weak item 8).
"""
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("EKF_VIO_TESTS_ON_TPU"),
    reason="needs real TPU (set EKF_VIO_TESTS_ON_TPU=1 on hardware)")


@requires_tpu
def test_device_is_tpu():
    import jax

    assert jax.devices()[0].platform != "cpu", jax.devices()


@requires_tpu
def test_pallas_fast_compiled_matches_jnp():
    import jax.numpy as jnp

    from ekf_vio_tpu.frontend import fast, pallas_fast

    rng = np.random.RandomState(0)
    img = np.zeros((480, 640), np.float32)
    for _ in range(60):
        y, x = rng.randint(5, 470), rng.randint(5, 630)
        img[y:y + 5, x:x + 5] = rng.uniform(100, 250)
    ref = np.asarray(fast.detect(jnp.asarray(img), 50.0))
    got = np.asarray(pallas_fast.detect_pallas(jnp.asarray(img), 50.0))
    np.testing.assert_allclose(got, ref, atol=1e-3)


@requires_tpu
def test_pallas_klt_compiled_matches_xla():
    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import klt, pallas_klt

    rng = np.random.RandomState(3)
    h, w, n = 240, 320, 64
    img = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 1.5)
    img2 = ndi.shift(img, (0.8, -1.4), order=3, mode="nearest")
    prev = jnp.asarray(img.astype(np.float32))
    cur = jnp.asarray(img2.astype(np.float32))
    q = jnp.asarray(rng.uniform(40, 200, (n, 2)).astype(np.float32))
    valid = jnp.ones((n,), bool)

    cfg = VIOConfig(max_features=n)
    g_ref, eig_ref, err_ref, ok_ref = klt._track_level(
        prev, cur, q, q, valid, cfg)
    g, eig, err, ok = pallas_klt.track_level_pallas(
        prev, cur, q, q, valid,
        win=cfg.klt_window_size, iters=cfg.klt_iterations,
        eps=cfg.klt_eps, min_eigen=cfg.klt_min_eigen)

    both = (np.asarray(ok_ref) & (np.asarray(eig_ref) > cfg.klt_min_eigen)
            & np.asarray(ok))
    assert both.sum() > n * 0.8
    np.testing.assert_allclose(np.asarray(g)[both], np.asarray(g_ref)[both],
                               atol=0.05)


@requires_tpu
def test_pallas_lk_compiled_matches_xla():
    """The fused corr-table tracker (the DEFAULT TPU path) on compiled
    Mosaic vs the XLA tracker, multi-level, with seeded flow."""
    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import klt, pallas_lk, pyramid

    rng = np.random.RandomState(3)
    h, w, n = 120, 160, 128
    img = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 1.5)
    img2 = ndi.shift(img, (1.3, -2.1), order=3, mode="nearest")
    prev = jnp.asarray(img.astype(np.float32))
    cur = jnp.asarray(img2.astype(np.float32))
    q = jnp.asarray(rng.uniform(22, 96, (n, 2)).astype(np.float32))
    valid = jnp.ones((n,), bool)
    cfg = VIOConfig(max_features=n)

    # the dispatch rule must pick the fused path at this operating point
    assert klt.selected_backend((h, w), n, cfg) == "pallas_lk"

    prev_pyr = pyramid.build_pyramid(prev, cfg.klt_max_pyramid_level)
    cur_pyr = pyramid.build_pyramid(cur, cfg.klt_max_pyramid_level)
    init = q + jnp.asarray([-2.1, 1.3])
    g, ok, err, eig = pallas_lk.track(prev_pyr, cur_pyr, q, init, valid, cfg)

    cfg_xla = VIOConfig(max_features=n, use_pallas_klt=False)
    ref = klt.track(prev_pyr, cur_pyr, q, init, valid, cfg_xla)

    ok = np.asarray(ok)
    ref_ok = np.asarray(ref.status)
    assert ref_ok.sum() > n * 0.85
    agree = (ok == ref_ok).mean()
    assert agree > 0.97, f"status agreement {agree}"
    both = ok & ref_ok
    np.testing.assert_allclose(np.asarray(g)[both],
                               np.asarray(ref.points)[both], atol=0.05)


@requires_tpu
def test_engine_track_uses_fused_backend():
    """engine.step's tracker dispatch at the bench operating point
    selects pallas_lk (backend telemetry, VERDICT r3 next-round #2)."""
    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import klt

    cfg = VIOConfig(max_features=128)
    assert klt.selected_backend((120, 160), 128, cfg) == "pallas_lk"
    assert klt.selected_backend((240, 320), 128, cfg) == "pallas_lk"


@requires_tpu
def test_full_step_compiled_finite():
    import jax
    import jax.numpy as jnp

    from ekf_vio_tpu import engine
    from ekf_vio_tpu.config import VIOConfig

    cfg = VIOConfig(max_features=64)
    w, h = 160, 120
    cam = engine.make_hashable_camera(
        [[115.0, 0, w / 2], [0, 115.0, h / 2], [0, 0, 1]], w, h)
    rng = np.random.RandomState(0)
    base = (rng.uniform(0, 255, (h, w + 8)) > 128).astype(np.float32) * 200.0
    e = engine.initialize(jnp.asarray(base[:, :w]), 0.0, cfg, cam)
    e, out = jax.jit(engine.step, static_argnums=(3, 4))(
        e, jnp.asarray(base[:, 2:w + 2]), jnp.float32(0.05), cfg, cam)
    assert np.isfinite(np.asarray(out.base_mu)).all()
    assert int(out.num_tracked) > 5
