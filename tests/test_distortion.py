"""Real-data quirks de-risked in sim (VERDICT r3 #9): radtan-distorted
rendered imagery pushed through io/euroc.py's ACTUAL undistort path, plus
exposure drift through the LK front-end.

Reference analog: the camera pipeline feeds the node rectified imagery
(launch/sensorRig1.launch:10-33) and the Frame ctor handles downscale +
K rescale (Frame.cpp:15-41, EKFVIO.cpp:117-137).
"""
import numpy as np
import pytest

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.io import euroc
from ekf_vio_tpu.sim import rendered

DIST = [-0.28, 0.07, 1e-4, 1.8e-5, 0.0]  # EuRoC cam0-like radtan


class TestDistortedChain:
    def test_distortion_model_matches_cv2_geometry(self):
        """The renderer's radtan model must be EXACTLY the model cv2's
        undistort inverts: the renderer's per-pixel source map equals
        cv2.initUndistortRectifyMap to machine precision.  (Raw-intensity
        image comparison is not meaningful here — the plane texture is
        ~5x supersampled vs the image, so any double resampling shows
        aliasing noise; the geometric map IS the contract, and the
        engine-level test below scores the full chain.)"""
        import cv2

        seq_p = rendered.generate(num_frames=1, w=320, h=240)
        seq_d = rendered.generate(num_frames=1, w=320, h=240,
                                  distortion=DIST)
        raw_delta = np.abs(seq_p.frames[0] - seq_d.frames[0]).mean()
        assert raw_delta > 2.0, f"distortion had no effect ({raw_delta})"

        K = seq_p.K
        h, w = 240, 320
        m1, m2 = cv2.initUndistortRectifyMap(
            K, np.asarray(DIST, np.float32), None, K, (w, h), cv2.CV_32FC1)
        # cv2 maps undistorted->distorted via the forward radtan model;
        # invert the renderer's inverse mapping at those grid points
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        nd = np.linalg.inv(K) @ np.stack(
            [xs.ravel(), ys.ravel(), np.ones(h * w)], 0)
        k1, k2, p1, p2, k3 = DIST
        x, y = nd[0], nd[1]
        r2 = x * x + y * y
        rad = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        np.testing.assert_allclose(
            (xd * K[0, 0] + K[0, 2]).reshape(h, w), m1, atol=2e-3)
        np.testing.assert_allclose(
            (yd * K[1, 1] + K[1, 2]).reshape(h, w), m2, atol=2e-3)
        # and the renderer's inversion is an exact inverse of that model
        xu, yu = rendered._undistort_normalized(nd[0], nd[1], DIST)
        r2u = xu * xu + yu * yu
        radu = 1 + r2u * (k1 + r2u * (k2 + r2u * k3))
        xre = xu * radu + 2 * p1 * xu * yu + p2 * (r2u + 2 * xu * xu)
        yre = yu * radu + p1 * (r2u + 2 * yu * yu) + 2 * p2 * xu * yu
        np.testing.assert_allclose(xre, nd[0], atol=1e-9)
        np.testing.assert_allclose(yre, nd[1], atol=1e-9)

    def test_engine_on_undistorted_imagery_tracks_and_holds_ate(self):
        """Distorted frames → euroc.undistort_and_scale → engine: tracking
        survives and the raw trajectory stays close to the clean-imagery
        run (the full real-data ingest chain in CI)."""
        import jax.numpy as jnp

        from ekf_vio_tpu import engine

        n = 40
        seq_p = rendered.generate(num_frames=n, w=320, h=240)
        seq_d = rendered.generate(num_frames=n, w=320, h=240,
                                  distortion=DIST)
        und, K1 = euroc.undistort_and_scale(list(seq_d.frames), seq_d.K,
                                            DIST, inverse_scale=1)

        cfg = VIOConfig(max_features=32, min_new_feature_dist=12.0,
                        fast_threshold=25)
        cam = engine.make_hashable_camera(K1, 320, 240)
        ts = jnp.asarray(seq_p.times)
        _, outs_u = engine.run_sequence(jnp.asarray(und), ts, cfg, cam)
        _, outs_p = engine.run_sequence(jnp.asarray(seq_p.frames), ts, cfg,
                                        cam)
        assert np.isfinite(np.asarray(outs_u.base_mu)).all()
        assert np.asarray(outs_u.num_tracked)[3:].min() > 8
        dp = np.linalg.norm(np.asarray(outs_u.base_mu)[:, :3]
                            - np.asarray(outs_p.base_mu)[:, :3], axis=-1)
        # same trajectory estimated from the undistorted-chain imagery
        assert dp.max() < 0.02, f"undistorted-chain trajectory off {dp.max()}"

    def test_exposure_drift_tracking_survives(self):
        """Auto-exposure-like gain/offset drift: LK keeps tracking (the
        per-frame relative gain is small; SSD tolerates it) and the
        filter stays finite."""
        import jax.numpy as jnp

        from ekf_vio_tpu import engine

        n = 40
        seq = rendered.generate(num_frames=n, w=320, h=240,
                                exposure_drift=0.15)
        cfg = VIOConfig(max_features=32, min_new_feature_dist=12.0,
                        fast_threshold=25)
        cam = engine.make_hashable_camera(seq.K, 320, 240)
        _, outs = engine.run_sequence(jnp.asarray(seq.frames),
                                      jnp.asarray(seq.times), cfg, cam)
        assert np.isfinite(np.asarray(outs.base_mu)).all()
        assert np.asarray(outs.num_tracked)[3:].min() > 8
