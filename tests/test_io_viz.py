"""Tests for trajectory evaluation, checkpointing, EuRoC plumbing, viz."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core import filter as ekf
from ekf_vio_tpu.io import checkpoint, euroc, trajectory
from ekf_vio_tpu.viz import insight


class TestTrajectory:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(0)
        src = rng.randn(50, 3)
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        s, t = 1.7, np.array([1.0, -2.0, 3.0])
        dst = s * (R @ src.T).T + t
        s2, R2, t2 = trajectory.umeyama(src, dst)
        np.testing.assert_allclose(s2, s, rtol=1e-6)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        np.testing.assert_allclose(t2, t, atol=1e-6)

    def test_ate_zero_for_aligned(self):
        rng = np.random.RandomState(1)
        t = np.linspace(0, 10, 100)
        p = np.cumsum(rng.randn(100, 3) * 0.01, axis=0)
        # estimate is a scaled/rotated/shifted copy -> ATE ~ 0
        R = np.linalg.qr(rng.randn(3, 3))[0]
        R *= np.sign(np.linalg.det(R))
        est = 0.5 * (R @ p.T).T + 7.0
        assert trajectory.ate_rmse(t, est, t, p) < 1e-6

    def test_ate_detects_error(self):
        t = np.linspace(0, 10, 100)
        p = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
        est = p + np.array([0, 0.5, 0])* np.sin(t)[:, None]
        assert trajectory.ate_rmse(t, est, t, p, with_scale=False) > 0.2

    def test_association_tolerance(self):
        te = np.array([0.0, 1.0, 2.0, 3.0])
        tg = np.array([0.001, 0.999, 2.5])
        ie, ig = trajectory.associate(te, tg, max_dt=0.02)
        np.testing.assert_array_equal(ie, [0, 1])
        np.testing.assert_array_equal(ig, [0, 1])

    def test_rpe(self):
        t = np.linspace(0, 10, 101)
        p = np.stack([t, 0 * t, 0 * t], -1)
        est = p.copy()
        est[:, 0] *= 1.01  # 1% drift
        rpe = trajectory.relative_pose_error(t, est, t, p, delta=1.0)
        np.testing.assert_allclose(rpe, 0.01, atol=2e-3)


class TestCheckpoint:
    def test_npz_roundtrip(self):
        cfg = VIOConfig(max_features=8)
        s = ekf.init_state(cfg)
        s = ekf.add_features(s, cfg, jnp.ones((8, 2)) * 0.1,
                             jnp.arange(8) < 3)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "state.npz")
            checkpoint.save_npz(path, s)
            s2 = checkpoint.load_npz(path)
        np.testing.assert_array_equal(np.asarray(s2.Sigma), np.asarray(s.Sigma))
        np.testing.assert_array_equal(np.asarray(s2.active), np.asarray(s.active))
        np.testing.assert_array_equal(np.asarray(s2.base_mu), np.asarray(s.base_mu))

    def test_orbax_roundtrip(self):
        pytest.importorskip("orbax.checkpoint")
        cfg = VIOConfig(max_features=8)
        s = ekf.init_state(cfg)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "ckpt")
            checkpoint.save_orbax(path, s)
            s2 = checkpoint.restore_orbax(path, s)
        np.testing.assert_array_equal(np.asarray(s2.Sigma), np.asarray(s.Sigma))


class TestEuroc:
    def test_loader_gated_when_absent(self):
        # zero-egress image: the dataset is normally absent; the finder
        # must return None, not raise
        path = euroc.find_euroc("MH_01_easy")
        if path is None:
            pytest.skip("EuRoC not on disk (expected in CI)")
        seq = euroc.load_sequence(path, "MH_01_easy")
        assert len(seq.image_paths) > 100
        assert seq.imu_times.shape[0] > seq.image_times.shape[0]

    def test_imu_between_frames_synthetic(self):
        # synthesize a tiny sequence table and check batching/padding
        seq = euroc.EurocSequence(
            name="synthetic",
            image_times=np.array([0.0, 0.05, 0.1], np.float32),
            image_paths=["a", "b", "c"],
            imu_times=np.arange(0.005, 0.1, 0.005).astype(np.float32),
            imu_gyro=np.tile([0.1, 0, 0], (19, 1)).astype(np.float32),
            imu_accel=np.tile([0, 0, 9.81], (19, 1)).astype(np.float32),
            gt_times=np.zeros(1, np.float32),
            gt_pos=np.zeros((1, 3), np.float32),
            gt_quat=np.array([[1, 0, 0, 0]], np.float32),
        )
        dt, gy, ac = euroc.imu_between_frames(seq, max_per_frame=12)
        assert dt.shape == (2, 12)
        # each 50ms interval holds 10 samples of 5ms
        np.testing.assert_allclose(dt[0, :10].sum(), 0.05, atol=1e-5)
        assert (dt[0, 10:] == 0).all()
        # gyro rotated into cam frame still has unit magnitude
        np.testing.assert_allclose(np.linalg.norm(gy[0, 0]), 0.1, rtol=1e-5)


class TestViz:
    def test_render_insight(self):
        img = np.full((120, 160), 50, np.uint8)
        feat = np.array([[80.0, 60.0], [20.0, 30.0]])
        active = np.array([True, False])
        cov = np.tile(np.eye(2)[None] * 4.0, (2, 1, 1))
        out = insight.render_insight(img, feat, active, cov)
        assert out.shape == (120, 160, 3)
        # a green marker near the active feature, nothing at the inactive
        assert (out[49:71, 69:91, 1] == 255).any()
        assert not (out[19:41, 9:31, 1] == 255).any()

    def test_error_ellipse_axes(self):
        a, b, ang = insight.error_ellipse(np.diag([9.0, 1.0]), chi2=1.0)
        np.testing.assert_allclose(a, 3.0, atol=1e-6)
        np.testing.assert_allclose(b, 1.0, atol=1e-6)

    def test_landmarks(self):
        feat_mu = np.array([[0.2, -0.1, 2.0], [0.0, 0.0, 1.0]])
        pts, inten = insight.landmarks_point_cloud(
            feat_mu, np.array([True, True]),
            img=np.full((120, 160), 77, np.uint8),
            feat_px=np.array([[10.0, 10.0], [20.0, 20.0]]))
        np.testing.assert_allclose(pts[0], [0.1, -0.05, 0.5], atol=1e-6)
        np.testing.assert_allclose(pts[1], [0.0, 0.0, 1.0], atol=1e-6)
        assert (inten == 77).all()
