"""End-to-end EuRoC ingest on a synthetic ASL tree.

The real dataset is absent in CI (zero-egress image), so this builds a
tiny but *format-faithful* mav0 tree — nanosecond integer stamps beyond
float64's exact range, "timestamp,filename" cam0 csv, 200 Hz imu0 csv,
17-column ground-truth csv — and drives the full ingest path the
reference exercises through ROS (reference: EKFVIO.cpp:69-137):
load_sequence → load_images (native loader or cv2 fallback) →
imu_between_frames → run_sequence_imu.
"""
import os

import numpy as np
import pytest

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.io import euroc

cv2 = pytest.importorskip("cv2")

# A stamp whose low digits float64 cannot represent exactly — catches any
# int→float→int round trip in the loader.
T0_NS = 1403636579763555584
FRAME_NS = 50_000_000      # 20 fps
IMU_NS = 5_000_000         # 200 Hz
N_FRAMES = 5
W, H = 752, 480


@pytest.fixture(scope="module")
def mav0(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc") / "mav0"
    cam_dir = root / "cam0" / "data"
    cam_dir.mkdir(parents=True)
    (root / "imu0").mkdir()
    (root / "state_groundtruth_estimate0").mkdir()

    rng = np.random.RandomState(0)
    img = cv2.GaussianBlur(
        rng.uniform(0, 255, (H, W)).astype(np.float32), (0, 0), 2.0
    ).astype(np.uint8)

    cam_lines = ["#timestamp [ns],filename"]
    for i in range(N_FRAMES):
        ts = T0_NS + i * FRAME_NS
        name = f"{ts}.png"
        cv2.imwrite(str(cam_dir / name), img)  # static scene (zero flow)
        cam_lines.append(f"{ts},{name}")
    (root / "cam0" / "data.csv").write_text("\n".join(cam_lines) + "\n")

    # Stationary IMU: gyro 0, specific force cancels gravity (body = world).
    imu_lines = ["#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y,w_RS_S_z,"
                 "a_RS_S_x [m s^-2],a_RS_S_y,a_RS_S_z"]
    n_imu = (N_FRAMES * FRAME_NS) // IMU_NS
    for k in range(n_imu):
        ts = T0_NS + (k + 1) * IMU_NS
        imu_lines.append(f"{ts},0.0,0.0,0.0,0.0,0.0,9.81")
    (root / "imu0" / "data.csv").write_text("\n".join(imu_lines) + "\n")

    gt_lines = ["#timestamp, p_RS_R_x [m], p_RS_R_y, p_RS_R_z, q_RS_w,"
                " q_RS_x, q_RS_y, q_RS_z, v..., bw..., ba..."]
    for i in range(N_FRAMES):
        ts = T0_NS + i * FRAME_NS
        gt_lines.append(f"{ts},0,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0")
    (root / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_lines) + "\n")
    return str(root)


class TestLoadSequence:
    def test_exact_stamps_and_paths(self, mav0):
        seq = euroc.load_sequence(mav0, "fake")
        assert len(seq.image_paths) == N_FRAMES
        # every recorded path must exist — fails if stamps round-trip
        # through float64 anywhere
        for p in seq.image_paths:
            assert os.path.exists(p), p
        np.testing.assert_allclose(
            seq.image_times,
            np.arange(N_FRAMES, dtype=np.float32) * (FRAME_NS * 1e-9),
            atol=1e-7)
        assert seq.imu_gyro.shape == (len(seq.imu_times), 3)
        assert seq.gt_pos.shape[0] == N_FRAMES

    def test_load_images_undistort_and_scale(self, mav0):
        seq = euroc.load_sequence(mav0, "fake")
        imgs, K = euroc.load_images(seq, inverse_scale=4)
        assert imgs.shape == (N_FRAMES, H // 4, W // 4)
        assert imgs.dtype == np.float32
        np.testing.assert_allclose(K[0, 0], euroc.CAM0_K[0, 0] / 4)
        assert K[2, 2] == 1.0
        # interior texture survives the remap (not all zeros / constant)
        assert imgs[0][20:-20, 20:-20].std() > 5.0

    def test_native_and_cv2_paths_agree(self, mav0):
        from ekf_vio_tpu.io import frame_loader

        if not frame_loader.native_available():
            pytest.skip("native loader not built")
        seq = euroc.load_sequence(mav0, "fake")
        a, _ = euroc.load_images(seq, count=2, use_native=True)
        b, _ = euroc.load_images(seq, count=2, use_native=False)
        np.testing.assert_allclose(a, b, atol=1.0)

    def test_imu_between_frames(self, mav0):
        seq = euroc.load_sequence(mav0, "fake")
        dt, gy, ac = euroc.imu_between_frames(seq, max_per_frame=12)
        assert dt.shape == (N_FRAMES - 1, 12)
        np.testing.assert_allclose(dt[0].sum(), FRAME_NS * 1e-9, atol=1e-6)
        # accel rotated into cam0 frame: magnitude preserved
        np.testing.assert_allclose(
            np.linalg.norm(ac[0, 0]), 9.81, rtol=1e-5)


class TestEndToEnd:
    def test_run_sequence_imu_from_tree(self, mav0):
        import jax.numpy as jnp

        from ekf_vio_tpu import engine
        from ekf_vio_tpu.core import imu as imu_mod

        seq = euroc.load_sequence(mav0, "fake")
        imgs, K = euroc.load_images(seq, inverse_scale=4)
        dt, gy, ac = euroc.imu_between_frames(seq, max_per_frame=12)
        gravity_w = imu_mod.estimate_gravity_world(jnp.asarray(ac[0]))

        cfg = VIOConfig(max_features=32, num_features=24, fast_threshold=10,
                        min_new_feature_dist=10.0, use_imu=True)
        cam = engine.make_hashable_camera(K, imgs.shape[2], imgs.shape[1])
        _, outs = engine.run_sequence_imu(
            jnp.asarray(imgs), jnp.asarray(seq.image_times[:N_FRAMES]),
            jnp.asarray(dt), jnp.asarray(gy), jnp.asarray(ac),
            gravity_w, cfg, cam)
        base = np.asarray(outs.base_mu)
        assert np.isfinite(base).all()
        # stationary scene + stationary IMU: the pose must stay near origin
        assert np.linalg.norm(base[-1, :3]) < 0.05
        assert int(outs.num_tracked[-1]) >= 8
