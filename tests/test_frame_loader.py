"""Native frame loader tests: decode parity vs OpenCV, ordering, downscale,
error handling."""
import os
import tempfile

import numpy as np
import pytest

from ekf_vio_tpu.io import frame_loader

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def png_dir():
    d = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(12):
        img = rng.randint(0, 255, (48, 64), np.uint8)
        p = os.path.join(d, f"{i:04d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    # one RGB image to exercise luma conversion
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    p = os.path.join(d, "rgb.png")
    cv2.imwrite(p, rgb)
    return paths, p, d


def test_native_builds():
    assert frame_loader.native_available(), "native loader failed to build"


def test_decode_parity_and_order(png_dir):
    paths, _, _ = png_dir
    fl = frame_loader.FrameLoader(paths, n_threads=4)
    seen = []
    for idx, img in fl:
        ref = cv2.imread(paths[idx], cv2.IMREAD_GRAYSCALE).astype(np.float32)
        np.testing.assert_allclose(img, ref, atol=0.5)
        seen.append(idx)
    fl.close()
    assert seen == list(range(len(paths)))  # strictly in order


def test_downscale(png_dir):
    paths, _, _ = png_dir
    fl = frame_loader.FrameLoader(paths[:2], inverse_scale=2)
    idx, img = next(iter(fl))
    assert img.shape == (24, 32)
    ref = cv2.imread(paths[0], cv2.IMREAD_GRAYSCALE).astype(np.float32)
    ref2 = ref.reshape(24, 2, 32, 2).mean((1, 3))
    np.testing.assert_allclose(img, ref2, atol=0.5)
    fl.close()


def test_rgb_luma(png_dir):
    paths, rgb_path, _ = png_dir
    fl = frame_loader.FrameLoader([rgb_path])
    _, img = next(iter(fl))
    bgr = cv2.imread(rgb_path)  # cv2 loads BGR
    luma = (0.299 * bgr[..., 2] + 0.587 * bgr[..., 1] + 0.114 * bgr[..., 0])
    np.testing.assert_allclose(img, luma, atol=1.0)
    fl.close()


def test_missing_file_skipped(png_dir):
    paths, _, d = png_dir
    bad = [paths[0], os.path.join(d, "nope.png"), paths[1]]
    fl = frame_loader.FrameLoader(bad)
    idxs = [i for i, _ in fl]
    assert idxs == [0, 2]
    fl.close()


def test_throughput_smoke(png_dir):
    """Threaded decode should sustain well beyond camera rate."""
    import time

    paths, _, _ = png_dir
    many = paths * 20  # 240 frames
    fl = frame_loader.FrameLoader(many, n_threads=4)
    t0 = time.time()
    n = sum(1 for _ in fl)
    dt = time.time() - t0
    fl.close()
    assert n == len(many)
    assert n / dt > 200, f"only {n/dt:.0f} fps decode"
