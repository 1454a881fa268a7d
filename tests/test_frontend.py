"""Front-end tests: pyramid, FAST, KLT — including OpenCV parity on the
reference fixture images (reference: test/klt_test.cpp uses
images/640_480_test.png and its translated/sheared variants).

The fixture images are read in place from the read-only reference mount;
synthetic cases cover exact-answer checks.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.frontend import camera, fast, klt, pyramid, replenish

FIXTURES = "/root/reference/images"

cv2 = pytest.importorskip("cv2")


def load_fixture(name):
    img = cv2.imread(os.path.join(FIXTURES, name), cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


@pytest.fixture(scope="module")
def img_pair():
    a = load_fixture("640_480_test.png")
    b = load_fixture("640_480_moved_test.png")
    return a, b


class TestPyramid:
    def test_pyrdown_matches_opencv(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
        got = np.asarray(pyramid.pyr_down(jnp.asarray(img)))
        want = cv2.pyrDown(img)
        # border rows differ (padding mode); compare the interior
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                                   rtol=1e-4, atol=0.35)

    def test_build_pyramid_shapes(self):
        img = jnp.zeros((120, 160))
        p = pyramid.build_pyramid(img, 3)
        assert len(p) == 4
        assert p[3].shape == (15, 20)


class TestFast:
    def test_detects_synthetic_corner(self):
        # bright square on dark background: corners at the 4 square corners
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 200.0
        score = np.asarray(fast.detect(jnp.asarray(img), 50.0))
        ys, xs = np.nonzero(score)
        assert len(ys) >= 4
        detected = set(zip(ys.tolist(), xs.tolist()))
        for cy, cx in [(20, 20), (20, 39), (39, 20), (39, 39)]:
            assert any(abs(y - cy) <= 2 and abs(x - cx) <= 2 for y, x in detected), (
                f"missing corner near {(cy, cx)}; got {sorted(detected)[:10]}"
            )

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        assert float(jnp.sum(fast.detect(img, 50.0))) == 0.0

    def test_opencv_agreement_on_fixture(self, img_pair):
        img, _ = img_pair
        thr = 50
        ours = np.asarray(fast.detect(jnp.asarray(img.astype(np.float32)), thr))
        our_pts = set(zip(*np.nonzero(ours)))

        kps = cv2.FAST_create if hasattr(cv2, "FAST_create") else None
        det = cv2.FastFeatureDetector_create(threshold=thr, nonmaxSuppression=True)
        cv_pts = [(int(round(k.pt[1])), int(round(k.pt[0]))) for k in det.detect(img)]
        assert len(cv_pts) > 50

        # every OpenCV corner should have one of ours within 2px (NMS /
        # score-definition differences shift winners between neighbors)
        matched = sum(
            1 for (y, x) in cv_pts
            if any((yy, xx) in our_pts
                   for yy in range(y - 2, y + 3) for xx in range(x - 2, x + 3))
        )
        recall = matched / len(cv_pts)
        assert recall > 0.85, f"FAST recall vs OpenCV: {recall:.2f}"

        # and we should not fire wildly more corners than OpenCV
        assert len(our_pts) < len(cv_pts) * 3


class TestKLT:
    def _track(self, a, b, pts, cfg=None):
        cfg = cfg or VIOConfig()
        pa = pyramid.build_pyramid(jnp.asarray(a, jnp.float32),
                                   cfg.klt_max_pyramid_level)
        pb = pyramid.build_pyramid(jnp.asarray(b, jnp.float32),
                                   cfg.klt_max_pyramid_level)
        pts = jnp.asarray(pts, jnp.float32)
        valid = jnp.ones(pts.shape[0], bool)
        return klt.track(pa, pb, pts, pts, valid, cfg)

    def test_zero_motion(self, img_pair):
        img, _ = img_pair
        det = cv2.FastFeatureDetector_create(threshold=60, nonmaxSuppression=True)
        pts = np.array([k.pt for k in det.detect(img)[:32]], np.float32)
        res = self._track(img, img, pts)
        ok = np.asarray(res.status)
        assert ok.mean() > 0.9
        drift = np.linalg.norm(np.asarray(res.points)[ok] - pts[ok], axis=-1)
        assert drift.max() < 0.1, f"zero-motion drift {drift.max()}"

    def test_known_integer_shift(self):
        rng = np.random.RandomState(1)
        base = cv2.GaussianBlur(
            rng.uniform(0, 255, (128, 128)).astype(np.float32), (0, 0), 2.0)
        shift = (5, -3)  # (dx, dy)
        moved = np.roll(base, (shift[1], shift[0]), axis=(0, 1))
        pts = np.array([[x, y] for x in range(30, 100, 17)
                        for y in range(30, 100, 17)], np.float32)
        res = self._track(base, moved, pts)
        ok = np.asarray(res.status)
        assert ok.mean() > 0.9
        flow = np.asarray(res.points)[ok] - pts[ok]
        np.testing.assert_allclose(flow, np.tile(shift, (ok.sum(), 1)), atol=0.25)

    def test_opencv_parity_on_fixture_pair(self, img_pair):
        a, b = img_pair
        det = cv2.FastFeatureDetector_create(threshold=60, nonmaxSuppression=True)
        kps = det.detect(a)
        kps = sorted(kps, key=lambda k: -k.response)[:48]
        pts = np.array([k.pt for k in kps], np.float32)
        # keep clear of borders so both trackers track the same windows
        keep = ((pts[:, 0] > 25) & (pts[:, 0] < a.shape[1] - 25)
                & (pts[:, 1] > 25) & (pts[:, 1] < a.shape[0] - 25))
        pts = pts[keep]

        cfg = VIOConfig()
        cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
            a, b, pts.reshape(-1, 1, 2), None,
            winSize=(cfg.klt_window_size, cfg.klt_window_size),
            maxLevel=cfg.klt_max_pyramid_level,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01),
            minEigThreshold=cfg.klt_min_eigen,
        )
        cv_pts = cv_pts.reshape(-1, 2)
        cv_st = cv_st.reshape(-1).astype(bool)

        res = self._track(a, b, pts, cfg)
        ours = np.asarray(res.points)
        our_st = np.asarray(res.status)

        both = cv_st & our_st
        assert both.sum() >= max(4, int(0.5 * cv_st.sum())), (
            f"too few co-tracked: ours {our_st.sum()} cv {cv_st.sum()}")
        err = np.linalg.norm(ours[both] - cv_pts[both], axis=-1)
        # sub-pixel agreement on the vast majority of co-tracked features
        assert np.median(err) < 0.5, f"median disagreement {np.median(err):.3f}px"
        assert (err < 1.5).mean() > 0.8, f"outlier fraction {(err >= 1.5).mean():.2f}"

    def test_opencv_parity_on_shear_fixture(self, img_pair):
        # the deformation case the reference kept specifically for
        # tracking tests (images/640_480_shear_test.png, test/klt_test.cpp):
        # a sheared warp violates the pure-translation LK model, so both
        # trackers must degrade the same way — quantitative endpoint
        # comparison against cv2 on the co-tracked set.
        a, _ = img_pair
        b = load_fixture("640_480_shear_test.png")
        det = cv2.FastFeatureDetector_create(threshold=60, nonmaxSuppression=True)
        kps = sorted(det.detect(a), key=lambda k: -k.response)[:48]
        pts = np.array([k.pt for k in kps], np.float32)
        keep = ((pts[:, 0] > 25) & (pts[:, 0] < a.shape[1] - 25)
                & (pts[:, 1] > 25) & (pts[:, 1] < a.shape[0] - 25))
        pts = pts[keep]

        cfg = VIOConfig()
        cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
            a, b, pts.reshape(-1, 1, 2), None,
            winSize=(cfg.klt_window_size, cfg.klt_window_size),
            maxLevel=cfg.klt_max_pyramid_level,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01),
            minEigThreshold=cfg.klt_min_eigen,
        )
        cv_pts = cv_pts.reshape(-1, 2)
        cv_st = cv_st.reshape(-1).astype(bool)

        res = self._track(a, b, pts, cfg)
        ours = np.asarray(res.points)
        our_st = np.asarray(res.status)

        both = cv_st & our_st
        assert both.sum() >= max(4, int(0.4 * cv_st.sum())), (
            f"too few co-tracked under shear: ours {our_st.sum()} cv {cv_st.sum()}")
        err = np.linalg.norm(ours[both] - cv_pts[both], axis=-1)
        # shear breaks the translation model; agreement loosens but the
        # endpoint distribution must still match cv2's
        assert np.median(err) < 1.0, f"median disagreement {np.median(err):.3f}px"
        assert (err < 3.0).mean() > 0.7, f"outlier fraction {(err >= 3.0).mean():.2f}"

    def test_min_eig_rejects_flat_region(self):
        img = np.full((96, 96), 128.0, np.float32)
        res = self._track(img, img, np.array([[48.0, 48.0]]))
        assert not bool(res.status[0])


class TestReplenish:
    def test_selects_separated_corners(self):
        rng = np.random.RandomState(0)
        img = np.zeros((120, 160), np.float32)
        for _ in range(40):
            y, x = rng.randint(15, 105), rng.randint(15, 145)
            img[y : y + 6, x : x + 6] = rng.uniform(120, 250)
        cfg = VIOConfig(max_features=32, num_features=20)
        px, valid = replenish.replenish(
            jnp.asarray(img), jnp.zeros((32, 2)), jnp.zeros(32, bool), cfg, 32)
        px, valid = np.asarray(px), np.asarray(valid)
        got = px[valid]
        assert len(got) >= 5
        # mutual separation >= one grid cell apart in at least one axis
        for i in range(len(got)):
            for j in range(i + 1, len(got)):
                assert np.abs(got[i] - got[j]).max() >= 1, "duplicate candidate"
        # kill pad respected
        assert (got >= cfg.kill_pad).all()
        assert (got[:, 0] <= 160 - cfg.kill_pad).all()
        assert (got[:, 1] <= 120 - cfg.kill_pad).all()

    def test_blocks_near_existing(self):
        img = np.zeros((120, 160), np.float32)
        img[40:60, 40:60] = 200.0  # corners at the square
        cfg = VIOConfig(max_features=16, num_features=8,
                        min_new_feature_dist=30.0)
        existing = jnp.asarray([[40.0, 40.0]])
        px, valid = replenish.replenish(
            jnp.asarray(img), jnp.tile(existing, (16, 1)),
            jnp.zeros(16, bool).at[0].set(True), cfg, 16)
        px, valid = np.asarray(px), np.asarray(valid)
        for p in px[valid]:
            assert np.hypot(p[0] - 40, p[1] - 40) >= 28, (
                f"candidate {p} too close to existing feature")


class TestCamera:
    def test_pixel_metric_roundtrip(self):
        cam = camera.CameraModel(
            K=jnp.array([[400.0, 0, 320], [0, 410.0, 240], [0, 0, 1]]),
            width=640, height=480)
        px = jnp.array([[100.0, 200.0], [320.0, 240.0]])
        uv = camera.pixel_to_metric(cam, px)
        back = camera.metric_to_pixel(cam, uv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(px), atol=1e-4)
        np.testing.assert_allclose(np.asarray(uv[1]), [0.0, 0.0], atol=1e-6)

    def test_scale_camera(self):
        cam = camera.CameraModel(
            K=jnp.array([[400.0, 0, 320], [0, 410.0, 240], [0, 0, 1]]),
            width=640, height=480)
        s = camera.scale_camera(cam, 4)
        assert s.width == 160 and s.height == 120
        np.testing.assert_allclose(float(s.fx), 100.0)
        np.testing.assert_allclose(float(s.K[2, 2]), 1.0)

    def test_downscale_image(self):
        img = jnp.arange(16.0).reshape(4, 4)
        out = camera.downscale_image(img, 2)
        np.testing.assert_allclose(np.asarray(out),
                                   [[2.5, 4.5], [10.5, 12.5]])

    def test_kill_box(self):
        cam = camera.CameraModel(K=jnp.eye(3), width=160, height=120)
        px = jnp.array([[5.0, 60.0], [80.0, 60.0], [155.0, 60.0], [80.0, 115.0]])
        got = np.asarray(camera.in_kill_box(cam, px, 11.0))
        np.testing.assert_array_equal(got, [False, True, False, False])
