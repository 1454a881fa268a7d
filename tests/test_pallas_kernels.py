"""Pallas kernel parity tests (interpreter mode on the CPU test mesh; the
compiled path is exercised on hardware by bench.py and the verify drive,
where it matches the jnp reference bit-exactly)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_vio_tpu.frontend import fast, pallas_fast


@pytest.mark.parametrize("shape", [(120, 160), (100, 130), (64, 64)])
def test_pallas_fast_matches_jnp(shape):
    rng = np.random.RandomState(0)
    img = np.zeros(shape, np.float32)
    for _ in range(25):
        y, x = rng.randint(5, shape[0] - 10), rng.randint(5, shape[1] - 10)
        img[y : y + 5, x : x + 5] = rng.uniform(100, 250)
    ref = np.asarray(fast.detect(jnp.asarray(img), 50.0))
    got = np.asarray(pallas_fast.detect_pallas(jnp.asarray(img), 50.0,
                                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pallas_fast_threshold_behavior():
    img = np.zeros((64, 128), np.float32)
    img[20:30, 40:60] = 100.0
    lo = np.asarray(pallas_fast.detect_pallas(jnp.asarray(img), 30.0,
                                              interpret=True))
    hi = np.asarray(pallas_fast.detect_pallas(jnp.asarray(img), 150.0,
                                              interpret=True))
    assert (lo > 0).sum() >= 4
    assert (hi > 0).sum() == 0


class TestPallasKLT:
    """Fused LK level kernel vs the XLA reference path (interpret mode —
    the real-TPU parity check runs in the hardware bench)."""

    def _scene(self, h=128, w=192, n=32):
        import scipy.ndimage as ndi

        rng = np.random.RandomState(3)
        img = ndi.gaussian_filter(rng.uniform(0, 255, (h, w)), 1.5)
        img2 = ndi.shift(img, (0.8, -1.4), order=3, mode="nearest")
        q = rng.uniform(30, min(h, w) - 30, (n, 2)).astype(np.float32)
        return (jnp.asarray(img.astype(np.float32)),
                jnp.asarray(img2.astype(np.float32)), jnp.asarray(q))

    def test_matches_xla_level_tracker(self):
        from ekf_vio_tpu.config import VIOConfig
        from ekf_vio_tpu.frontend import klt, pallas_klt

        prev, cur, q = self._scene()
        v = jnp.ones(q.shape[0], bool)
        cfg = VIOConfig(max_features=q.shape[0])
        g1, e1, r1, ok1 = klt._track_level(prev, cur, q, q, v, cfg)
        g2, e2, r2, ok2 = pallas_klt.track_level_pallas(
            prev, cur, q, q, v, interpret=True)
        ok1 = np.asarray(ok1 & (e1 > cfg.klt_min_eigen))
        ok2 = np.asarray(ok2)
        m = ok1 & ok2
        assert m.sum() >= 0.8 * q.shape[0]
        np.testing.assert_allclose(np.asarray(g1)[m], np.asarray(g2)[m],
                                   atol=2e-3)
        # tracked displacement close to the known shift
        d = np.asarray(g2)[m] - np.asarray(q)[m]
        np.testing.assert_allclose(d, np.tile([-1.4, 0.8], (m.sum(), 1)),
                                   atol=0.15)

    def test_invalid_rows_stay_put(self):
        from ekf_vio_tpu.frontend import pallas_klt

        prev, cur, q = self._scene()
        v = jnp.zeros(q.shape[0], bool)
        g2, _, _, ok2 = pallas_klt.track_level_pallas(
            prev, cur, q, q, v, interpret=True)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(q), atol=1e-6)

    def test_supported_gate(self):
        from ekf_vio_tpu.frontend import pallas_klt

        assert pallas_klt.supported((480, 640), 128)
        assert not pallas_klt.supported((30, 640), 128)   # too short
        assert not pallas_klt.supported((480, 640), 100)  # not a block multiple
        assert not pallas_klt.supported((1200, 1600), 128)  # exceeds VMEM gate
