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
