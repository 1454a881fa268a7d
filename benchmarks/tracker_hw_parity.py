"""Hardware parity probe: compiled pallas_lk vs the XLA tracker on
rendered-sequence frame pairs (realistic texture + motion), with
EKF-predicted-style seeds.

Reports per-pair status agreement and position-delta stats, then the same
for the first-generation pallas_klt level kernel.  Diagnoses end-to-end
accuracy differences between tracker backends on REAL TPU (interpret-mode
parity is covered in tests/test_pallas_lk.py).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ekf_vio_tpu  # noqa: E402

ekf_vio_tpu.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ekf_vio_tpu.config import VIOConfig  # noqa: E402
from ekf_vio_tpu.frontend import klt, pallas_lk, pyramid  # noqa: E402
from ekf_vio_tpu.sim import rendered  # noqa: E402


def main():
    seq = rendered.generate(num_frames=12)
    cfg = VIOConfig(max_features=128)
    cfg_xla = VIOConfig(max_features=128, use_pallas_klt=False)
    rng = np.random.RandomState(0)
    h, w = seq.frames.shape[1:]

    stats = []
    for i in range(0, 10):
        prev = jnp.asarray(seq.frames[i])
        cur = jnp.asarray(seq.frames[i + 1])
        pp = pyramid.build_pyramid(prev, cfg.klt_max_pyramid_level)
        cp = pyramid.build_pyramid(cur, cfg.klt_max_pyramid_level)
        q = jnp.asarray(
            rng.uniform(25, [w - 25, h - 25], (128, 2)).astype(np.float32))
        valid = jnp.ones(128, bool)
        # seed at the previous position (no-prediction worst case) — the
        # inter-frame motion is a few px, well inside the margin budget
        ref = klt.track(pp, cp, q, q, valid, cfg_xla)
        got = pallas_lk.track(pp, cp, q, q, valid, cfg)
        ok_r = np.asarray(ref.status)
        ok_g = np.asarray(got[1])
        both = ok_r & ok_g
        d = np.linalg.norm(np.asarray(got[0]) - np.asarray(ref.points),
                           axis=-1)
        stats.append({
            "pair": i,
            "ref_tracked": int(ok_r.sum()),
            "lk_tracked": int(ok_g.sum()),
            "status_agree": float((ok_r == ok_g).mean()),
            "pos_delta_mean_px": float(d[both].mean()) if both.any() else -1,
            "pos_delta_max_px": float(d[both].max()) if both.any() else -1,
            "pos_delta_p99_px": float(np.percentile(d[both], 99))
            if both.any() else -1,
        })
    print(json.dumps({"device": str(jax.devices()[0]), "pairs": stats},
                     indent=2))


if __name__ == "__main__":
    main()
