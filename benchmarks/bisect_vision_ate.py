"""Bisect the round-3 vision-only ATE regression (0.071% -> 0.109%).

Runs the rendered vision-only ATE under one (tracker, joseph_form)
combination per process (argv: tracker=pallas_lk|pallas_klt|xla
joseph=expanded|product) and prints one JSON line.  Driven by round-4
investigation; kept as the standing tool for accuracy A/Bs.
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


def main():
    tracker = sys.argv[1] if len(sys.argv) > 1 else "pallas_lk"
    joseph = sys.argv[2] if len(sys.argv) > 2 else "expanded"

    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import pallas_lk
    from ekf_vio_tpu.sim import rendered

    if tracker == "pallas_klt":
        # force the round-3-era level-wise kernel by disqualifying the
        # fused path at dispatch (trace-time rule, process-wide)
        pallas_lk.supported = lambda *a, **k: False

    cfg = VIOConfig(max_features=128, min_new_feature_dist=10.0,
                    fast_threshold=25, triangulate_new_features=True,
                    klt_measurement_variance_px=0.05,
                    use_pallas_klt=(tracker != "xla"),
                    joseph_form=joseph)

    seq = rendered.generate(num_frames=300)
    path_len = float(np.sum(np.linalg.norm(np.diff(seq.gt_pos, axis=0), axis=1)))
    t0 = time.time()
    ate, outs = rendered.evaluate_ate(seq, cfg=cfg, use_imu=False)
    wall = time.time() - t0
    print(json.dumps({
        "tracker": tracker, "joseph": joseph,
        "ate_pct_path": round(100 * float(ate) / path_len, 4),
        "ate_rmse_m": round(float(ate), 6),
        "mean_tracked": round(float(np.mean(np.asarray(outs.num_tracked))), 1),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
