"""Diagnostic rollout: dump the full estimated trajectory + telemetry for
one (tracker, joseph) combination to an npz for offline analysis.

argv: tracker=pallas_lk|pallas_klt|xla  joseph=expanded|product  out.npz
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ekf_vio_tpu  # noqa: E402

ekf_vio_tpu.enable_compile_cache()


def main():
    tracker = sys.argv[1]
    joseph = sys.argv[2]
    out = sys.argv[3]

    from ekf_vio_tpu.config import VIOConfig
    from ekf_vio_tpu.frontend import pallas_lk
    from ekf_vio_tpu.sim import rendered

    if tracker == "pallas_klt":
        pallas_lk.supported = lambda *a, **k: False

    cfg = VIOConfig(max_features=128, min_new_feature_dist=10.0,
                    fast_threshold=25, triangulate_new_features=True,
                    klt_measurement_variance_px=0.05,
                    use_pallas_klt=(tracker != "xla"),
                    joseph_form=joseph)
    seq = rendered.generate(num_frames=300)
    t0 = time.time()
    ate, outs = rendered.evaluate_ate(seq, cfg=cfg, use_imu=False)
    np.savez(out,
             ate=float(ate),
             wall=time.time() - t0,
             est_pos=np.asarray(outs.base_mu)[:, 0:3],
             est_quat=np.asarray(outs.base_mu)[:, 3:7],
             gt_pos=seq.gt_pos, times=seq.times,
             num_tracked=np.asarray(outs.num_tracked),
             num_active=np.asarray(outs.num_active),
             innov=np.asarray(outs.mean_innovation),
             lost=np.asarray(outs.tracking_lost))
    print("ate", float(ate), "wall", time.time() - t0)


if __name__ == "__main__":
    main()
