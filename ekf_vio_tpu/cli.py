"""Command-line entry point — the analog of the reference's node binary.

The reference ships a ROS node (``main()`` constructs EKFVIO and blocks in
``ros::spin()``, reference: src/ekfvio_node.cpp:14-21) configured by
roslaunch XML + YAML profiles (launch/*.launch, params/*.yaml).  Array-
native replacement: subcommands over on-disk data with the same YAML
profiles (configs/*.yaml mirror params/*.yaml).

    python -m ekf_vio_tpu run --euroc MH_01_easy --imu --out traj.tum
    python -m ekf_vio_tpu run --synthetic 120 --insight-dir /tmp/insight
    python -m ekf_vio_tpu sim
    python -m ekf_vio_tpu info
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _make_synthetic(n_frames: int, w=640, h=480, shift=2.0, seed=0):
    """Textured plane under lateral camera motion (no dataset needed)."""
    import scipy.ndimage as ndi

    rng = np.random.RandomState(seed)
    big = rng.uniform(0, 255, (h + 64, w + 64 + int(shift * n_frames) + 8))
    big = ndi.gaussian_filter(big, 2.0)
    big = (big - big.min()) / (np.ptp(big) + 1e-9) * 255.0
    big = big.astype(np.float32)
    frames = np.stack(
        [big[32 : 32 + h, 32 + int(round(shift * i)) : 32 + int(round(shift * i)) + w]
         for i in range(n_frames)]
    )
    times = np.arange(n_frames, dtype=np.float32) / 20.0
    return frames, times


def _load_config(path: str | None):
    from ekf_vio_tpu.config import VIOConfig

    return VIOConfig.from_yaml(path) if path else VIOConfig()


def _write_tum(path: str, times, base_mu):
    """TUM format: t x y z qx qy qz qw (state quat is [w,x,y,z])."""
    p = np.asarray(base_mu)[:, 0:3]
    q = np.asarray(base_mu)[:, 3:7]
    with open(path, "w") as f:
        for i in range(len(times)):
            f.write(
                f"{float(times[i]):.6f} {p[i,0]:.6f} {p[i,1]:.6f} {p[i,2]:.6f} "
                f"{q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f} {q[i,0]:.6f}\n"
            )


def cmd_run(args) -> int:
    import jax
    import jax.numpy as jnp

    from ekf_vio_tpu import engine
    from ekf_vio_tpu.frontend import camera as cam_mod
    from ekf_vio_tpu.utils.profiling import FrameTimer, trace

    cfg = _load_config(args.config)
    s = cfg.inverse_image_scale
    summary = {"config": args.config or "defaults"}

    # Mono-inertial mode comes from the profile (cfg.use_imu — a profile
    # like configs/mono_inertial.yaml is self-sufficient); --imu forces it
    # on, --no-imu forces vision-only (CLI flags are overrides).
    want_imu = (cfg.use_imu or args.imu) and not args.no_imu

    imu = None
    gt = None
    gravity = None
    if args.euroc:
        from ekf_vio_tpu.io import euroc

        mav0 = args.euroc if os.path.isdir(args.euroc) else euroc.find_euroc(args.euroc)
        if mav0 is None:
            print(f"error: EuRoC sequence '{args.euroc}' not found under "
                  f"{euroc.SEARCH_PATHS}", file=sys.stderr)
            return 2
        seq = euroc.load_sequence(mav0, name=args.euroc)
        count = args.frames or len(seq.image_paths)
        frames, K = euroc.load_images(seq, count=count, inverse_scale=s)
        times = seq.image_times[:count]
        if want_imu:
            # batch width from the profile's nominal IMU rate and the
            # sequence's actual frame cadence (zero-dt rows are padding)
            frame_dt = float(np.median(np.diff(times))) if count > 1 else 0.05
            max_per = max(int(np.ceil(cfg.imu_rate_hz * frame_dt)) + 2, 4)
            imu = euroc.imu_between_frames(seq, count=count,
                                           max_per_frame=max_per)
        gt = (seq.gt_times, seq.gt_pos)
        summary["sequence"] = args.euroc
    elif args.rendered:
        # photometrically-rendered synthetic scene with exact IMU + GT
        # (sim/rendered.py) — mono-inertial runs with no dataset on disk
        from ekf_vio_tpu.sim import rendered

        seq = rendered.generate(num_frames=args.rendered)
        frames, times = seq.frames, seq.times
        K = seq.K
        if want_imu:
            imu = (seq.imu_dt, seq.imu_gyro, seq.imu_accel)
            gravity = seq.gravity_w
        gt = (seq.times, seq.gt_pos)
        summary["sequence"] = f"rendered[{args.rendered}]"
    else:
        n = args.synthetic or 120
        frames_full, times = _make_synthetic(n)
        import cv2

        frames = np.stack(
            [cv2.resize(f, (f.shape[1] // s, f.shape[0] // s)) for f in frames_full]
        )
        K = np.array(
            [[458.0 / s, 0, frames.shape[2] / 2],
             [0, 458.0 / s, frames.shape[1] / 2], [0, 0, 1]], np.float32)
        summary["sequence"] = f"synthetic[{n}]"

    h, w = frames.shape[1:]
    cam = engine.make_hashable_camera(K, w, h)
    imgs = jnp.asarray(frames)
    ts = jnp.asarray(times)

    if imu is not None and gravity is None:
        from ekf_vio_tpu.core.imu import estimate_gravity_world

        gravity = estimate_gravity_world(jnp.asarray(imu[2][0]))

    ctx = trace(args.profile) if args.profile else _null_ctx()
    with ctx:
        if args.insight_dir:
            estate, outs, fps = _run_streaming(
                imgs, ts, cfg, cam, imu, args.insight_dir, args.log_every,
                gravity_w=gravity)
        else:
            timer = FrameTimer()
            with timer.frame():
                if imu is not None:
                    estate, outs = engine.run_sequence_imu(
                        imgs, ts, jnp.asarray(imu[0]), jnp.asarray(imu[1]),
                        jnp.asarray(imu[2]), jnp.asarray(gravity), cfg, cam,
                        init_frames=cfg.vi_init_frames)
                else:
                    estate, outs = engine.run_sequence(imgs, ts, cfg, cam)
                jax.block_until_ready(outs)
            fps = (len(times) - 1) / timer.total_s

    start = max(cfg.vi_init_frames, 1) if imu is not None else 1
    base = np.asarray(outs.base_mu)
    summary.update(
        frames=int(len(times)),
        fps=round(float(fps), 2),
        mode="imu" if imu is not None else "vision-only",
        final_position=[round(float(v), 4) for v in base[-1, :3]],
        mean_tracked=round(float(np.mean(np.asarray(outs.num_tracked))), 1),
        frames_tracking_lost=int(np.sum(np.asarray(outs.tracking_lost))),
    )

    if gt is not None:
        from ekf_vio_tpu.io.trajectory import ate_rmse

        try:
            summary["ate_rmse_m"] = round(
                ate_rmse(times[start:], base[:, :3], gt[0], gt[1]), 4)
        except ValueError as e:
            summary["ate_rmse_m"] = f"unavailable ({e})"

    if args.out:
        _write_tum(args.out, times[start:], base)
        summary["trajectory"] = args.out
    if args.checkpoint:
        from ekf_vio_tpu.io.checkpoint import save_npz

        save_npz(args.checkpoint, estate.filt)
        summary["checkpoint"] = args.checkpoint

    print(json.dumps(summary, indent=2))
    return 0


def _null_ctx():
    import contextlib

    return contextlib.nullcontext()


def _run_streaming(imgs, ts, cfg, cam, imu, insight_dir, log_every,
                   gravity_w=None):
    """Per-frame host loop: slower than the scan rollout, but exposes the
    filter state each frame for insight rendering (EKFVIO.cpp:379-442),
    including the per-feature covariance error ellipses
    (EKFVIO.cpp:316-377)."""
    import jax
    import jax.numpy as jnp

    from ekf_vio_tpu import engine
    from ekf_vio_tpu.frontend import camera as cam_mod
    from ekf_vio_tpu.utils.profiling import FrameTimer
    from ekf_vio_tpu.viz import insight

    os.makedirs(insight_dir, exist_ok=True)
    step = jax.jit(engine.step, static_argnames=("cfg", "cam"))
    if imu is not None:
        from ekf_vio_tpu.core import imu as imu_mod

        g = (jnp.asarray(gravity_w) if gravity_w is not None
             else jnp.array([0.0, 0.0, -cfg.gravity]))

    start = 1
    if imu is not None and cfg.vi_init_frames > 1 \
            and imgs.shape[0] > cfg.vi_init_frames:
        # same closed-form visual-inertial alignment as the scan rollout
        # (engine.run_sequence_imu) — without it the streaming mono path
        # started cold with unobservable velocity and wrong depths
        estate = engine.initialize_imu(
            imgs, ts, jnp.asarray(imu[0]), jnp.asarray(imu[1]),
            jnp.asarray(imu[2]), g, cfg, cam, cfg.vi_init_frames)
        start = cfg.vi_init_frames
    else:
        estate = engine.initialize(imgs[0], ts[0], cfg, cam)
    timer = FrameTimer(log_every=log_every)
    outs_list = []
    for i in range(start, imgs.shape[0]):
        with timer.frame():
            if imu is not None:
                batch = imu_mod.ImuSample(
                    dt=jnp.asarray(imu[0][i - 1]), gyro=jnp.asarray(imu[1][i - 1]),
                    accel=jnp.asarray(imu[2][i - 1]))
                estate, out = step(estate, imgs[i], ts[i], cfg, cam,
                                   imu_batch=batch, gravity_w=g)
            else:
                estate, out = step(estate, imgs[i], ts[i], cfg, cam)
            jax.block_until_ready(out)
        outs_list.append(jax.tree.map(np.asarray, out))

        filt = estate.filt
        feat_px = np.asarray(cam_mod.metric_to_pixel(cam, filt.feat_mu[:, :2]))
        img_u8 = np.asarray(imgs[i])
        # covariance error ellipses (factor mode stores L; Σ = L Lᵀ)
        Sigma = np.asarray(filt.Sigma)
        if cfg.square_root_form:
            Sigma = Sigma @ Sigma.T
        cov_px = insight.feature_pixel_covariances(
            Sigma, cam.fx, cam.fy, cfg.max_features)
        frame = insight.render_insight(
            img_u8, feat_px, np.asarray(filt.active), feat_cov_px=cov_px)
        _write_png(os.path.join(insight_dir, f"{i:06d}.png"), frame)

    outs = jax.tree.map(lambda *xs: np.stack(xs), *outs_list)
    return estate, outs, timer.fps


def _write_png(path, img):
    import cv2

    cv2.imwrite(path, img[..., ::-1] if img.ndim == 3 else img)


def cmd_sim(args) -> int:
    """Closed-loop synthetic convergence report — the analog of running
    ekfvio_analyze_ekf (reference: test/analyzeEKFSimulation.cpp:219-247)."""
    from ekf_vio_tpu.sim.simulator import run_reference_scenarios

    results = run_reference_scenarios(seed=args.seed)
    report = []
    for k, (scn, state, gt, telem) in enumerate(results):
        min_diag, asym, pos_err, feat_err = (np.asarray(t) for t in telem)
        report.append({
            "scenario": k + 1,
            "features": int(scn.feature_count),
            "steps": len(pos_err),
            "final_pos_err_m": round(float(pos_err[-1]), 6),
            "final_feat_err": round(float(feat_err[-1]), 6),
            "sigma_min_diag": round(float(min_diag.min()), 8),
            "sigma_max_asym": round(float(asym.max()), 8),
        })
    print(json.dumps(report, indent=2))
    return 0


def cmd_info(args) -> int:
    import dataclasses

    import jax

    from ekf_vio_tpu.config import VIOConfig

    cfg = _load_config(args.config)
    print(json.dumps({
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
        "config": dataclasses.asdict(cfg),
        "state_dim": cfg.state_dim,
    }, indent=2, default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ekf-vio-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run VIO on a sequence")
    src = r.add_mutually_exclusive_group()
    src.add_argument("--euroc", help="EuRoC sequence name or mav0 path")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="run on N synthetic frames")
    src.add_argument("--rendered", type=int, metavar="N",
                     help="run on N rendered-scene frames (IMU + GT, "
                          "sim/rendered.py)")
    r.add_argument("--config", help="YAML profile (configs/*.yaml)")
    r.add_argument("--imu", action="store_true",
                   help="force mono-inertial mode (overrides the profile)")
    r.add_argument("--no-imu", action="store_true",
                   help="force vision-only mode (overrides the profile)")
    r.add_argument("--frames", type=int, help="limit frame count")
    r.add_argument("--out", help="write TUM trajectory here")
    r.add_argument("--insight-dir", help="dump annotated insight PNGs (streaming)")
    r.add_argument("--checkpoint", help="save final filter state (npz)")
    r.add_argument("--profile", help="capture a jax.profiler trace to this dir")
    r.add_argument("--log-every", type=int, default=30,
                   help="streaming fps log period")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("sim", help="closed-loop synthetic scenario report")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_sim)

    i = sub.add_parser("info", help="devices + resolved config")
    i.add_argument("--config", help="YAML profile")
    i.set_defaults(fn=cmd_info)
    return p


def main(argv=None) -> int:
    from ekf_vio_tpu import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
