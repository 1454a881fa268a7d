"""Sharding tests on the 8-device virtual CPU mesh: the sharded batched
filter step must compile, execute, and match the unsharded result."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.parallel import batched, mesh as mesh_mod


def test_mesh_creation():
    mesh = mesh_mod.make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "state": 2}


def test_aligned_capacity():
    assert mesh_mod.aligned_capacity(16, 4) == 18  # 22+54=76 = 4*19
    assert mesh_mod.aligned_capacity(16, 2) == 16  # 70 already even


def test_sharded_step_matches_unsharded():
    cfg = VIOConfig(max_features=mesh_mod.aligned_capacity(16, 4))
    mesh = mesh_mod.make_mesh(2, 4)

    state = batched.init_batched_state(cfg, batch=4)
    z = state.feat_mu[:, :, :2] + 0.01

    plain = batched.make_batched_filter_step(cfg, None)
    ref = plain(state, z, 0.05)

    sharded_state = jax.device_put(
        state, mesh_mod.filter_state_shardings(mesh, True))
    sharded = batched.make_batched_filter_step(cfg, mesh)
    got = sharded(sharded_state, z, 0.05)

    np.testing.assert_allclose(np.asarray(got.base_mu), np.asarray(ref.base_mu),
                               rtol=1e-5, atol=1e-5)
    # sharded reductions reassociate float sums; tolerance reflects that
    np.testing.assert_allclose(np.asarray(got.Sigma), np.asarray(ref.Sigma),
                               rtol=1e-4, atol=5e-5)


def test_graft_entry_single_chip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out_state, outs = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(outs.base_mu)).all()


def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.dryrun_multichip(8)


def test_batched_engine_two_sequences():
    """vmapped multi-sequence rollout (config 4 analog) on the CPU mesh."""
    import scipy.ndimage as ndi
    from ekf_vio_tpu import engine
    from ekf_vio_tpu.parallel import batched_engine

    rng = np.random.RandomState(0)
    h, w, t = 96, 128, 6
    seqs = []
    for b in range(2):
        big = ndi.gaussian_filter(rng.uniform(0, 255, (h + 20, w + 30)), 1.5)
        big = ((big - big.min()) / (np.ptp(big) + 1e-9) * 255).astype(np.float32)
        seqs.append(np.stack([big[10:10 + h, 10 + i:10 + i + w]
                              for i in range(t)]))
    images = jnp.asarray(np.stack(seqs))
    times = jnp.tile(jnp.arange(t, dtype=jnp.float32) * 0.05, (2, 1))

    cfg = VIOConfig(max_features=24, num_features=16, fast_threshold=12,
                    min_new_feature_dist=10.0)
    cam = engine.make_hashable_camera(
        [[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], w, h)

    estates, outs = batched_engine.run_sequences_batched(images, times, cfg, cam)
    assert outs.base_mu.shape == (2, t - 1, 22)
    assert np.isfinite(np.asarray(outs.base_mu)).all()
    # batch members evolved independently (different textures -> different
    # trajectories)
    assert not np.allclose(np.asarray(outs.base_mu[0]),
                           np.asarray(outs.base_mu[1]))

    # sharded variant over the data axis runs and produces valid rollouts.
    # (Bitwise trajectory equality is not expected: replenishment is
    # winner-take-all over corner scores, so a single ULP difference from
    # differently-partitioned reductions can legitimately pick a different
    # feature; numeric sharding equivalence is asserted on the filter step
    # in test_sharded_step_matches_unsharded.)
    mesh = mesh_mod.make_mesh(2, 1)
    e2, o2 = batched_engine.run_sequences_sharded(images, times, cfg, cam, mesh)
    assert o2.base_mu.shape == (2, t - 1, 22)
    assert np.isfinite(np.asarray(o2.base_mu)).all()
    assert np.asarray(o2.num_tracked).min() > 0


def test_config_yaml_profiles():
    import pathlib
    from ekf_vio_tpu.config import VIOConfig as C

    root = pathlib.Path(__file__).parent.parent / "configs"
    c1 = C.from_yaml(str(root / "test.yaml"))
    assert c1.num_features == 30
    c2 = C.from_yaml(str(root / "fast_with_insight.yaml"))
    assert c2.num_features == 400 and c2.inverse_image_scale == 2
