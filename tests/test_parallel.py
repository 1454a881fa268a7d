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
