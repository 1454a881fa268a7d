"""Two-view depth initialization tests (the wired-up version of the
reference's offline Octave prototypes, octave/linear_depth_sol.m and
octave/depth_optim.m)."""
import jax.numpy as jnp
import numpy as np

from ekf_vio_tpu.core import depth_init, lie


def make_two_views(points_c1, R, t):
    """Project camera-1-frame points into both views given p2 = R p1 + t."""
    p1 = np.asarray(points_c1, np.float32)
    p2 = (np.asarray(R) @ p1.T).T + np.asarray(t)
    return p1[:, :2] / p1[:, 2:3], p2[:, :2] / p2[:, 2:3], p2[:, 2]


class TestLinearDepth:
    def test_exact_recovery_lateral(self):
        rng = np.random.RandomState(0)
        z = rng.uniform(0.5, 5.0, 16)
        pts = np.stack([rng.uniform(-0.5, 0.5, 16) * z,
                        rng.uniform(-0.5, 0.5, 16) * z, z], -1)
        R = np.eye(3, dtype=np.float32)
        t = np.array([-0.2, 0.0, 0.0], np.float32)  # lateral baseline
        h1, h2, z2 = make_two_views(pts, R, t)
        zl, ok = depth_init.linear_depth(jnp.asarray(h1), jnp.asarray(h2),
                                         jnp.asarray(R), jnp.asarray(t))
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(zl), z, rtol=1e-3)

    def test_exact_recovery_with_rotation(self):
        rng = np.random.RandomState(1)
        z = rng.uniform(0.5, 3.0, 16)
        pts = np.stack([rng.uniform(-0.3, 0.3, 16) * z,
                        rng.uniform(-0.3, 0.3, 16) * z, z], -1)
        dq = lie.quat_exp_omega(jnp.array([0.02, 0.05, 0.1]), 1.0)
        R = np.asarray(lie.quat_to_matrix(dq))
        t = np.array([0.1, -0.05, 0.02], np.float32)
        h1, h2, _ = make_two_views(pts, R, t)
        zl, ok = depth_init.linear_depth(jnp.asarray(h1), jnp.asarray(h2),
                                         jnp.asarray(R), jnp.asarray(t))
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(zl), z, rtol=1e-2)

    def test_degenerate_zero_baseline(self):
        h = jnp.array([[0.1, 0.2], [0.0, -0.3]])
        z, ok = depth_init.linear_depth(h, h, jnp.eye(3), jnp.zeros(3))
        assert not np.asarray(ok).any()

    def test_negative_depth_rejected(self):
        # observation on the wrong epipolar side: p2 = p1 + [0.2,0,0] with
        # u2 = -0.5 requires z = 0.2/(-0.5) < 0 -> invalid
        h1 = jnp.array([[0.0, 0.0]])
        h2 = jnp.array([[-0.5, 0.0]])
        t = jnp.array([0.2, 0.0, 0.0])
        z, ok = depth_init.linear_depth(h1, h2, jnp.eye(3), t)
        assert not np.asarray(ok).any()


class TestRefinement:
    def test_gn_recovers_from_perturbed_init(self):
        rng = np.random.RandomState(2)
        z = rng.uniform(0.5, 3.0, 8)
        pts = np.stack([rng.uniform(-0.3, 0.3, 8) * z,
                        rng.uniform(-0.3, 0.3, 8) * z, z], -1)
        R = np.eye(3, dtype=np.float32)
        t = np.array([-0.3, 0.1, 0.0], np.float32)
        h1, h2, _ = make_two_views(pts, R, t)
        z0 = jnp.asarray(z * rng.uniform(0.7, 1.4, 8))  # poor init
        zr = depth_init.refine_depth_gn(jnp.asarray(h1), jnp.asarray(h2),
                                        jnp.asarray(R), jnp.asarray(t),
                                        z0, iters=10)
        np.testing.assert_allclose(np.asarray(zr), z, rtol=1e-3)


class TestTriangulateDepths:
    def test_end_to_end_with_filter_motion(self):
        """Depths from the filter's own frame-to-frame motion model."""
        rng = np.random.RandomState(3)
        z = rng.uniform(0.5, 2.0, 12)
        pts_prev = np.stack([rng.uniform(-0.4, 0.4, 12) * z,
                             rng.uniform(-0.4, 0.4, 12) * z, z], -1)
        base_mu = jnp.zeros(22).at[3].set(1.0)
        base_mu = base_mu.at[7:10].set(jnp.array([0.5, 0.0, 0.0]))  # vel
        base_mu = base_mu.at[10:13].set(jnp.array([0.0, 0.1, 0.0]))  # omega
        dt = 0.1
        R, t = depth_init.relative_motion(base_mu, dt)
        h1, h2, z2 = make_two_views(pts_prev, np.asarray(R), np.asarray(t))
        zc, ok = depth_init.triangulate_depths(
            jnp.asarray(h1), jnp.asarray(h2), base_mu, dt, 0.5)
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(zc), z2, rtol=1e-2)

    def test_fallback_to_default_without_parallax(self):
        base_mu = jnp.zeros(22).at[3].set(1.0)  # no motion
        h = jnp.array([[0.1, -0.2], [0.3, 0.0]])
        zc, ok = depth_init.triangulate_depths(h, h, base_mu, 0.05, 0.5)
        assert not np.asarray(ok).any()
        np.testing.assert_allclose(np.asarray(zc), 0.5)


class TestParallaxScaledConfidence:
    """Round-4 robustness: triangulate_depths exposes the geometric error
    amplification (σ_z/z ≈ σ_angle/parallax) so callers can scale the
    depth prior and gate the mean (the r3 ATE-transient fix)."""

    def test_rel_sigma_inversely_tracks_parallax(self):
        import jax.numpy as jnp

        from ekf_vio_tpu.core import depth_init

        R = jnp.eye(3)
        h1 = jnp.array([[0.1, 0.05], [0.3, -0.2]])
        base_mu = jnp.zeros(22).at[3].set(1.0)
        # larger baseline -> more parallax -> smaller rel_sigma
        z_small, ok_s, rs_small = depth_init.triangulate_depths(
            h1, h1 + jnp.array([0.002, 0.0]), base_mu, 0.05, 0.5,
            Rt=(R, jnp.array([0.004, 0.0, 0.0])), return_rel_sigma=True)
        z_big, ok_b, rs_big = depth_init.triangulate_depths(
            h1, h1 + jnp.array([0.02, 0.0]), base_mu, 0.05, 0.5,
            Rt=(R, jnp.array([0.04, 0.0, 0.0])), return_rel_sigma=True)
        assert (np.asarray(rs_big) < np.asarray(rs_small)).all()

    def test_zero_baseline_rel_sigma_huge(self):
        """No baseline: the pair is degenerate — rel_sigma must be large
        enough that any noise-scaled gate rejects the mean."""
        import jax.numpy as jnp

        from ekf_vio_tpu.core import depth_init

        R = jnp.eye(3)
        h = jnp.array([[0.1, 0.05], [-0.2, 0.3]])
        base_mu = jnp.zeros(22).at[3].set(1.0)
        _, ok, rs = depth_init.triangulate_depths(
            h, h, base_mu, 0.05, 0.5, Rt=(R, jnp.zeros(3)),
            return_rel_sigma=True)
        # identical rays: cross magnitude ~0 -> rel_sigma at the clamp
        assert (np.asarray(rs) > 1e4).all()

    def test_add_features_depth_vars(self):
        """Per-candidate depth-prior variances land on the ρ diagonal and
        are capped by the constant prior."""
        import jax.numpy as jnp

        from ekf_vio_tpu.config import VIOConfig
        from ekf_vio_tpu.core import filter as ekf
        from ekf_vio_tpu.core.state import feature_rowcol_indices

        cfg = VIOConfig(max_features=4)
        s = ekf.init_state(cfg)
        uv = jnp.tile(jnp.array([[0.1, -0.1]]), (4, 1))
        valid = jnp.array([True, True, False, False])
        dvars = jnp.array([0.04, 1e6, 1.0, 1.0])  # 2nd one over the cap
        s = ekf.add_features(s, cfg, uv, valid,
                             depths=jnp.full((4,), 2.0), depth_vars=dvars)
        _, uvr = feature_rowcol_indices(4)
        rho_rows = np.asarray(uvr).reshape(4, 3)[:, 2]
        diag = np.diag(np.asarray(s.Sigma))
        assert diag[rho_rows[0]] == np.float32(0.04)
        assert diag[rho_rows[1]] == np.float32(
            cfg.default_point_depth_variance)
