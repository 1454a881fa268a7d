"""Square-root (Cholesky-factor) predict/update — the conditioning-first
variant the reference's ``fixSigma`` stub gestures at
(reference: TightlyCoupledEKF.cpp:716-718; SURVEY.md §7 hard-part 3).

Both steps run entirely in factor space, eliminating every
cancellation-prone operation of the covariance form:

* predict:  Σ' = FΣFᵀ + Q   becomes   L' = tria([F L | √Q])
* update:   the QR array algorithm — one orthogonal triangularization of

      pre = [[√R,  H L],          postᵀ = qr(preᵀ)  ⇒  post = [[S^c, 0 ],
             [ 0,   L ]]                                       [ G,  L']]

  with S^c S^cᵀ = HΣHᵀ+R, G = ΣHᵀS^{-cᵀ}, and L'L'ᵀ the *Joseph-exact*
  posterior — no Cholesky of S, no explicit gain matrix squaring, no
  (I−KH)Σ(I−KH)ᵀ subtraction, and PSD by construction.  The relative
  spectral floor the covariance-form update needs on TPU
  (VIOConfig.sigma_jitter_rel) is unnecessary here and not applied.

State representation: the FilterState keeps a *dense* Σ at every API
boundary (engine, checkpointing, slot add/drop and the sharded paths all
operate on Σ unchanged); each sqrt step factors on entry and squares on
exit.  Exactly-zero diagonal entries (the anchored pose gauge at init,
freed feature slots) are PSD-isolated rows, so they are stabilized with a
temporary unit diagonal that passes through both steps exactly and is
subtracted back off — the factorization itself never sees a singular
matrix.

Orthogonal transforms cannot amplify error, so the factor-space steps are
backward-stable where the covariance form loses ~half the working
precision to squaring — the reason this variant holds 503-slot updates in
f32 with zero jitter (see benchmarks/sqrt_validation.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ekf_vio_tpu.config import BASE_STATE_SIZE, VIOConfig
from ekf_vio_tpu.core import dynamics
from ekf_vio_tpu.core.state import FilterState, feature_rowcol_indices
from ekf_vio_tpu.core.update import block_diag_R


def _stabilized_chol(Sigma):
    """Lower Cholesky factor of Σ with exactly-zero diagonal entries
    (PSD ⇒ whole row/col is zero) temporarily pinned to 1.

    Returns (L, pad) where pad is the indicator of pinned entries; callers
    subtract diag(pad) back off the squared result.  The pinned rows stay
    e_k through F (identity rows for uncoupled states), √Q (zero), and the
    update (zero gain columns), so the round trip is exact to fp error in
    rows that are wiped again on slot reuse anyway.
    """
    d = jnp.diag(Sigma)
    pad = (d == 0.0).astype(Sigma.dtype)
    return jnp.linalg.cholesky(Sigma + jnp.diag(pad)), pad


@jax.default_matmul_precision("float32")
def predict_sqrt(state: FilterState, cfg: VIOConfig, dt) -> FilterState:
    """Square-root process step: same mean transport as filter.predict,
    covariance via one QR instead of the FΣFᵀ triple product."""
    dt = jnp.asarray(dt, state.base_mu.dtype)

    Fb, Ffb, Ff = dynamics.process_jacobian_blocks(state.base_mu,
                                                   state.feat_mu, dt)
    Ffb, Ff = dynamics.mask_feature_jacobians(Ffb, Ff, state.active)

    new_feat = dynamics.convolve_features(state.base_mu, state.feat_mu, dt)
    feat_mu = jnp.where(state.active[:, None], new_feat, state.feat_mu)
    base_mu = dynamics.convolve_base_state(state.base_mu, dt)

    q_diag = dynamics.process_noise_diag(dt, state.n_max, state.active,
                                         cfg).astype(state.Sigma.dtype)

    F = dynamics.build_dense_F(Fb, Ffb, Ff)
    L, pad = _stabilized_chol(state.Sigma)
    # tria([F L | √Q]): R of the stacked [2D, D] pre-array; Σ' = RᵀR.
    A = jnp.concatenate([(F @ L).T, jnp.diag(jnp.sqrt(q_diag))], axis=0)
    R = jnp.linalg.qr(A, mode="r")
    Sigma = R.T @ R - jnp.diag(pad)
    Sigma = 0.5 * (Sigma + Sigma.T)

    return state.replace(base_mu=base_mu, feat_mu=feat_mu, Sigma=Sigma,
                         t=state.t + dt)


@jax.default_matmul_precision("float32")
def update_sqrt(
    state: FilterState,
    cfg: VIOConfig,
    measured_uv: jnp.ndarray,  # [N_max, 2]
    meas_cov: jnp.ndarray,     # [N_max, 2, 2]
    passed: jnp.ndarray,       # [N_max] bool
) -> FilterState:
    """Masked square-root measurement update (QR array algorithm).

    Semantics match update.update_with_feature_positions (selector H on
    the (u,v) slots, Joseph-consistent posterior, failed features
    contribute nothing); only the arithmetic differs.
    """
    n = state.n_max
    d = state.state_dim
    uv_idx, _ = feature_rowcol_indices(n)

    meas = passed & state.active
    m = jnp.repeat(meas, 2).astype(state.Sigma.dtype)  # [2N]

    mu = state.mu_flat()
    y = (measured_uv.reshape(-1) - mu[uv_idx]) * m

    L, pad = _stabilized_chol(state.Sigma)
    HL = L[uv_idx, :] * m[:, None]                      # [2N, D]

    # √R block-diagonal: per-feature 2×2 Cholesky; unmeasured rows get the
    # identity so the post-array stays well posed with zero gain columns.
    Rc_blocks = jnp.linalg.cholesky(
        meas_cov + 1e-30 * jnp.eye(2, dtype=meas_cov.dtype))
    Rc = block_diag_R(Rc_blocks)
    mm = m[:, None] * m[None, :]
    Rc = Rc * mm + jnp.diag(1.0 - m)

    two_n = 2 * n
    pre_T = jnp.concatenate(
        [
            jnp.concatenate([Rc.T, jnp.zeros((two_n, d), L.dtype)], axis=1),
            jnp.concatenate([HL.T, L.T], axis=1),
        ],
        axis=0,
    )  # [(2N+D), (2N+D)]
    U = jnp.linalg.qr(pre_T, mode="r")
    post = U.T  # lower: [[S^c, 0], [G, L']]

    Sc = post[:two_n, :two_n]
    G = post[two_n:, :two_n]
    Lp = post[two_n:, two_n:]

    e = solve_triangular(Sc, y, lower=True)
    # NumericalIssue guard (TightlyCoupledEKF.cpp:579): skip on failure.
    ok = jnp.isfinite(e).all() & jnp.isfinite(G).all()
    e = jnp.where(ok, e, 0.0)

    mu = mu + G @ e
    Sigma = Lp @ Lp.T - jnp.diag(pad)
    Sigma = jnp.where(ok, Sigma, state.Sigma)
    Sigma = 0.5 * (Sigma + Sigma.T)

    qn = jnp.linalg.norm(mu[3:7])
    mu = mu.at[3:7].divide(qn)

    base_mu = mu[:BASE_STATE_SIZE]
    feat_mu = mu[BASE_STATE_SIZE:].reshape(n, 3)
    klt_ref = jnp.where(meas[:, None], measured_uv, state.klt_ref)

    return state.replace(base_mu=base_mu, feat_mu=feat_mu, Sigma=Sigma,
                         klt_ref=klt_ref)
