"""Distributed large-state filter: explicit shard_map block partition of Σ.

This is the real Schur-style block-partitioned covariance update the
north star demands (BASELINE.json: "Schur-complement-style block reduction
of the update over ICI collectives") — the distributed analog of the
reference's sparse-LDLT gain solve (reference:
TightlyCoupledEKF.cpp:559-580) and Joseph-form covariance update
(TightlyCoupledEKF.cpp:586-596).

Representation
--------------
Σ is stored split so shard boundaries align with the state structure
(base block 22 wide, feature blocks 3 wide):

    bb [22, 22]    base block            — replicated
    bf [22, 3N]    base-feature cross    — column-sharded over ``state``
    ff [3N, 3N]    feature block         — row-sharded over ``state``

Each device owns the rows of ``ff`` (and columns of ``bf``) of a
contiguous range of N/ns features.  Per-device covariance memory is
O(D²/ns), vs O(D²) for the replicated-GSPMD formulation.

Why the update distributes with one gather
------------------------------------------
The measurement model is a selector H picking feature (u, v) rows, so
with U = HΣ ([2M, D], gathered once over the state axis) the whole
update follows from the replicated small system S = U Hᵀ + R:

    V   = S⁻¹ U                (the gain solve; distributed over U's
                                columns — each device solves its block)
    K   = Σ Hᵀ S⁻¹ = Uᵀ S⁻¹ = Vᵀ      (Σ symmetric ⇒ no second solve)
    μ  += Vᵀ y
    M   = (I − KH) Σ = Σ − Vᵀ U           (row-block local: Mₖ = Σₖ − Vₖᵀ U)
    Σ'  = M (I − KH)ᵀ + K R Kᵀ
        = M − M[:, uv] V + Vᵀ R V          (again row-block local)

so every O(D²·M) product is a *local* matmul on the device's row block;
the only cross-device traffic is all-gathering U and V ([2M, 3N] each)
plus two [22, 2M]-sized gathers — Schur-complement block reduction with
ICI-collective cost O(D·M), compute cost O(D²·M / ns) per device.

The predict Σ ← FΣFᵀ + Q distributes the same way because F is
block-structured (F = [[Fb, 0], [L, blkdiag(Ff)]], dynamics.build_dense_F):
one [22, 3N] all-gather of ΣbfBᵀ and all heavy products are local.

Numerical recipe (jitter, masking, Joseph form, quaternion renorm,
solve-failure guard) matches core/update.py exactly; parity is asserted
in tests/test_sharded_filter.py and benchmarks/scaling_dryrun.py.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ekf_vio_tpu.config import BASE_STATE_SIZE as NB, VIOConfig
from ekf_vio_tpu.core import dynamics
from ekf_vio_tpu.core.state import FilterState, diag_embed, diag_of
from ekf_vio_tpu.core.update import block_diag_R

AXIS = "state"


# --------------------------------------------------------------------------
# Split-Σ state pytree
# --------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base_mu", "feat_mu", "active", "klt_ref", "bb", "bf", "ff",
                 "t", "age"],
    meta_fields=[],
)
@dataclasses.dataclass
class ShardedFilterState:
    """FilterState with Σ split into (bb, bf, ff) for explicit sharding.

    Everything except bf/ff is replicated across the ``state`` axis."""
    base_mu: jnp.ndarray  # [22]
    feat_mu: jnp.ndarray  # [N, 3]
    active: jnp.ndarray   # [N] bool
    klt_ref: jnp.ndarray  # [N, 2]
    bb: jnp.ndarray       # [22, 22]
    bf: jnp.ndarray       # [22, 3N]
    ff: jnp.ndarray       # [3N, 3N]
    t: jnp.ndarray
    age: jnp.ndarray      # [N] int32

    @property
    def n_max(self) -> int:
        return self.feat_mu.shape[-2]

    def replace(self, **kw) -> "ShardedFilterState":
        return dataclasses.replace(self, **kw)


def split_state(state: FilterState) -> ShardedFilterState:
    S = state.Sigma
    return ShardedFilterState(
        base_mu=state.base_mu, feat_mu=state.feat_mu, active=state.active,
        klt_ref=state.klt_ref, bb=S[:NB, :NB], bf=S[:NB, NB:],
        ff=S[NB:, NB:], t=state.t, age=state.age)


def merge_state(s: ShardedFilterState) -> FilterState:
    d = NB + 3 * s.n_max
    Sigma = jnp.zeros((d, d), s.bb.dtype)
    Sigma = Sigma.at[:NB, :NB].set(s.bb)
    Sigma = Sigma.at[:NB, NB:].set(s.bf)
    Sigma = Sigma.at[NB:, :NB].set(s.bf.T)
    Sigma = Sigma.at[NB:, NB:].set(s.ff)
    return FilterState(base_mu=s.base_mu, feat_mu=s.feat_mu, active=s.active,
                       klt_ref=s.klt_ref, Sigma=Sigma, t=s.t, age=s.age)


def state_pspecs(batched: bool = False) -> ShardedFilterState:
    """PartitionSpecs for a ShardedFilterState (optionally 'data'-batched)."""
    b = ("data",) if batched else ()

    def s(*spec):
        return P(*b, *spec)

    return ShardedFilterState(
        base_mu=s(None), feat_mu=s(None, None), active=s(None),
        klt_ref=s(None, None), bb=s(None, None), bf=s(None, AXIS),
        ff=s(AXIS, None), t=s(), age=s(None))


def state_shardings(mesh: Mesh, batched: bool = False) -> ShardedFilterState:
    return jax.tree.map(lambda p: NamedSharding(mesh, p),
                        state_pspecs(batched),
                        is_leaf=lambda x: isinstance(x, P))


def aligned_feature_capacity(n_features: int, n_state: int) -> int:
    """Round the slot capacity up so each state shard owns whole features."""
    return -(-n_features // n_state) * n_state


# --------------------------------------------------------------------------
# Block-diagonal helpers (B = blkdiag of [m, 3, 3] blocks)
# --------------------------------------------------------------------------


def _blk_left(B, M):
    """blkdiag(B) @ M for M [3m, c]."""
    m = B.shape[0]
    return jnp.einsum("nij,njc->nic", B, M.reshape(m, 3, -1)).reshape(
        3 * m, -1)


def _blk_right(M, B):
    """M @ blkdiag(B)ᵀ for M [r, 3m]."""
    m = B.shape[0]
    return jnp.einsum("rnj,nij->rni", M.reshape(M.shape[0], m, 3), B).reshape(
        M.shape[0], -1)


def _uv_of(nfeat: int):
    """(u, v) row indices within a 3·nfeat feature block."""
    base = 3 * jnp.arange(nfeat)
    return jnp.stack([base, base + 1], -1).reshape(-1)  # [2·nfeat]


def _transpose_ff(ff_l, ns):
    """Row block k of ffᵀ from row-sharded ff: all_to_all block transpose."""
    col_blk = jax.lax.all_to_all(ff_l, AXIS, split_axis=1, concat_axis=0,
                                 tiled=True)  # [3N, 3Nb] = ff[:, my cols]
    return col_blk.T


# --------------------------------------------------------------------------
# Per-device predict:  Σ ← F Σ Fᵀ + Q  with F = [[Fb, 0], [L, blkdiag(Ff)]]
# --------------------------------------------------------------------------


@jax.default_matmul_precision("float32")
def _propagate_shard(bb, bf_l, ff_l, Fb, Ffb, Ff, q_base, q_feat):
    """One covariance propagation on this device's row/column block.

    Replicated inputs: Fb [22,22], Ffb [N,3,22], Ff [N,3,3] (masked),
    q_base [22], q_feat [3N].  One [22, 3N] all-gather; everything else
    local (the distributed form of dynamics.propagate_covariance_blocked).
    """
    k = jax.lax.axis_index(AXIS)
    n3b = ff_l.shape[0]          # 3·(N/ns)
    nb_feat = n3b // 3

    L = Ffb.reshape(-1, NB)                                   # [3N, 22]
    L_l = jax.lax.dynamic_slice_in_dim(L, k * n3b, n3b, 0)    # [3Nb, 22]
    Ff_l = jax.lax.dynamic_slice_in_dim(Ff, k * nb_feat, nb_feat, 0)

    Sbb_Lt_l = bb @ L_l.T                                     # [22, 3Nb]
    Sbf_Bt_l = _blk_right(bf_l, Ff_l)                         # [22, 3Nb]

    new_bf_l = Fb @ (Sbb_Lt_l + Sbf_Bt_l)

    # the one collective: assemble Σbf Bᵀ column blocks
    Sbf_Bt = jax.lax.all_gather(Sbf_Bt_l, AXIS, axis=1, tiled=True)  # [22,3N]

    bb_Lt = bb @ L.T                                          # [22, 3N]
    term1 = L_l @ bb_Lt                                       # L Σbb Lᵀ rows
    term2 = L_l @ Sbf_Bt                                      # L (Σbf Bᵀ)
    term3 = Sbf_Bt_l.T @ L.T                                  # (L Σbf Bᵀ)ᵀ rows
    term4 = _blk_right(_blk_left(Ff_l, ff_l), Ff)             # B Σff Bᵀ rows

    new_ff_l = term1 + term2 + term3 + term4
    rows = jnp.arange(n3b)
    q_l = jax.lax.dynamic_slice_in_dim(q_feat, k * n3b, n3b, 0)
    new_ff_l = new_ff_l.at[rows, k * n3b + rows].add(q_l)

    new_bb = Fb @ bb @ Fb.T + diag_embed(q_base)
    new_bb = 0.5 * (new_bb + new_bb.T)
    return new_bb, new_bf_l, new_ff_l


# --------------------------------------------------------------------------
# Per-device measurement update (Joseph form, gain solve distributed)
# --------------------------------------------------------------------------


@jax.default_matmul_precision("float32")
def _update_shard(bb, bf_l, ff_l, base_mu, feat_mu, klt_ref,
                  measured_uv, meas_cov, meas, *, cfg: VIOConfig):
    """The distributed EKF update (see module docstring for the algebra).

    meas [N] bool is the effective measurement mask (passed & active),
    computed replicated by the caller.  Mirrors core/update._update_f32
    step for step so the two agree to f32 tolerance.
    """
    ns = jax.lax.axis_size(AXIS)
    k = jax.lax.axis_index(AXIS)
    n = feat_mu.shape[0]
    n3b = ff_l.shape[0]
    nb_feat = n3b // 3
    dtype = ff_l.dtype

    uvg = _uv_of(n)              # [2N] (u,v) rows within the 3N block
    uvl = _uv_of(nb_feat)        # [2Nb] within my rows

    m = jnp.repeat(meas, 2).astype(dtype)                     # [2N]

    # ---- assemble U = HΣ  (rows: masked;  [2N, 22] ⊕ [2N, 3N])
    Ub_l = bf_l[:, uvl].T                                     # [2Nb, 22]
    Uf_l = ff_l[uvl, :]                                       # [2Nb, 3N]
    Ub = jax.lax.all_gather(Ub_l, AXIS, axis=0, tiled=True)   # [2N, 22]
    Uf = jax.lax.all_gather(Uf_l, AXIS, axis=0, tiled=True)   # [2N, 3N]

    # ---- S = HΣHᵀ + R, masked exactly like the dense path
    Rblk = block_diag_R(meas_cov)                             # [2N, 2N]
    S = Uf[:, uvg] + Rblk
    mm = m[:, None] * m[None, :]
    S = S * mm + diag_embed(1.0 - m)
    lam = cfg.sigma_jitter + cfg.sigma_jitter_rel * jnp.max(diag_of(S) * m)
    S = S + lam * jnp.eye(2 * n, dtype=dtype)

    Ub_m = Ub * m[:, None]
    Uf_m = Uf * m[:, None]

    # ---- gain solve: V = S⁻¹ U, distributed over U's columns
    chol = cho_factor(S, lower=True)
    Vb = cho_solve(chol, Ub_m)                                # [2N, 22]
    Uf_m_mycols = jax.lax.dynamic_slice_in_dim(Uf_m, k * n3b, n3b, 1)
    Vf_l = cho_solve(chol, Uf_m_mycols)                       # [2N, 3Nb]
    Vf = jax.lax.all_gather(Vf_l, AXIS, axis=1, tiled=True)   # [2N, 3N]

    # NumericalIssue guard (TightlyCoupledEKF.cpp:579): skip the update if
    # the factorization failed anywhere (checked on the replicated blocks
    # so every device takes the same branch).
    solve_ok = jnp.isfinite(Vb).all() & jnp.isfinite(Vf).all()
    Vb = jnp.where(solve_ok, Vb, 0.0)
    Vf = jnp.where(solve_ok, Vf, 0.0)
    Vf_l = jnp.where(solve_ok, Vf_l, 0.0)

    # ---- mean update  μ += Ky = Vᵀ y
    z = measured_uv.reshape(-1)                               # [2N]
    y = (z - feat_mu.reshape(-1)[uvg]) * m
    new_base = base_mu + Vb.T @ y
    new_feat = (feat_mu.reshape(-1) + Vf.T @ y)
    qn = jnp.linalg.norm(new_base[3:7])
    new_base = new_base.at[3:7].divide(qn)                    # quat renorm

    # ---- Joseph covariance:  M = Σ − Vᵀ U;  Σ' = M − M[:,uv] V + Vᵀ R V
    M_bb = bb - Vb.T @ Ub_m                                   # [22, 22]
    M_bf_l = bf_l - Vb.T @ Uf_m_mycols                        # [22, 3Nb]
    M_ff_l = ff_l - Vf_l.T @ Uf_m                             # [3Nb, 3N]

    Mbf_uv_l = M_bf_l[:, uvl]                                 # [22, 2Nb]
    Mbf_uv = jax.lax.all_gather(Mbf_uv_l, AXIS, axis=1, tiled=True)

    # R is 2x2 block diagonal (masked: R_i · meas_i) — apply blockwise
    # instead of a dense [2N, 2N] matmul.
    Rb = meas_cov * meas[:, None, None].astype(dtype)         # [N, 2, 2]

    def rmul(X):  # (Rm @ X) for X [2N, c]
        return jnp.einsum("nij,njc->nic", Rb,
                          X.reshape(n, 2, -1)).reshape(2 * n, -1)

    RV_b = rmul(Vb)                                           # [2N, 22]
    RV_f_l = rmul(Vf_l)                                       # [2N, 3Nb]

    new_bb = M_bb - Mbf_uv @ Vb + Vb.T @ RV_b
    new_bb = 0.5 * (new_bb + new_bb.T)
    new_bf_l = M_bf_l - Mbf_uv @ Vf_l + Vb.T @ RV_f_l
    # Vᵀ R V row block: rows are my feature rows → Vf_lᵀ (R Vf)
    new_ff_l = M_ff_l - M_ff_l[:, uvg] @ Vf + Vf_l.T @ rmul(Vf)

    # distributed symmetrization of ff (the dense path's 0.5(Σ+Σᵀ))
    new_ff_l = 0.5 * (new_ff_l + _transpose_ff(new_ff_l, ns))

    new_klt = jnp.where(meas[:, None], measured_uv, klt_ref)
    return (new_bb, new_bf_l, new_ff_l, new_base,
            new_feat.reshape(n, 3), new_klt)


# --------------------------------------------------------------------------
# Per-device slot reset: zero Σ rows/cols of a slot set, set new diagonal
# (serves add_features, drop_features and the IMU depth re-init)
# --------------------------------------------------------------------------


def _slot_reset_shard(bf_l, ff_l, wipe3, diag_new):
    """wipe3 [3N] bool — state rows/cols to clear; diag_new [3N] values
    written on the cleared diagonal entries (0 for drops)."""
    k = jax.lax.axis_index(AXIS)
    n3b = ff_l.shape[0]
    w_l = jax.lax.dynamic_slice_in_dim(wipe3, k * n3b, n3b, 0)
    d_l = jax.lax.dynamic_slice_in_dim(diag_new, k * n3b, n3b, 0)

    bf_l = jnp.where(w_l[None, :], 0.0, bf_l)
    ff_l = jnp.where(w_l[:, None] | wipe3[None, :], 0.0, ff_l)
    rows = jnp.arange(n3b)
    cols = k * n3b + rows
    diag = ff_l[rows, cols]
    ff_l = ff_l.at[rows, cols].set(jnp.where(w_l, d_l, diag))
    return bf_l, ff_l


# --------------------------------------------------------------------------
# Per-device IMU-interval covariance terms (compound propagation)
# --------------------------------------------------------------------------


@jax.default_matmul_precision("float32")
def _imu_cov_shard(bb, bf_l, ff_l, Fb, Ffb, Ff, q_feat, Q29, W):
    """Sharded analog of the Σ algebra in imu.propagate_imu_batch_with_motion:
    blocked FΣFᵀ + Q plus the accumulated IMU noise (base block Q29[:22,:22],
    rank-7 feature block W Q29_qt Wᵀ and cross terms)."""
    ns = jax.lax.axis_size(AXIS)
    k = jax.lax.axis_index(AXIS)
    n3b = ff_l.shape[0]

    bb2, bf_l2, ff_l2 = _propagate_shard(
        bb, bf_l, ff_l, Fb, Ffb, Ff,
        jnp.zeros((NB,), bb.dtype), q_feat)

    Wm = W.reshape(-1, 7)                                     # [3N, 7]
    Wm_l = jax.lax.dynamic_slice_in_dim(Wm, k * n3b, n3b, 0)  # [3Nb, 7]

    bb2 = bb2 + Q29[:NB, :NB]
    bb2 = 0.5 * (bb2 + bb2.T)
    Qbf_l = Q29[:NB, NB:] @ Wm_l.T                            # [22, 3Nb]
    bf_l2 = bf_l2 + Qbf_l
    ff_l2 = ff_l2 + Wm_l @ Q29[NB:, NB:] @ Wm.T               # [3Nb, 3N]
    ff_l2 = 0.5 * (ff_l2 + _transpose_ff(ff_l2, ns))
    return bb2, bf_l2, ff_l2


# --------------------------------------------------------------------------
# Public ops: shard_map-wrapped filter steps on ShardedFilterState
# --------------------------------------------------------------------------


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def sharded_predict(state: ShardedFilterState, cfg: VIOConfig, dt,
                    mesh: Mesh) -> ShardedFilterState:
    """Distributed analog of core.filter.predict (vision random-walk
    process).  Jacobian blocks are computed replicated (O(N) small) and
    the covariance propagation is shard_map'd."""
    dt = jnp.asarray(dt, state.base_mu.dtype)
    Fb, Ffb, Ff = dynamics.process_jacobian_blocks(
        state.base_mu, state.feat_mu, dt)
    Ffb, Ff = dynamics.mask_feature_jacobians(Ffb, Ff, state.active)

    q = dynamics.process_noise_diag(dt, state.n_max, state.active, cfg)
    q = q.astype(state.bb.dtype)
    q_base, q_feat = q[:NB], q[NB:]

    rep = P()
    bb, bf, ff = _shmap(
        _propagate_shard, mesh,
        in_specs=(rep, P(None, AXIS), P(AXIS, None), rep, rep, rep, rep, rep),
        out_specs=(rep, P(None, AXIS), P(AXIS, None)),
    )(state.bb, state.bf, state.ff, Fb, Ffb, Ff, q_base, q_feat)

    new_feat = dynamics.convolve_features(state.base_mu, state.feat_mu, dt)
    feat_mu = jnp.where(state.active[:, None], new_feat, state.feat_mu)
    base_mu = dynamics.convolve_base_state(state.base_mu, dt)
    return state.replace(base_mu=base_mu, feat_mu=feat_mu, bb=bb, bf=bf,
                         ff=ff, t=state.t + dt)


@jax.default_matmul_precision("float32")
def _update_shard_compact(bb, bf_l, ff_l, base_mu, feat_mu, klt_ref,
                          measured_uv, meas_cov, meas, idx_c, *,
                          cfg: VIOConfig):
    """Compacted distributed update: only the ``B = len(idx_c)`` slots
    gathered by the caller enter the factorization.  Mirrors the dense
    compacted path (core/update.py budget) with the same collectives as
    ``_update_shard``; the replicated Cholesky runs at [2B, 2B]."""
    ns = jax.lax.axis_size(AXIS)
    k = jax.lax.axis_index(AXIS)
    n = feat_mu.shape[0]
    n3b = ff_l.shape[0]
    nb_feat = n3b // 3
    dtype = ff_l.dtype
    b = idx_c.shape[0]

    uvl = _uv_of(nb_feat)
    uvg_c = (3 * idx_c[:, None] + jnp.arange(2)[None, :]).reshape(-1)  # [2B]
    row_c = (2 * idx_c[:, None] + jnp.arange(2)[None, :]).reshape(-1)  # [2B]
    meas_c = meas[idx_c]
    m = jnp.repeat(meas_c, 2).astype(dtype)                   # [2B]

    # ---- assemble U = HΣ over ALL uv rows (same collectives as the full
    # path), then compact the row set replicated
    Ub_l = bf_l[:, uvl].T                                     # [2Nb, 22]
    Uf_l = ff_l[uvl, :]                                       # [2Nb, 3N]
    Ub = jax.lax.all_gather(Ub_l, AXIS, axis=0, tiled=True)   # [2N, 22]
    Uf = jax.lax.all_gather(Uf_l, AXIS, axis=0, tiled=True)   # [2N, 3N]
    Ub_c = Ub[row_c]                                          # [2B, 22]
    Uf_c = Uf[row_c]                                          # [2B, 3N]

    # ---- S_c = HΣHᵀ + R on the compacted set
    Rblk = block_diag_R(meas_cov[idx_c])                      # [2B, 2B]
    S = Uf_c[:, uvg_c] + Rblk
    mm = m[:, None] * m[None, :]
    S = S * mm + diag_embed(1.0 - m)
    lam = cfg.sigma_jitter + cfg.sigma_jitter_rel * jnp.max(diag_of(S) * m)
    S = S + lam * jnp.eye(2 * b, dtype=dtype)

    Ub_m = Ub_c * m[:, None]
    Uf_m = Uf_c * m[:, None]

    # ---- gain solve at [2B, 2B]; V columns distributed as before
    chol = cho_factor(S, lower=True)
    Vb = cho_solve(chol, Ub_m)                                # [2B, 22]
    Uf_m_mycols = jax.lax.dynamic_slice_in_dim(Uf_m, k * n3b, n3b, 1)
    Vf_l = cho_solve(chol, Uf_m_mycols)                       # [2B, 3Nb]
    Vf = jax.lax.all_gather(Vf_l, AXIS, axis=1, tiled=True)   # [2B, 3N]

    solve_ok = jnp.isfinite(Vb).all() & jnp.isfinite(Vf).all()
    Vb = jnp.where(solve_ok, Vb, 0.0)
    Vf = jnp.where(solve_ok, Vf, 0.0)
    Vf_l = jnp.where(solve_ok, Vf_l, 0.0)

    # ---- mean update
    z_c = measured_uv[idx_c].reshape(-1)                      # [2B]
    y = (z_c - feat_mu.reshape(-1)[uvg_c]) * m
    new_base = base_mu + Vb.T @ y
    new_feat = (feat_mu.reshape(-1) + Vf.T @ y)
    qn = jnp.linalg.norm(new_base[3:7])
    new_base = new_base.at[3:7].divide(qn)

    # ---- Joseph covariance on the compacted row set
    M_bb = bb - Vb.T @ Ub_m                                   # [22, 22]
    M_bf_l = bf_l - Vb.T @ Uf_m_mycols                        # [22, 3Nb]
    M_ff_l = ff_l - Vf_l.T @ Uf_m                             # [3Nb, 3N]

    # M_bf columns at the compacted uv positions span shards: gather the
    # full bf row block (22·3N — same order as the full path's 22·2N)
    M_bf = jax.lax.all_gather(M_bf_l, AXIS, axis=1, tiled=True)  # [22, 3N]
    Mbf_uv = M_bf[:, uvg_c]                                   # [22, 2B]

    Rb = meas_cov[idx_c] * meas_c[:, None, None].astype(dtype)  # [B, 2, 2]

    def rmul(X):  # (Rm @ X) for X [2B, c]
        return jnp.einsum("nij,njc->nic", Rb,
                          X.reshape(b, 2, -1)).reshape(2 * b, -1)

    new_bb = M_bb - Mbf_uv @ Vb + Vb.T @ rmul(Vb)
    new_bb = 0.5 * (new_bb + new_bb.T)
    new_bf_l = M_bf_l - Mbf_uv @ Vf_l + Vb.T @ rmul(Vf_l)
    new_ff_l = M_ff_l - M_ff_l[:, uvg_c] @ Vf + Vf_l.T @ rmul(Vf)
    new_ff_l = 0.5 * (new_ff_l + _transpose_ff(new_ff_l, ns))

    # cache ALL measured tracker results — incl. measured-but-over-budget
    # features, whose klt_ref would otherwise go stale (see the dense
    # compacted path in core/update.py)
    new_klt = jnp.where(meas[:, None], measured_uv, klt_ref)
    return (new_bb, new_bf_l, new_ff_l, new_base,
            new_feat.reshape(n, 3), new_klt)


def sharded_update(state: ShardedFilterState, cfg: VIOConfig,
                   measured_uv, meas_cov, passed,
                   mesh: Mesh, budget: int | None = None) -> ShardedFilterState:
    """Distributed analog of core.update.update_with_feature_positions.

    ``budget`` (static) compacts the measured subset before the gain
    solve, exactly like the dense path: the REPLICATED Cholesky — the
    serial term of the distributed update — shrinks from [2N, 2N] to
    [2·budget, 2·budget] (VERDICT r3 #6's sharded half)."""
    meas = passed & state.active
    rep = P()
    if budget is not None and budget < state.n_max:
        order = jnp.argsort(~meas, stable=True)
        idx_c = order[:budget]
        bb, bf, ff, base_mu, feat_mu, klt_ref = _shmap(
            partial(_update_shard_compact, cfg=cfg), mesh,
            in_specs=(rep, P(None, AXIS), P(AXIS, None),
                      rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, P(None, AXIS), P(AXIS, None), rep, rep, rep),
        )(state.bb, state.bf, state.ff, state.base_mu, state.feat_mu,
          state.klt_ref, measured_uv, meas_cov, meas, idx_c)
    else:
        bb, bf, ff, base_mu, feat_mu, klt_ref = _shmap(
            partial(_update_shard, cfg=cfg), mesh,
            in_specs=(rep, P(None, AXIS), P(AXIS, None),
                      rep, rep, rep, rep, rep, rep),
            out_specs=(rep, P(None, AXIS), P(AXIS, None), rep, rep, rep),
        )(state.bb, state.bf, state.ff, state.base_mu, state.feat_mu,
          state.klt_ref, measured_uv, meas_cov, meas)
    return state.replace(bb=bb, bf=bf, ff=ff, base_mu=base_mu,
                         feat_mu=feat_mu, klt_ref=klt_ref)


def sigma_slot_reset(state: ShardedFilterState, wipe3, diag3,
                     mesh: Mesh) -> ShardedFilterState:
    """Σ side of slot (re)allocation: wipe3 [3N] state rows/cols to clear,
    diag3 [3N] new diagonal values (also used by the IMU depth re-init,
    which wipes only ρ rows)."""
    bf, ff = _shmap(
        _slot_reset_shard, mesh,
        in_specs=(P(None, AXIS), P(AXIS, None), P(), P()),
        out_specs=(P(None, AXIS), P(AXIS, None)),
    )(state.bf, state.ff, wipe3, diag3.reshape(-1))
    return state.replace(bf=bf, ff=ff)


def sharded_add_features(state: ShardedFilterState, cfg: VIOConfig,
                         new_uv, valid, mesh: Mesh,
                         depths=None, depth_vars=None) -> ShardedFilterState:
    """Distributed analog of core.state.add_features (same slot plan,
    incl. the per-candidate triangulation-scaled depth-prior variances)."""
    from ekf_vio_tpu.core import state as state_mod

    # Reuse the dense path's slot-assignment plan on the replicated fields.
    n = state.n_max
    take, src = state_mod.plan_insertion(state.active, valid)

    if depths is None:
        rho = jnp.full((n, 1), 1.0 / cfg.default_point_depth,
                       state.feat_mu.dtype)
    else:
        rho = (1.0 / jnp.clip(depths[src], 1e-3, 1e3))[:, None]
    new_mu = jnp.concatenate([new_uv[src], rho], axis=-1)

    feat_mu = jnp.where(take[:, None], new_mu, state.feat_mu)
    klt_ref = jnp.where(take[:, None], new_uv[src], state.klt_ref)
    active = state.active | take
    age = jnp.where(take, 0, state.age)

    if depth_vars is None:
        dvar = jnp.full((n,), cfg.default_point_depth_variance,
                        state.bb.dtype)
    else:
        dvar = jnp.clip(depth_vars[src], 1e-8,
                        cfg.default_point_depth_variance)
    prior = jnp.where(
        take[:, None],
        jnp.stack([jnp.full((n,), cfg.default_point_homogenous_variance,
                            state.bb.dtype),
                   jnp.full((n,), cfg.default_point_homogenous_variance,
                            state.bb.dtype),
                   dvar], axis=-1),
        0.0)
    state = sigma_slot_reset(state, jnp.repeat(take, 3), prior, mesh)
    return state.replace(feat_mu=feat_mu, klt_ref=klt_ref, active=active,
                         age=age)


def sharded_drop_features(state: ShardedFilterState, drop,
                          mesh: Mesh) -> ShardedFilterState:
    drop = drop & state.active
    state = sigma_slot_reset(state, jnp.repeat(drop, 3),
                             jnp.zeros((3 * state.n_max,), state.bb.dtype),
                             mesh)
    return state.replace(active=state.active & ~drop)


def sharded_propagate_imu_batch(state: ShardedFilterState, cfg: VIOConfig,
                                batch, gravity_w, mesh: Mesh,
                                lin_base=None):
    """Distributed analog of imu.propagate_imu_batch_with_motion.

    The 29-dim mean/Jacobian accumulation scan is replicated (tiny); the
    [D, D] covariance algebra is shard_map'd.  Returns (state, qt).
    ``lin_base`` selects first-estimate-Jacobian linearization exactly as
    in the dense path (see imu.propagate_imu_batch_with_motion)."""
    from ekf_vio_tpu.core import imu as imu_mod

    dtype = state.bb.dtype
    base_mu, qt, qt_lin, J, Q29, total_dt = imu_mod.compound_interval(
        state.base_mu, cfg, batch, gravity_w, dtype, lin_base=lin_base)

    # Same FEJ coverage as the dense path: transport Jacobians at the
    # lin chain's compound motion, mean transport at the posterior's.
    Fb = J[:NB, :NB]
    new_feat = jax.vmap(imu_mod._compound_transport, in_axes=(0, None))(
        state.feat_mu, qt)
    _, Ff, W = dynamics.transport_jacobians(state.feat_mu, qt_lin)
    Ffb = jnp.einsum("nij,jb->nib", W, J[NB:, :NB])
    Ffb, Ff = dynamics.mask_feature_jacobians(Ffb, Ff, state.active)
    W = jnp.where(state.active[:, None, None], W, 0.0)

    q_feat = (jnp.where(state.active[:, None], cfg.q_feature, 0.0)
              * jnp.ones((state.n_max, 3), dtype) * total_dt).reshape(-1)

    rep = P()
    bb, bf, ff = _shmap(
        _imu_cov_shard, mesh,
        in_specs=(rep, P(None, AXIS), P(AXIS, None),
                  rep, rep, rep, rep, rep, rep),
        out_specs=(rep, P(None, AXIS), P(AXIS, None)),
    )(state.bb, state.bf, state.ff, Fb, Ffb, Ff, q_feat, Q29, W)

    feat_mu = jnp.where(state.active[:, None], new_feat, state.feat_mu)
    return state.replace(base_mu=base_mu, feat_mu=feat_mu, bb=bb, bf=bf,
                         ff=ff, t=state.t + total_dt), qt
