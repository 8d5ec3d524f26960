"""Vocabulary-sharded ASG for large label sets (e.g. 10k wordpieces).

The (N, N) transition matrix is sharded by ROWS across the mesh's model
axis; emissions are sharded along their label dim.  Per chip, the FCC
recursions keep only an N/P-slice of alpha/beta and exchange boundary
state over ICI each step:

  * alpha step:  all_gather the (B, N/P) alpha shard -> contract local
    transition rows over the full j axis.
  * beta step:   contract the LOCAL j shard of (I+beta) against the same
    row shard (rows are j there), then combine partial logsumexps across
    chips with pmax + psum.
  * grad(T) rows never leave their chip; grad(inputs) is local; the
    posterior normalizer uses the identity sum_i exp(gamma[t,b,i]) =
    exp(score_b), so the backward needs no extra collectives beyond the
    per-step alpha all_gather it recomputes.

The force-aligned lattice is only (B, S) — label-count independent — so it
runs replicated on every chip after a psum-gather of the per-target
transition entries; its scatters write each chip's local row/label shards.

The reference has nothing comparable (single device, N<=~50); this is the
BASELINE.json config-5 capability.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.fac import (
    AlignedLattice,
    _alpha_scan as _fac_alpha_scan,
    _beta_scan as _fac_beta_scan,
    _score as _fac_score_readout,
    aligned_domain_grads,
)
from ..asg import _prep, _reduce
from ..ops.semiring import (
    NEG_INF,
    chain_precision,
    logsumexp,
    strict_chain_precision,
)
from ..utils.lengths import label_mask, mask_emissions, time_mask

# ---------------------------------------------------------------------------
# collective helpers (used inside shard_map)
# ---------------------------------------------------------------------------


def _lse_over_chips(partial_vals: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Elementwise logsumexp across the mesh axis; -inf safe; replicated out."""
    m = lax.pmax(partial_vals, axis)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = lax.psum(jnp.exp(partial_vals - m_safe), axis)
    return jnp.where(jnp.isfinite(m), jnp.log(s) + m_safe, m)


def _local_slice(full: jnp.ndarray, axis: str, shard_size: int, dim: int) -> jnp.ndarray:
    """Slice this chip's shard out of a replicated array."""
    p = lax.axis_index(axis)
    return lax.dynamic_slice_in_dim(full, p * shard_size, shard_size, axis=dim)


def _gather_transition_entries(
    trans_rows: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray, axis: str
) -> jnp.ndarray:
    """T[rows, cols] from a row-sharded transition; replicated result.

    Deliberately an indexed gather: this is O(B*S) elements ONCE per call
    (not inside the time scan), and the one-hot matmul alternative needs a
    full (B, S, N) one-hot — gigabytes at the wordpiece-scale N this
    module exists for (same policy as ops.fac's large-N branch)."""
    n_local = trans_rows.shape[0]
    p = lax.axis_index(axis)
    local_rows = rows - p * n_local
    ok = (local_rows >= 0) & (local_rows < n_local)
    vals = trans_rows[jnp.clip(local_rows, 0, n_local - 1), cols]
    return lax.psum(jnp.where(ok, vals, 0.0), axis)


# ---------------------------------------------------------------------------
# FCC, vocabulary-sharded (runs inside shard_map)
# ---------------------------------------------------------------------------


def _exp_rows_mat(trans_rows, dtype):
    """exp(T_rows - c) with a per-chip finite c (self-consistently repaid)."""
    c = jnp.max(trans_rows)
    c = jnp.where(jnp.isfinite(c), c, 0.0).astype(dtype)
    return jnp.exp(trans_rows.astype(dtype) - c), c


def _lse_rows(x, e_mat, c):
    """lse over the CONTRACTED axis of a max-normalized exp matmul.

    x: (B, K); e_mat: (K, M) = exp(rows - c).  Returns (B, M).  The
    matmul form keeps the per-step working set O(B(K+M) + KM) instead of
    materializing (B, K, M) — essential at wordpiece-scale N (the same
    identity as ops.fcc.fcc_score_matmul, applied per row shard).
    """
    m = jnp.max(x, axis=1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.dot(
        jnp.exp(x - m_safe), e_mat,
        preferred_element_type=x.dtype, precision=chain_precision(),
    )
    return jnp.log(s) + m_safe + c


def _alpha_scan_vp(trans_rows, inputs_m, axis):
    """alpha shards (T, B, N/P); per-step all_gather of the alpha carry."""
    e_rows, c = _exp_rows_mat(trans_rows, inputs_m.dtype)
    e_rows_t = e_rows.T  # (N, Np): contract the gathered source labels

    def step(a_shard, i_t):
        a_full = lax.all_gather(a_shard, axis, axis=1, tiled=True)  # (B, N)
        a = i_t + _lse_rows(a_full, e_rows_t, c)
        return a, a

    a0 = inputs_m[0]
    _, rest = lax.scan(step, a0, inputs_m[1:])
    return jnp.concatenate([a0[None], rest], axis=0)


def _beta_scan_vp(trans_rows, inputs_m, input_lengths, axis):
    """beta shards (T, B, N/P); per-step cross-chip partial-lse combine."""
    t_total, num_batches, n_local = inputs_m.shape
    e_rows, c = _exp_rows_mat(trans_rows, inputs_m.dtype)

    b_last = jnp.where(
        (input_lengths == t_total)[:, None],
        jnp.zeros((num_batches, n_local), inputs_m.dtype),
        NEG_INF,
    )

    def step(b_shard, xs):
        t, i_next = xs
        x = i_next + b_shard  # (B, Np) local j
        # partial over local source labels j for ALL destinations i:
        part = _lse_rows(x, e_rows, c)  # (B, N)
        b_full = _lse_over_chips(part, axis)  # (B, N) replicated
        raw = _local_slice(b_full, axis, n_local, dim=1)
        b_t = jnp.where((input_lengths - 1 == t)[:, None], jnp.zeros_like(raw), raw)
        return b_t, b_t

    ts = jnp.arange(t_total - 2, -1, -1)
    _, rest = lax.scan(step, b_last, (ts, inputs_m[1:][::-1]))
    return jnp.concatenate([rest[::-1], b_last[None]], axis=0)


def _fcc_fwd_vp(trans_rows, inputs_m, input_lengths, axis):
    alpha = _alpha_scan_vp(trans_rows, inputs_m, axis)
    beta = _beta_scan_vp(trans_rows, inputs_m, input_lengths, axis)
    part = logsumexp(beta[0] + inputs_m[0], axis=1)  # local i
    score = _lse_over_chips(part, axis)  # (B,) replicated
    return score, alpha, beta


# Time-chunk size for the backward's alpha gather+contract: bounds the
# gathered working set to (chunk, B, N) — ~80 MB at the wordpiece target
# shape — instead of un-sharding the whole (T-1, B, N) alpha at once.
_DT_CHUNK_T = 32


def _fcc_bwd_vp(trans_rows, inputs_m, alpha, beta, score, g, axis):
    # posterior via the forward-backward identity: sum_i exp(gamma) =
    # exp(score).  score = -inf (degenerate element: no valid path) means
    # every gamma is -inf too; zeroing the offset keeps gamma - 0 = -inf
    # -> exp = 0 instead of the -inf - -inf = NaN that would otherwise
    # contaminate the shared dT for the whole batch.
    gamma = alpha + beta
    score_safe = jnp.where(jnp.isfinite(score), score, 0.0)
    grad_inputs = (
        jnp.exp(gamma - score_safe[None, :, None]) * g[None, :, None]
    )

    # dT_rows[i,j] = e_rows[i,j] * sum_{t,b} U[t,b,i] V[t,b,j] with
    # V = exp(a_prev - m), U = gi * exp(I - a_cur + m + c).
    # FACTOR FORM (mirrors ops.fcc._fcc_mm_bwd): U (local rows) and V
    # (full columns) are built vectorized and contracted in big matmuls.
    # The row max m needs no gather (pmax of local maxes); the alpha
    # gather+contract runs in time chunks of _DT_CHUNK_T so per-chip
    # memory stays bounded — still ~T/32 large ICI transfers instead of
    # T-1 latency-bound per-step ones.
    e_rows, c = _exp_rows_mat(trans_rows, inputs_m.dtype)
    n_local = trans_rows.shape[0]
    num_labels = trans_rows.shape[1]

    m = lax.pmax(jnp.max(alpha[:-1], axis=2, keepdims=True), axis)  # (T-1, B, 1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sub = jnp.where(jnp.isfinite(alpha[1:]), inputs_m[1:] - alpha[1:], NEG_INF)
    # Clamped like ops.fcc._fcc_mm_bwd: the exponent is bounded by the
    # transition row spread, not by 0, so a >60-nat spread would
    # overflow to inf and NaN the dT matmul without the clamp.
    u = grad_inputs[1:] * jnp.exp(jnp.minimum(sub + m_safe + c, 60.0))

    t1, num_batches = u.shape[0], u.shape[1]
    kt = min(_DT_CHUNK_T, t1) if t1 else 1
    pad = (-t1) % kt
    nc = (t1 + pad) // kt
    a_sh = jnp.pad(
        alpha[:-1], ((0, pad), (0, 0), (0, 0)), constant_values=NEG_INF
    ).reshape(nc, kt, num_batches, n_local)
    u_ch = jnp.pad(u, ((0, pad), (0, 0), (0, 0))).reshape(
        nc, kt, num_batches, n_local
    )
    ms_ch = jnp.pad(m_safe, ((0, pad), (0, 0), (0, 0))).reshape(
        nc, kt, num_batches, 1
    )

    def chunk(acc, xs):
        a_c, u_c, ms = xs
        a_full = lax.all_gather(a_c, axis, axis=2, tiled=True)  # (kt, B, N)
        v = jnp.exp(a_full - ms)  # padded rows are exp(-inf) = 0
        tb = kt * num_batches
        acc = acc + jax.lax.dot_general(
            u_c.reshape(tb, n_local), v.reshape(tb, num_labels),
            (((0,), (0,)), ((), ())),
            preferred_element_type=u_c.dtype,
            precision=chain_precision(),
        )
        return acc, None

    acc0 = jnp.zeros((n_local, num_labels), u.dtype)
    acc, _ = lax.scan(chunk, acc0, (a_sh, u_ch, ms_ch))
    return (acc * e_rows).astype(trans_rows.dtype), grad_inputs


# ---------------------------------------------------------------------------
# FAC, vocabulary-sharded (lattice replicated; gathers/scatters sharded)
# ---------------------------------------------------------------------------


def _local_onehot(tgt, n_local, axis, dtype):
    """(B, S, Np) one-hot of this chip's OWNED target slots (zero rows for
    targets owned by other chips).  Shared by the forward emission gather
    and the backward scatters so the ownership arithmetic cannot drift."""
    p = lax.axis_index(axis)
    local_tgt = tgt - p * n_local
    in_shard = (local_tgt >= 0) & (local_tgt < n_local)  # (B, S)
    onehot = jax.nn.one_hot(
        jnp.clip(local_tgt, 0, n_local - 1), n_local, dtype=dtype
    ) * in_shard[:, :, None].astype(dtype)
    return onehot


def _fac_gather_vp(trans_rows, inputs_shard, targets, input_lengths, target_lengths, axis):
    t_total, num_batches, n_local = inputs_shard.shape
    s_total = targets.shape[1]
    num_labels = trans_rows.shape[1]
    tgt = jnp.clip(targets, 0, num_labels - 1)

    # aligned emissions from the label-sharded inputs: local one-hot
    # matmul (indexed gathers serialize on TPU) + psum.  -inf emissions
    # use the same sentinel trick as ops.fac.gather_aligned_emissions:
    # the sentinel survives the psum unchanged because non-owner chips
    # contribute exact zeros.
    local_onehot = _local_onehot(tgt, n_local, axis, inputs_shard.dtype)
    sentinel = jnp.asarray(-1e30, inputs_shard.dtype)
    safe_inputs = jnp.where(jnp.isfinite(inputs_shard), inputs_shard, sentinel)
    aligned = lax.psum(
        jnp.einsum(
            "tbi,bsi->tbs", safe_inputs, local_onehot,
            precision=jax.lax.Precision.HIGHEST,
        ),
        axis,
    )
    tmask = time_mask(t_total, input_lengths)
    smask = label_mask(s_total, target_lengths)
    valid = tmask[:, :, None] & smask[None] & (aligned > 0.5 * sentinel)
    aligned = jnp.where(valid, aligned, NEG_INF)

    self_trans = _gather_transition_entries(trans_rows, tgt, tgt, axis)
    self_trans = jnp.where(smask, self_trans, 0.0)
    next_pairs = _gather_transition_entries(
        trans_rows, tgt[:, 1:], tgt[:, :-1], axis
    )
    next_trans = jnp.concatenate(
        [next_pairs, jnp.zeros((num_batches, 1), next_pairs.dtype)], axis=1
    )
    smask_next = (
        jnp.arange(s_total, dtype=target_lengths.dtype)[None, :]
        < (target_lengths - 1)[:, None]
    )
    next_trans = jnp.where(smask_next, next_trans, 0.0)
    return AlignedLattice(aligned, self_trans, next_trans, tgt)


def _scatter_trans_rows(trans_rows_shape, targets, ok_rows, cols, vals, axis):
    """Scatter-add vals at (rows=targets local, cols) into a row shard."""
    n_local, num_labels = trans_rows_shape
    p = lax.axis_index(axis)
    local_rows = targets - p * n_local
    in_shard = (local_rows >= 0) & (local_rows < n_local) & ok_rows
    r = jnp.clip(local_rows, 0, n_local - 1)
    out = jnp.zeros(trans_rows_shape, vals.dtype)
    return out.at[r, cols].add(jnp.where(in_shard, vals, 0.0))


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

# LRU-bounded: keys hold live Mesh objects, so an unbounded cache would
# leak compiled closures in a long-lived process that cycles meshes.
@functools.lru_cache(maxsize=8)
def _get_asg_vp(mesh: Mesh, axis: str):
    """Build (and cache) the vocabulary-sharded ASG loss for (mesh, axis).

    custom_vjp sits OUTSIDE shard_map: primal/fwd/bwd are each their own
    shard_map over local functions, with residuals crossing the boundary
    as explicitly sharded global arrays.  This keeps the cotangent flow
    fully under our control (the transpose of a replicated shard_map
    output would otherwise split g across devices).
    """
    spec_t = P(axis, None)  # transition rows
    spec_i = P(None, None, axis)  # (T, B, N) label-sharded
    rep = P()

    def smap(fn, in_specs, out_specs):
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    def primal_local(trans_rows, inputs_shard, targets, li, lo):
        inputs_m = mask_emissions(inputs_shard, li)
        beta = _beta_scan_vp(trans_rows, inputs_m, li, axis)
        part = logsumexp(beta[0] + inputs_m[0], axis=1)
        full = _lse_over_chips(part, axis)
        lat = _fac_gather_vp(trans_rows, inputs_shard, targets, li, lo, axis)
        beta_a = _fac_beta_scan(lat, li, lo)
        aligned = _fac_score_readout(beta_a[0], lat.inputs[0])
        return full - aligned

    def fwd_local(trans_rows, inputs_shard, targets, li, lo):
        inputs_m = mask_emissions(inputs_shard, li)
        full, alpha, beta = _fcc_fwd_vp(trans_rows, inputs_m, li, axis)
        lat = _fac_gather_vp(trans_rows, inputs_shard, targets, li, lo, axis)
        alpha_a = _fac_alpha_scan(lat)
        beta_a = _fac_beta_scan(lat, li, lo)
        aligned = _fac_score_readout(beta_a[0], lat.inputs[0])
        return (
            full - aligned, full, alpha, beta,
            lat.inputs, lat.self_trans, lat.next_trans, lat.targets,
            alpha_a, beta_a,
        )

    def bwd_local(
        trans_rows, inputs_shard, li,
        full, alpha, beta, ali, self_t, next_t, tgt, alpha_a, beta_a, g,
    ):
        n_local = trans_rows.shape[0]
        inputs_m = mask_emissions(inputs_shard, li)

        # denominator part (+g)
        gt_rows, gi = _fcc_bwd_vp(trans_rows, inputs_m, alpha, beta, full, g, axis)

        # numerator part (-g): the replicated aligned-domain math is the
        # single-chip formula, verbatim (ops.fac.aligned_domain_grads)
        lat = AlignedLattice(ali, self_t, next_t, tgt)
        g_aligned, g_self, g_next = aligned_domain_grads(
            lat, alpha_a, beta_a, -g
        )

        # numerator emission grads into the local label shard: transposed
        # one-hot matmul (a (T,B,S) scatter would serialize on TPU)
        local_onehot = _local_onehot(tgt, n_local, axis, gi.dtype)
        gi = gi + jnp.einsum(
            "tbs,bsi->tbi", g_aligned, local_onehot,
            precision=jax.lax.Precision.HIGHEST,
        )

        # scatter numerator transition grads into the local row shard
        ones = jnp.ones(tgt.shape, bool)
        gt_rows = gt_rows + _scatter_trans_rows(
            trans_rows.shape, tgt, ones, tgt, g_self, axis
        )
        gt_rows = gt_rows + _scatter_trans_rows(
            trans_rows.shape, tgt[:, 1:], ones[:, 1:], tgt[:, :-1],
            g_next[:, :-1], axis,
        )
        return gt_rows, gi

    # precision is a static leading argument captured by the caller at
    # forward-trace time (see ops/fcc.py:fcc_score_matmul): the bwd rule
    # is traced after any strict_chain_precision context has exited, so
    # the ambient read inside bwd_local would otherwise see DEFAULT
    @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
    def asg_vp(precision, transition, inputs, targets, input_lengths,
               target_lengths):
        with strict_chain_precision(precision):
            return smap(
                primal_local, (spec_t, spec_i, rep, rep, rep), rep
            )(transition, inputs, targets, input_lengths, target_lengths)

    def fwd(precision, transition, inputs, targets, input_lengths,
            target_lengths):
        with strict_chain_precision(precision):
            outs = smap(
                fwd_local,
                (spec_t, spec_i, rep, rep, rep),
                (rep, rep, spec_i, spec_i, rep, rep, rep, rep, rep, rep),
            )(transition, inputs, targets, input_lengths, target_lengths)
        loss, full, alpha, beta, ali, self_t, next_t, tgt, alpha_a, beta_a = outs
        res = (
            transition, inputs, input_lengths,
            full, alpha, beta, ali, self_t, next_t, tgt, alpha_a, beta_a,
        )
        return loss, res

    def bwd(precision, res, g):
        (transition, inputs, input_lengths,
         full, alpha, beta, ali, self_t, next_t, tgt, alpha_a, beta_a) = res
        with strict_chain_precision(precision):
            gt, gi = smap(
                bwd_local,
                (spec_t, spec_i, rep,
                 rep, spec_i, spec_i, rep, rep, rep, rep, rep, rep, rep),
                (spec_t, spec_i),
            )(
                transition, inputs, input_lengths,
                full, alpha, beta, ali, self_t, next_t, tgt, alpha_a,
                beta_a, g,
            )
        return gt, gi, None, None, None

    asg_vp.defvjp(fwd, bwd)
    return asg_vp


def asg_loss_vp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "model",
    reduction: str = "mean",
    precision=None,
) -> jnp.ndarray:
    """ASG loss with the vocabulary sharded over ``mesh[axis]``.

    transition rows and the emission label dim live sharded; per-batch
    results are bitwise identical on every chip.  ``precision`` mirrors
    ``asg_loss``: captured at forward-trace time and baked into the
    custom_vjp so the backward chain matmuls honor it too.
    """
    t_total, num_batches, num_labels = inputs.shape
    inputs, targets, input_lengths, target_lengths = _prep(
        inputs, targets, input_lengths, target_lengths
    )
    transition = transition.astype(
        jnp.promote_types(inputs.dtype, transition.dtype)
    )
    inputs = inputs.astype(transition.dtype)
    if num_labels % mesh.shape[axis] != 0:
        raise ValueError(
            f"num_labels {num_labels} not divisible by mesh axis "
            f"{axis!r} = {mesh.shape[axis]}"
        )
    fn = _get_asg_vp(mesh, axis)
    per_batch = fn(
        chain_precision() if precision is None else precision,
        transition, inputs, targets, input_lengths, target_lengths,
    )
    return _reduce(per_batch, reduction)


def fcc_score_vp(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "model",
) -> jnp.ndarray:
    """Vocabulary-sharded denominator scores (forward only), shape (B,)."""
    t_total, num_batches, num_labels = inputs.shape
    if inputs.dtype in (jnp.bfloat16, jnp.float16):
        inputs = inputs.astype(jnp.float32)
    transition = transition.astype(
        jnp.promote_types(inputs.dtype, transition.dtype)
    )
    inputs = inputs.astype(transition.dtype)
    if num_labels % mesh.shape[axis] != 0:
        raise ValueError(
            f"num_labels {num_labels} not divisible by mesh axis "
            f"{axis!r} = {mesh.shape[axis]}"
        )
    if input_lengths is None:
        input_lengths = jnp.full((num_batches,), t_total, dtype=jnp.int32)

    def score_fn(trans_rows, inputs_shard, lengths):
        inputs_m = mask_emissions(inputs_shard, lengths)
        beta = _beta_scan_vp(trans_rows, inputs_m, lengths, axis)
        part = logsumexp(beta[0] + inputs_m[0], axis=1)
        return _lse_over_chips(part, axis)

    return jax.shard_map(
        score_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )(transition, inputs, input_lengths)
