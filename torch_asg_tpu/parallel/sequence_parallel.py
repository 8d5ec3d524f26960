"""Sequence-parallel (long-context) ASG: the time axis sharded over chips.

The reference walks T serially on one device (zh217/torch-asg
``fully_connected_lattice.cpp:22``, ``force_aligned_lattice.cpp:106``) and
has no concept of sharding it.  The log semiring is associative
(``doc/tech_report.tex:35``, and the matrix-product view at ``:164-168``),
so the recursion over T decomposes exactly:

  alpha_t = A_t (x) alpha_{t-1},     A_t[i, j] = I_t[i] + T[i, j]

and a contiguous time chunk composes into a single transfer matrix
``M_p = A_last (x) ... (x) A_first``.  Each chip:

  1. builds its chunk's transfer matrix with a local scan that carries an
     (N, N) log-semiring matrix (an N-fold basis-vector recursion — the
     known compute overhead of context parallelism: xN work for xP
     parallelism, worthwhile when T alone exceeds one chip's memory or
     latency budget);
  2. all-gathers the (P, B, N, N) chunk matrices over ICI — the ONLY
     communication, O(P B N^2), independent of T;
  3. replicately folds the prefix product into the final alpha boundary
     and reads the score off it.

Ragged lengths use a *frozen-identity* convention instead of -inf
masking: an invalid frame's step matrix is the semiring identity, so
alpha freezes at its ``t = L_in[b]-1`` value and the final boundary IS
``alpha_{L-1}`` for every batch element — no per-chip re-seeding, no
host-side lengths.  The force-aligned lattice gets the same treatment
with (S, S) transfer matrices over its 2-edge band.

Chunk 0 is special (alpha_0 = I_0 is not expressible as A (x) v), so
chip 0 contributes a plain vector scan; everyone else contributes a
matrix.

Gradients flow through ``jax.grad`` (the program is pure jnp inside
shard_map; the all_gather transposes to a psum-scatter automatically):
d loss / d inputs comes back sharded exactly like the inputs, and
d loss / d transition is psum-combined.  Residual memory per chip is
O((T/P) B N^2) — the scan carries — which is the point: T/P, not T.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..asg import _prep, _reduce
from ..ops.fac import make_aligned
from ..ops.semiring import NEG_INF

# ---------------------------------------------------------------------------
# grad-safe log-semiring reductions (autodiff flows through this module)
# ---------------------------------------------------------------------------


def _lse(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """logsumexp whose VJP is NaN-free on all-(-inf) slices.

    ops.semiring.logsumexp is primal-only by contract (the custom_vjp
    paths never differentiate it); here autodiff runs through the whole
    forward, so 0/0 softmax cotangents must be cut with the double-where.
    """
    m = lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis)
    s_safe = jnp.where(s == 0.0, 1.0, s)
    m_sq = jnp.squeeze(m, axis=axis)
    return jnp.where(jnp.isfinite(m_sq), jnp.log(s_safe) + jnp.squeeze(m_safe, axis), m_sq)


def _logaddexp(a, b):
    return _lse(jnp.stack([a, b], axis=0), axis=0)


def _log_eye(n: int, dtype) -> jnp.ndarray:
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, NEG_INF).astype(dtype)


def _shift_s(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Shift +1 along ``axis`` (slot s holds old slot s-1), fill -inf."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, -1)
    return jnp.pad(x[tuple(sl)], pad, constant_values=NEG_INF)


# ---------------------------------------------------------------------------
# local chunk programs (run inside shard_map)
# ---------------------------------------------------------------------------


def _fcc_chunk(transition, inputs_c, valid_c):
    """(transfer matrix M (B,N,N), chunk-0-style vector v (B,N)).

    M composes the chunk's valid steps (invalid frames are the semiring
    identity).  v is the plain alpha vector scan assuming this chunk
    starts the sequence (only meaningful on chip 0).
    """
    c_len, num_batches, num_labels = inputs_c.shape

    def mstep(f, xs):
        i_t, val = xs
        # A_t (x) F: out[b,i,j] = I_t[i] + lse_k(T[i,k] + F[b,k,j])
        comp = i_t[:, :, None] + _lse(
            transition[None, :, :, None] + f[:, None, :, :], axis=2
        )
        return jnp.where(val[:, None, None], comp, f), None

    f0 = jnp.broadcast_to(
        _log_eye(num_labels, inputs_c.dtype), (num_batches, num_labels, num_labels)
    )
    # checkpoint the body: reverse-mode then stores only the (B, N, N)
    # carry per step — the documented O((T/P) B N^2) — instead of the
    # body's (B, N, N, N) exp/softmax internals (an N-fold blowup that
    # would defeat the whole T/P memory argument)
    m_chunk, _ = lax.scan(jax.checkpoint(mstep), f0, (inputs_c, valid_c))

    def vstep(a, xs):
        i_t, val = xs
        a_new = i_t + _lse(transition[None] + a[:, None, :], axis=2)
        return jnp.where(val[:, None], a_new, a), None

    a0 = jnp.where(valid_c[0][:, None], inputs_c[0], NEG_INF)
    v_chunk, _ = lax.scan(jax.checkpoint(vstep), a0, (inputs_c[1:], valid_c[1:]))
    return m_chunk, v_chunk


def _fac_chunk(aligned_c, self_t, next_t, valid_c):
    """FAC twin of _fcc_chunk over the (S, S) aligned-state space."""
    c_len, num_batches, s_total = aligned_c.shape

    def mstep(g, xs):
        ai_t, val = xs
        hori = g + self_t[:, :, None]
        diag = _shift_s(g + next_t[:, :, None], axis=1)
        comp = ai_t[:, :, None] + _logaddexp(hori, diag)
        return jnp.where(val[:, None, None], comp, g), None

    g0 = jnp.broadcast_to(
        _log_eye(s_total, aligned_c.dtype), (num_batches, s_total, s_total)
    )
    m_chunk, _ = lax.scan(jax.checkpoint(mstep), g0, (aligned_c, valid_c))

    def vstep(a, xs):
        ai_t, val = xs
        a_new = ai_t + _logaddexp(a + self_t, _shift_s(a + next_t, axis=1))
        return jnp.where(val[:, None], a_new, a), None

    col = jnp.arange(s_total)[None, :]
    a0 = jnp.where((col == 0) & valid_c[0][:, None], aligned_c[0], NEG_INF)
    v_chunk, _ = lax.scan(jax.checkpoint(vstep), a0, (aligned_c[1:], valid_c[1:]))
    return m_chunk, v_chunk


def _fold_boundaries(ms, vs):
    """alpha boundary after the last chunk: M_{P-1} (x) ... (x) M_1 (x) v_0.

    ms: (P, B, N, N) gathered chunk matrices; vs: (P, B, N) gathered
    chunk-0-style vectors (only vs[0] is meaningful).  Replicated math,
    P-1 tiny matvecs.
    """

    def step(v, m):
        return _lse(m + v[:, None, :], axis=2), None

    v_final, _ = lax.scan(step, vs[0], ms[1:])
    return v_final


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def asg_loss_seq(
    mesh: Mesh,
    transition: jnp.ndarray,
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    *,
    axis: str = "seq",
    reduction: str = "mean",
) -> jnp.ndarray:
    """ASG loss with the TIME axis sharded over ``mesh[axis]``.

    For utterances too long for one chip (memory or wall-clock): each chip
    holds T/P frames; communication is one all_gather of (P, B, N^2 + S^2)
    boundary transfer matrices, independent of T.  Differentiable via
    jax.grad; emission gradients come back time-sharded.
    """
    # same front-end normalization as asg_loss: bf16/f16 upcast (the
    # T-step recursion is too long for half-precision mantissas; a mixed
    # bf16/f32 pair would also crash the scan carry), default lengths,
    # and the reference's S > T target clamp
    inputs, targets, input_lengths, target_lengths = _prep(
        inputs, targets, input_lengths, target_lengths
    )
    transition = transition.astype(
        jnp.promote_types(inputs.dtype, transition.dtype)
    )
    inputs = inputs.astype(transition.dtype)
    t_total, num_batches, num_labels = inputs.shape
    p_chips = mesh.shape[axis]
    if t_total % p_chips != 0:
        raise ValueError(
            f"T {t_total} not divisible by mesh axis {axis!r} = {p_chips}"
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def _local(trans, inputs_c, tgt, li, lo):
        c_len = inputs_c.shape[0]
        p = lax.axis_index(axis)
        t0 = p * c_len
        t_idx = t0 + jnp.arange(c_len, dtype=li.dtype)
        valid_c = t_idx[:, None] < li[None, :]  # (C, B)

        # FCC chunk contribution
        m_fcc, v_fcc = _fcc_chunk(trans, inputs_c, valid_c)

        # FAC chunk contribution: the aligned gather is per-frame local.
        # make_aligned masks by ABSOLUTE time indices, so feed it the
        # local chunk with lengths clamped into the chunk's range.
        li_local = jnp.clip(li - t0, 0, c_len)
        lat = make_aligned(trans, inputs_c, tgt, li_local, lo)
        m_fac, v_fac = _fac_chunk(
            lat.inputs, lat.self_trans, lat.next_trans, valid_c
        )

        ms_fcc = lax.all_gather(m_fcc, axis)  # (P, B, N, N)
        vs_fcc = lax.all_gather(v_fcc, axis)
        ms_fac = lax.all_gather(m_fac, axis)
        vs_fac = lax.all_gather(v_fac, axis)

        alpha_end = _fold_boundaries(ms_fcc, vs_fcc)  # (B, N) = alpha_{L-1}
        full = _lse(alpha_end, axis=1)
        alpha_fac_end = _fold_boundaries(ms_fac, vs_fac)  # (B, S)
        aligned = jnp.take_along_axis(
            alpha_fac_end, (lo - 1)[:, None].astype(jnp.int32), axis=1
        )[:, 0]
        return full - aligned

    per_batch = _local(transition, inputs, targets, input_lengths, target_lengths)
    return _reduce(per_batch, reduction)
