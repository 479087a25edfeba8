"""Marginalization / prior factors (VINS-style sliding-window machinery).

Re-designs `lego::Problem::marginalize` (src/lego/base/problem.cpp:617-781)
and the prior bookkeeping it feeds (`H_prior_`/`b_prior_`, applied at
problem.cpp:338-355 and first-order-updated at :447-454).  The reference
carries this machinery for VIO-style pipelines; the SLAM loop itself drops
information on window eviction (map.cpp:34-86).  Here the same math is a set
of pure batched functions so a marginalizing window becomes available to this
engine (e.g. keeping evicted keyframes' information as a prior).

All steps mirror the reference: Schur elimination of the marginalized block,
eigenvalue-thresholded pseudo-inverse (:746-749), and the square-root
re-linearization form J = S^1/2 V^T with err = -J^-T b (:760-772).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class PriorFactor(NamedTuple):
    """Linearized prior on the kept variables.

    H = J^T J and b are applied to the kept block of the next problem
    (problem.cpp:353-354); `sqrt_J` and `err` support the first-order prior
    update after state changes (:447-453)."""

    H: jnp.ndarray        # (n, n)
    b: jnp.ndarray        # (n,)
    sqrt_J: jnp.ndarray   # (n, n) J with H = J^T J
    err: jnp.ndarray      # (n,) linearized residual


def _psd_pinv(A: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Eigenvalue-thresholded pseudo-inverse of a symmetric matrix
    (problem.cpp:746-749)."""
    A = 0.5 * (A + A.T)
    w, V = jnp.linalg.eigh(A)
    w_inv = jnp.where(w > eps, 1.0 / jnp.where(w > eps, w, 1.0), 0.0)
    return (V * w_inv[None, :]) @ V.T


def marginalize(
    H: jnp.ndarray,
    b: jnp.ndarray,
    marg_mask: jnp.ndarray,
    m: int,
    eps: float = 1e-8,
) -> PriorFactor:
    """Marginalize `m` coordinates (marked by `marg_mask`) out of (H, b).

    Args:
      H: (n, n) information matrix of the current linearization.
      b: (n,) information vector.
      marg_mask: (n,) bool, True for coordinates to marginalize; exactly `m`
        True entries (m is static — e.g. 6 for one keyframe pose).
      m: static count of marginalized coordinates.

    Returns a PriorFactor over ALL n coordinates, with zero rows/cols at the
    marginalized ones — the caller gathers/pads it onto the next problem's
    ordering (the reference instead physically shuffles blocks,
    problem.cpp:716-738; a permutation works the same under jit).
    """
    n = H.shape[0]
    # Stable permutation: kept coordinates first, marginalized last.
    perm = jnp.argsort(marg_mask, stable=True)
    Hp = H[perm][:, perm]
    bp = b[perm]
    k = n - m
    Arr = Hp[:k, :k]
    Arm = Hp[:k, k:]
    Amm = Hp[k:, k:]
    brr = bp[:k]
    bmm = bp[k:]

    Amm_inv = _psd_pinv(Amm, eps)
    tempB = Arm @ Amm_inv
    H_keep = Arr - tempB @ Arm.T
    b_keep = brr - tempB @ bmm

    # Square-root form (problem.cpp:760-772).
    H_keep = 0.5 * (H_keep + H_keep.T)
    w, V = jnp.linalg.eigh(H_keep)
    keep_w = w > eps
    S = jnp.where(keep_w, w, 0.0)
    S_inv = jnp.where(keep_w, 1.0 / jnp.where(keep_w, w, 1.0), 0.0)
    sqrt_J = jnp.sqrt(S)[:, None] * V.T
    Jt_inv = jnp.sqrt(S_inv)[:, None] * V.T
    err = -(Jt_inv @ b_keep)
    H_clean = sqrt_J.T @ sqrt_J
    H_clean = jnp.where(jnp.abs(H_clean) > 1e-9, H_clean, 0.0)  # problem.cpp:771

    # Un-permute back to the original coordinate order, zero-padded at the
    # marginalized coordinates.
    inv_perm = jnp.argsort(perm)
    pad = lambda M: jnp.pad(M, ((0, m), (0, m)))
    H_out = pad(H_clean)[inv_perm][:, inv_perm]
    sqrt_out = pad(sqrt_J)[inv_perm][:, inv_perm]
    b_out = jnp.pad(b_keep, (0, m))[inv_perm]
    err_out = jnp.pad(err, (0, m))[inv_perm]
    return PriorFactor(H=H_out, b=b_out, sqrt_J=sqrt_out, err=err_out)


def apply_prior(
    H: jnp.ndarray, b: jnp.ndarray, prior: PriorFactor, fixed_mask: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Add a prior factor to a new problem's (H, b) (problem.cpp:338-355),
    zeroing prior rows/cols of fixed coordinates as the reference does."""
    Hp, bp = prior.H, prior.b
    if fixed_mask is not None:
        keep = ~fixed_mask
        Hp = Hp * keep[:, None] * keep[None, :]
        bp = bp * keep
    return H + Hp, b + bp


def update_prior_b(prior: PriorFactor, dx: jnp.ndarray) -> PriorFactor:
    """First-order prior update after a state change of dx
    (problem.cpp:447-453): b <- b - H dx, err re-derived."""
    b_new = prior.b - prior.H @ dx
    return prior._replace(b=b_new)
