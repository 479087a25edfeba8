"""Robust cost kernels, vectorized over edge batches.

Re-designs `lego::CostFunction` and its Trivial/Huber/Cauchy/Tukey
implementations (src/lego/base/cost_function.{h,cpp}) plus the robust-edge
weighting of `BaseEdge` (src/lego/base/base_edge.cpp:31-64).  Each kernel maps
the plain chi-square ``e2 = r^T Λ r`` of a batch of edges to
``(rho, rho', rho'')``; `robust_information` forms the Gauss-Newton weight
matrix ``ρ' Λ + 2 ρ'' (Λ r)(Λ r)^T`` with the reference's positive-definite
guard.

Kernels are selected by a *static* string so the jitted solver specializes on
the choice (no data-dependent dispatch on device).
"""

from __future__ import annotations

import jax.numpy as jnp

TRIVIAL = "trivial"
HUBER = "huber"
CAUCHY = "cauchy"
TUKEY = "tukey"


def rho(kind: str, e2: jnp.ndarray, delta: float):
    """Return (rho0, rho1, rho2) arrays for chi2 batch `e2`.

    `delta` follows the reference's convention: the comparison is against
    ``delta^2`` (backend passes chi2_th = 5.991 directly as delta,
    backend_lego.cpp:92-94).
    """
    e2 = jnp.asarray(e2)
    dt = e2.dtype
    d = jnp.asarray(delta, dt)
    d2 = d * d
    if kind == TRIVIAL:
        one = jnp.ones_like(e2)
        return e2, one, jnp.zeros_like(e2)
    if kind == HUBER:
        # cost_function.cpp:5-17
        sqrte = jnp.sqrt(jnp.maximum(e2, 1e-20))
        inlier = e2 <= d2
        rho0 = jnp.where(inlier, e2, 2.0 * sqrte * d - d2)
        rho1 = jnp.where(inlier, jnp.ones_like(e2), d / sqrte)
        rho2 = jnp.where(inlier, jnp.zeros_like(e2), -0.5 * (d / sqrte) / jnp.maximum(e2, 1e-20))
        return rho0, rho1, rho2
    if kind == CAUCHY:
        # cost_function.cpp:19-26
        aux = e2 / d2 + 1.0
        rho1 = 1.0 / aux
        return d2 * jnp.log(aux), rho1, -(rho1 * rho1) / d2
    if kind == TUKEY:
        # cost_function.cpp:28-41
        e = jnp.sqrt(jnp.maximum(e2, 0.0))
        aux = e2 / d2
        inlier = e <= d
        rho0 = jnp.where(inlier, d2 * (1.0 - (1.0 - aux) ** 3) / 3.0, jnp.full_like(e2, 1.0) * d2 / 3.0)
        rho1 = jnp.where(inlier, (1.0 - aux) ** 2, jnp.zeros_like(e2))
        rho2 = jnp.where(inlier, -2.0 * (1.0 - aux) / d2, jnp.zeros_like(e2))
        return rho0, rho1, rho2
    raise ValueError(f"unknown robust kernel: {kind}")


def chi2(residual: jnp.ndarray, information: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain chi-square ``r^T Λ r`` over (..., D) residuals (base_edge.cpp:31)."""
    if information is None:
        return jnp.sum(residual * residual, axis=-1)
    wr = jnp.einsum("...ij,...j->...i", information, residual)
    return jnp.sum(residual * wr, axis=-1)


def robust_chi2(kind: str, residual: jnp.ndarray, delta: float, information=None) -> jnp.ndarray:
    """rho(chi2) per edge (base_edge.cpp:33-42)."""
    rho0, _, _ = rho(kind, chi2(residual, information), delta)
    return rho0


def robust_information(kind: str, residual: jnp.ndarray, delta: float, information=None):
    """Per-edge robust GN weight matrix and first derivative.

    Returns (drho (...,), W (..., D, D)) where
    ``W = rho' Λ + 2 rho'' (Λ r)(Λ r)^T`` with the rank-1 term dropped when
    ``rho' + 2 rho'' e2 <= 0`` (base_edge.cpp:44-64).
    """
    d = residual.shape[-1]
    if information is None:
        information = jnp.broadcast_to(jnp.eye(d, dtype=residual.dtype), residual.shape + (d,))
        wr = residual
    else:
        wr = jnp.einsum("...ij,...j->...i", information, residual)
    e2 = jnp.sum(residual * wr, axis=-1)
    _, rho1, rho2 = rho(kind, e2, delta)
    rank1 = 2.0 * rho2[..., None, None] * wr[..., :, None] * wr[..., None, :]
    # Positive-definiteness guard (base_edge.cpp:55). For Huber outliers the
    # quantity rho' + 2 rho'' e2 is *exactly* zero analytically, so a bare
    # `> 0` is a knife-edge that flips with fp reassociation (jit vs eager)
    # and, when it flips the wrong way, admits a large negative rank-1 term
    # that makes the Hessian indefinite. Compare against a small multiple of
    # rho' instead; this only drops the rank-1 term when it is ~0 anyway.
    keep = (rho1 + 2.0 * rho2 * e2 > 1e-5 * rho1)[..., None, None]
    W = rho1[..., None, None] * information + jnp.where(keep, rank1, 0.0)
    return rho1, W
