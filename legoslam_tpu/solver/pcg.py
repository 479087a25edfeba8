"""Jacobi-preconditioned conjugate gradients, the alternative linear solver
the reference ships alongside Cholesky (`Problem::PCGSolver`,
src/lego/base/problem.cpp:584-614, selectable at :377-379, :420-422).

Same contract: solve ``A x = b`` for dense SPD A with diagonal preconditioner,
stopping at ``||r|| <= 1e-6 ||b||`` or `max_iter`. Implemented as a
`lax.while_loop` so it jits and can replace the Cholesky call inside the LM
body (config key `linear_solver: pcg`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg_solve(A: jnp.ndarray, b: jnp.ndarray, max_iter: int = -1) -> jnp.ndarray:
    n = b.shape[0]
    iters = 2 * n if max_iter < 0 else max_iter
    d = jnp.diagonal(A)
    m_inv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)

    threshold = 1e-6 * jnp.linalg.norm(b)

    # Mirrors the reference's slightly unusual first iteration (problem.cpp:590-597):
    # one step is taken before the loop begins.
    r0 = b
    z0 = m_inv * r0
    p = z0
    w = A @ p
    r0z0 = jnp.dot(r0, z0)
    alpha = r0z0 / jnp.dot(p, w)
    x = alpha * p
    r1 = r0 - alpha * w

    def cond(c):
        x, r0, r1, p, w, r0z0, i = c
        return (jnp.linalg.norm(r1) > threshold) & (i < iters)

    def body(c):
        x, r0, r1, p, w, r0z0, i = c
        z1 = m_inv * r1
        r1z1 = jnp.dot(r1, z1)
        beta = r1z1 / r0z0
        p = beta * p + z1
        w = A @ p
        alpha = r1z1 / jnp.dot(p, w)
        x = x + alpha * p
        r_next = r1 - alpha * w
        return (x, r1, r_next, p, w, r1z1, i + 1)

    x, _, _, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r0, r1, p, w, r0z0, jnp.asarray(0, jnp.int32)))
    return x
