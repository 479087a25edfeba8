"""Pallas TPU kernel: the entire motion-only pose estimation in one program.

`Frontend::EstimateCurrentPose` (frontend_g2o.cpp:157-245) is 4 outlier-
reclassification rounds around a 10-iteration Levenberg solve over <=E
pose-only reprojection edges.  The XLA formulation (solver/lm.py
estimate_pose -> solve_pose -> lm_optimize) expresses each LM iteration as
~35 small ops; at 4 x 10 iterations the fixed per-op cost dominates
(~1.5 ms of a ~5 ms frame on a v5e) while the actual math is a few hundred
FLOPs per edge.  Here the whole thing — residuals/Jacobians for all edges as
(1, E) lane vectors, Huber weighting with the PSD guard, the 6x6 normal
equations, an unrolled scalar Cholesky, the SE(3) retraction with its
Newton-polar SO(3) projection, the Nielsen lambda schedule, and the
chi2-based outlier reclassification — runs as ONE Mosaic program.

Semantics mirror solver/lm.py estimate_pose exactly (same build/solve/
retract/accept rules, same masking, same constants); the only deliberate
difference is the 6x6 linear solve (Cholesky here vs LU there — identical
for these SPD systems to float tolerance) and that a rejected LM step
recomputes the unchanged normal equations instead of caching them
(bit-identical result, branchless code).  tests/test_pose_pallas.py pins
the equivalence.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9  # reprojection._EPS (z-divide guard)


# --- (1,1)-scalar 3x3 helpers (trace-time unrolled) ------------------------

def _mat3_mul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def _mat3_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(3)) for i in range(3)]


def _so3_project(R, iterations=2):
    """Newton polar projection R <- R(1.5I - 0.5 R^T R) (se3.so3_project)."""
    for _ in range(iterations):
        M = [[sum(R[k][i] * R[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
        S = [[(1.5 if i == j else 0.0) - 0.5 * M[i][j] for j in range(3)] for i in range(3)]
        R = _mat3_mul(R, S)
    return R


def _se3_exp_rt(dx):
    """se3.se3_exp on a 6-list of (1,1) scalars -> (R 3x3, t 3) lists.

    Tangent order [rho, phi]; same Taylor switch as se3._rot_coeffs.
    """
    rho, phi = dx[:3], dx[3:]
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    small = t2 < 1e-8
    th = jnp.sqrt(jnp.maximum(t2, 1e-30))
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(t2, 1e-30))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - jnp.sin(th) / th) / jnp.maximum(t2, 1e-30))
    K = [
        [jnp.zeros_like(t2), -phi[2], phi[1]],
        [phi[2], jnp.zeros_like(t2), -phi[0]],
        [-phi[1], phi[0], jnp.zeros_like(t2)],
    ]
    KK = _mat3_mul(K, K)
    R = [[(1.0 if i == j else 0.0) + a * K[i][j] + b * KK[i][j] for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + b * K[i][j] + c * KK[i][j] for j in range(3)] for i in range(3)]
    t = _mat3_vec(V, rho)
    return R, t


def _chol6_solve(H, b, lam, strategy1: bool):
    """Damped 6x6 solve, unrolled over (1,1) scalars (schur.damp_and_solve
    semantics: additive/multiplicative damping + unit diag where no support)."""
    d = [H[i][i] for i in range(6)]
    if strategy1:
        dd = [d[i] + lam * d[i] for i in range(6)]
    else:
        dd = [d[i] + lam for i in range(6)]
    dd = [dd[i] + jnp.where(jnp.abs(d[i]) <= 1e-12, 1.0, 0.0) for i in range(6)]
    A = [[H[i][j] for j in range(6)] for i in range(6)]
    for i in range(6):
        A[i][i] = dd[i]
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _pose_kernel(
    pw_ref, uv_ref, valid_ref, T_ref, T_out, inlier_out, nin_out,
    *, fx: float, fy: float, cx: float, cy: float, chi2_th: float,
    iterations: int, outer_iterations: int, drop_kernel_after: int,
    exclude_outliers: bool, tau: float, max_diag_cap: float,
    diff_chi_threshold: float, false_cnt_threshold: int, strategy1: bool,
):
    dtype = pw_ref.dtype
    pwx = pw_ref[0:1, :]   # (1, E)
    pwy = pw_ref[1:2, :]
    pwz = pw_ref[2:3, :]
    u = uv_ref[0:1, :]
    v = uv_ref[1:2, :]
    valid = valid_ref[0:1, :]          # (1, E) 0/1
    T0 = T_ref[:]                       # (1, 16) row-major pose (a flat lane
    # vector: Mosaic cannot broadcast a (1,1) predicate across both sublanes
    # and lanes, so every pose op stays lane-only)
    d2 = chi2_th * chi2_th

    def Tsc(T, i, j):
        k = 4 * i + j
        return T[0:1, k:k + 1]          # (1, 1)

    def edge_terms(T):
        """Residuals + per-edge chi2 + Jacobian rows at pose T (4,4) array."""
        R = [[Tsc(T, i, j) for j in range(3)] for i in range(3)]
        t = [Tsc(T, i, 3) for i in range(3)]
        X = R[0][0] * pwx + R[0][1] * pwy + R[0][2] * pwz + t[0]
        Y = R[1][0] * pwx + R[1][1] * pwy + R[1][2] * pwz + t[1]
        Z = R[2][0] * pwx + R[2][1] * pwy + R[2][2] * pwz + t[2]
        zinv = 1.0 / (Z + _EPS)
        ru = u - (fx * X * zinv + cx)
        rv = v - (fy * Y * zinv + cy)
        zinv2 = zinv * zinv
        zero = jnp.zeros_like(X)
        Ju = (-fx * zinv, zero, fx * X * zinv2,
              fx * X * Y * zinv2, -fx - fx * X * X * zinv2, fx * Y * zinv)
        Jv = (zero, -fy * zinv, fy * Y * zinv2,
              fy + fy * Y * Y * zinv2, -fy * X * Y * zinv2, -fy * X * zinv)
        return ru, rv, Ju, Jv

    def huber(e2, robust: bool):
        """(rho0, rho1, rho2) of robust.rho(HUBER/TRIVIAL, e2, chi2_th)."""
        if not robust:
            one = jnp.ones_like(e2)
            return e2, one, jnp.zeros_like(e2)
        sqrte = jnp.sqrt(jnp.maximum(e2, 1e-20))
        inl = e2 <= d2
        rho0 = jnp.where(inl, e2, 2.0 * sqrte * chi2_th - d2)
        rho1 = jnp.where(inl, 1.0, chi2_th / sqrte)
        rho2 = jnp.where(inl, 0.0, -0.5 * (chi2_th / sqrte) / jnp.maximum(e2, 1e-20))
        return rho0, rho1, rho2

    def build(T, use, robust):
        """(H 6x6, b 6) normal equations (lm.solve_pose build)."""
        ru, rv, Ju, Jv = edge_terms(T)
        ru = ru * use
        rv = rv * use
        e2 = ru * ru + rv * rv
        _, rho1, rho2 = huber(e2, robust)
        keep = rho1 + 2.0 * rho2 * e2 > 1e-5 * rho1   # PSD guard
        two_r2 = jnp.where(keep, 2.0 * rho2, 0.0)
        W00 = (rho1 + two_r2 * ru * ru) * use
        W01 = (two_r2 * ru * rv) * use
        W11 = (rho1 + two_r2 * rv * rv) * use
        drho = rho1 * use
        JWu = [Ju[i] * W00 + Jv[i] * W01 for i in range(6)]
        JWv = [Ju[i] * W01 + Jv[i] * W11 for i in range(6)]
        H = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                hij = jnp.sum(JWu[i] * Ju[j] + JWv[i] * Jv[j], axis=1, keepdims=True)
                H[i][j] = hij
                H[j][i] = hij
        b = [jnp.sum(-drho * (Ju[i] * ru + Jv[i] * rv), axis=1, keepdims=True)
             for i in range(6)]
        return H, b

    def chi_at(T, use, robust):
        ru, rv, _, _ = edge_terms(T)
        ru = ru * use
        rv = rv * use
        rho0, _, _ = huber(ru * ru + rv * rv, robust)
        return 0.5 * jnp.sum(rho0 * use, axis=1, keepdims=True)

    def retract(T, dx):
        """se3.retract: Exp(dx) @ T, orthonormalized, NaN-guarded."""
        finite = jnp.ones_like(dx[0])
        for k in range(6):
            finite = finite * jnp.isfinite(dx[k]).astype(dtype)
        dx = [jnp.where(finite > 0.5, dx[k], 0.0) for k in range(6)]
        Re, te = _se3_exp_rt(dx)
        R = [[Tsc(T, i, j) for j in range(3)] for i in range(3)]
        t = [Tsc(T, i, 3) for i in range(3)]
        Rn = _mat3_mul(Re, R)
        tn = [_mat3_vec(Re, t)[i] + te[i] for i in range(3)]
        Rn = _so3_project(Rn, 2)
        parts = []
        for i in range(3):
            parts.extend(Rn[i] + [tn[i]])
        parts.extend([jnp.zeros_like(tn[0]), jnp.zeros_like(tn[0]),
                      jnp.zeros_like(tn[0]), jnp.ones_like(tn[0])])
        return jnp.concatenate(parts, axis=1)  # (1, 16)

    outlier = jnp.zeros_like(valid)  # (1, E) 0/1
    T = T0
    for rnd in range(outer_iterations):
        robust = rnd <= drop_kernel_after
        use = valid * (1.0 - outlier) if exclude_outliers else valid

        # lambda0 = tau * min(max|H_ii|, cap) at the reset pose (lm_optimize)
        H0, b0 = build(T0, use, robust)
        maxd = jnp.abs(H0[0][0])
        for i in range(1, 6):
            maxd = jnp.maximum(maxd, jnp.abs(H0[i][i]))
        lam0 = tau * jnp.minimum(maxd, max_diag_cap)
        chi0 = chi_at(T0, use, robust)

        def cond(st):
            Tc, chi, last_chi, lam, ni, it, false_cnt, stop = st
            return jnp.logical_and(
                jnp.logical_not(jnp.any(stop > 0.5)), jnp.any(it < float(iterations))
            )

        def body(st, use=use, robust=robust):
            Tc, chi, last_chi, lam, ni, it, false_cnt, stop = st
            H, b = build(Tc, use, robust)
            dx = _chol6_solve(H, b, lam, strategy1)
            cand = retract(Tc, dx)
            temp_chi = chi_at(cand, use, robust)
            scale = 1e-10
            for k in range(6):
                if strategy1:
                    scale = scale + 0.5 * dx[k] * (lam * H[k][k] * dx[k] + b[k])
                else:
                    scale = scale + 0.5 * dx[k] * (lam * dx[k] + b[k])
            rho_val = (chi - temp_chi) / scale
            accept = (rho_val > 0) & jnp.isfinite(temp_chi)
            acc = accept.astype(dtype)

            if strategy1:
                lam_acc = jnp.maximum(lam / 9.0, 1e-7)
                lam_rej = jnp.minimum(lam * 11.0, 1e7)
                ni_acc, ni_rej = ni, ni
            else:
                alpha = 1.0 - (2.0 * rho_val - 1.0) ** 3
                alpha = jnp.minimum(alpha, 2.0 / 3.0)
                factor = jnp.maximum(1.0 / 3.0, alpha)
                lam_acc = lam * factor
                ni_acc = jnp.full_like(ni, 2.0)
                lam_rej = lam * ni
                ni_rej = ni * 2.0

            Tn = jnp.where(acc > 0.5, cand, Tc)  # (1,1) vs (1,16): lane bcast
            chi_n = jnp.where(accept, temp_chi, chi)
            false_n = jnp.where(accept, 0.0, false_cnt + 1.0)
            exhausted = false_n >= float(false_cnt_threshold)
            outer_done = accept | exhausted
            it_n = it + jnp.where(outer_done, 1.0, 0.0)
            stop_n = (outer_done & (last_chi - chi_n < diff_chi_threshold)).astype(dtype)
            last_chi_n = jnp.where(outer_done, chi_n, last_chi)
            return (
                Tn, chi_n, last_chi_n,
                jnp.where(accept, lam_acc, lam_rej),
                jnp.where(accept, ni_acc, ni_rej),
                it_n, jnp.where(outer_done, 0.0, false_n), stop_n,
            )

        one = jnp.ones_like(chi0)
        st0 = (
            T0, chi0, 1e20 * one, lam0, 2.0 * one,
            jnp.zeros_like(chi0), jnp.zeros_like(chi0), jnp.zeros_like(chi0),
        )
        T = jax.lax.while_loop(cond, body, st0)[0]

        # Reclassify by per-edge robust chi2 (pose_edge_chi2: unmasked).
        ru, rv, _, _ = edge_terms(T)
        chis, _, _ = huber(ru * ru + rv * rv, robust)
        outlier = (chis > chi2_th).astype(dtype)

    inlier = valid * (1.0 - outlier)
    T_out[:] = T
    inlier_out[:] = inlier
    nin_out[:] = jnp.sum(inlier, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "chi2_th", "iterations", "outer_iterations",
        "drop_kernel_after", "exclude_outliers", "tau", "max_diag_cap",
        "diff_chi_threshold", "false_cnt_threshold", "strategy1", "interpret",
    ),
)
def estimate_pose_pallas(
    T_init: jnp.ndarray,
    p_world: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    fx: float, fy: float, cx: float, cy: float,
    chi2_th: float = 5.991,
    iterations: int = 10,
    outer_iterations: int = 4,
    drop_kernel_after: int = 2,
    exclude_outliers: bool = True,
    tau: float = 1e-5,
    max_diag_cap: float = 5e10,
    diff_chi_threshold: float = 1e-5,
    false_cnt_threshold: int = 10,
    strategy1: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for solver/lm.py estimate_pose (returns (T, inlier, n_inliers))."""
    E = p_world.shape[0]
    dtype = p_world.dtype
    pw = p_world.T                      # (3, E)
    uvT = uv.T                          # (2, E)
    vmask = valid.astype(dtype)[None, :]  # (1, E)

    kernel = functools.partial(
        _pose_kernel,
        fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
        chi2_th=float(chi2_th), iterations=int(iterations),
        outer_iterations=int(outer_iterations),
        drop_kernel_after=int(drop_kernel_after),
        exclude_outliers=bool(exclude_outliers), tau=float(tau),
        max_diag_cap=float(max_diag_cap),
        diff_chi_threshold=float(diff_chi_threshold),
        false_cnt_threshold=int(false_cnt_threshold), strategy1=bool(strategy1),
    )
    T, inlier_f, nin = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((1, 16), dtype),
            jax.ShapeDtypeStruct((1, E), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(pw, uvT, vmask, T_init.reshape(1, 16))
    return T.reshape(4, 4), inlier_f[0] > 0.5, nin[0, 0].astype(jnp.int32)
