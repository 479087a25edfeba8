"""Equivalence of the fused Pallas pose-solve kernel vs solver/lm.py.

estimate_pose_pallas must reproduce estimate_pose: same 4-round outlier
reclassification, same LM schedule, same Huber semantics.  The only allowed
deviations are float-level (Cholesky vs LU on the SPD 6x6; op ordering), so
the recovered pose and inlier sets are compared with tight tolerances.
Runs in Pallas interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from legoslam_tpu.geometry import se3
from legoslam_tpu.solver import lm as lm_ops
from legoslam_tpu.solver import pose_pallas, reprojection

INTERPRET = jax.default_backend() not in ("tpu", "axon")
INTR = reprojection.Intrinsics(fx=360.0, fy=360.0, cx=310.0, cy=94.0)


def _problem(rng, n=256, outlier_frac=0.1, noise=0.3):
    z = rng.uniform(4.0, 60.0, n)
    P = np.stack([rng.uniform(-0.8, 0.8, n) * z, rng.uniform(-0.3, 0.3, n) * z, z], -1)
    T_true = np.asarray(se3.se3_exp(jnp.asarray([0.1, -0.05, 0.3, 0.01, 0.02, -0.01], jnp.float32)))
    pc = P @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack([360.0 * pc[:, 0] / pc[:, 2] + 310.0, 360.0 * pc[:, 1] / pc[:, 2] + 94.0], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(outlier_frac * n)
    uv[:n_out] += rng.normal(0, 30.0, (n_out, 2))
    valid = rng.uniform(size=n) > 0.05
    T_prior = np.asarray(
        se3.se3_exp(jnp.asarray([0.12, -0.03, 0.25, 0.0, 0.025, 0.0], jnp.float32))
    )
    return (
        jnp.asarray(T_prior, jnp.float32),
        jnp.asarray(P, jnp.float32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(valid),
        T_true,
    )


def test_pose_kernel_matches_xla(rng):
    T_prior, P, uv, valid, T_true = _problem(rng)

    T_ref, inl_ref, n_ref = lm_ops.estimate_pose(
        INTR, T_prior, P, uv, valid, chi2_th=5.991, outer_iterations=4,
        cfg=lm_ops.LMConfig(iterations=10),
    )
    T_pal, inl_pal, n_pal = pose_pallas.estimate_pose_pallas(
        T_prior, P, uv, valid,
        fx=360.0, fy=360.0, cx=310.0, cy=94.0,
        chi2_th=5.991, iterations=10, outer_iterations=4,
        interpret=INTERPRET,
    )
    T_ref, T_pal = np.asarray(T_ref), np.asarray(T_pal)
    # Both must recover the true pose; and agree with each other tightly.
    np.testing.assert_allclose(T_ref, np.asarray(T_true), atol=5e-3)
    np.testing.assert_allclose(T_pal, np.asarray(T_true), atol=5e-3)
    np.testing.assert_allclose(T_pal, T_ref, atol=1e-3)
    inl_ref, inl_pal = np.asarray(inl_ref), np.asarray(inl_pal)
    assert (inl_ref == inl_pal).mean() > 0.98
    assert abs(int(n_ref) - int(n_pal)) <= max(3, 0.02 * len(inl_ref))


def test_pose_kernel_all_invalid(rng):
    """Degenerate: no valid edges — must return a finite pose, zero inliers."""
    T_prior, P, uv, _, _ = _problem(rng, n=64)
    valid = jnp.zeros((64,), bool)
    T_pal, inl, n = pose_pallas.estimate_pose_pallas(
        T_prior, P, uv, valid,
        fx=360.0, fy=360.0, cx=310.0, cy=94.0, interpret=INTERPRET,
    )
    assert np.isfinite(np.asarray(T_pal)).all()
    assert int(n) == 0 and not np.asarray(inl).any()
