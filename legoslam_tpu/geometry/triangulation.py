"""Batched multi-view DLT triangulation.

Re-designs `legoslam::triangulation` (include/legoslam/algorithm.h:11-34):
stack the two DLT rows per view, take the SVD null vector, and gate on the
singular-value ratio sigma_last / sigma_second_last < 1e-3 plus finiteness.
Where the reference loops one point at a time on the host, this runs the SVD
over the whole batch of candidate points on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate(poses: jnp.ndarray, pts_norm: jnp.ndarray, sing_ratio_thr: float = 1e-3):
    """Triangulate N points seen in V views.

    Args:
      poses: (V, 4, 4) camera-from-world transforms for each view.
      pts_norm: (N, V, 2) normalized camera coordinates (x/z, y/z) per view.
      sing_ratio_thr: acceptance threshold on sigma_4 / sigma_3 of the DLT
        matrix (well-constrained null space), as in algorithm.h:30.

    Returns:
      pt_world: (N, 3) triangulated points (undefined where ~ok).
      ok: (N,) bool validity (finite and ratio-gated).
    """
    m = poses[:, :3, :]  # (V, 3, 4)
    x = pts_norm[..., 0][..., None]  # (N, V, 1)
    y = pts_norm[..., 1][..., None]
    row0 = x * m[None, :, 2, :] - m[None, :, 0, :]  # (N, V, 4)
    row1 = y * m[None, :, 2, :] - m[None, :, 1, :]
    A = jnp.concatenate([row0, row1], axis=-2)  # (N, 2V, 4) rows interleaved by block

    _, s, vh = jnp.linalg.svd(A, full_matrices=False)
    v_last = vh[..., -1, :]  # (N, 4) null-space direction
    pt = v_last[..., :3] / (v_last[..., 3:4])

    finite = jnp.all(jnp.isfinite(pt), axis=-1)
    ratio_ok = s[..., 3] / s[..., 2] < jnp.asarray(sing_ratio_thr, s.dtype)
    # Rank gate (addition over the reference): a rank-deficient DLT system has a
    # >1-dimensional null space, which makes the ratio gate pass spuriously
    # (sigma_3 ~ 0 as well) — e.g. two identical views. The reference only
    # catches these downstream via depth gates (frontend_g2o.cpp:328-331).
    rank_ok = s[..., 2] > 1e-6 * s[..., 0]
    return pt, finite & ratio_ok & rank_ok


def triangulate_stereo(rig_left_pose, rig_right_pose, uv_norm_left, uv_norm_right, sing_ratio_thr: float = 1e-3):
    """Two-view convenience wrapper used by stereo init / new-landmark birth.

    Args:
      rig_left_pose, rig_right_pose: (4, 4) camera-from-rig extrinsics.
      uv_norm_left, uv_norm_right: (N, 2) normalized camera coordinates.

    Returns (pt_rig (N,3), ok (N,)) with points in the rig (left cam) frame.
    """
    poses = jnp.stack([rig_left_pose, rig_right_pose], axis=0)
    pts = jnp.stack([uv_norm_left, uv_norm_right], axis=1)
    return triangulate(poses, pts, sing_ratio_thr)
