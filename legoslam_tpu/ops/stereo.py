"""Scanline stereo matching for a rectified rig.

The reference finds right-image correspondences with the same general 2-D
pyramid KLT it uses for temporal tracking (frontend_g2o.cpp:495-535), seeded
at zero disparity for new features.  For large disparities that estimator
systematically under-shoots, which biases triangulated depths long — so this
module replaces it (config `stereo_matcher: scanline`; the reference-faithful
KLT path remains available) with the classic rectified-stereo pipeline,
batched TPU-style:

1. coarse disparity scan: every (keypoint, candidate-disparity) pair scores
   an SSD patch cost at a coarse pyramid level — one big matmul-gather batch;
2. uniqueness gate: best-vs-second-best cost ratio kills ambiguous matches;
3. subpixel refinement: 1-D Gauss-Newton along the scanline, coarse-to-fine,
   reusing the KLT machinery restricted to the x axis.

All stages are fixed-shape and jit once.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from legoslam_tpu.ops import interp


class ScanlineConfig(NamedTuple):
    num_candidates: int = 256    # dense scan resolution (full-res level)
    scan_level: int = 0          # pyramid level for the scan (0 = full res)
    half_patch: int = 3
    refine_iterations: int = 6
    uniqueness: float = 0.85     # best/second-best (1-ZNCC) ratio gate (< passes)
    min_zncc: float = 0.75       # final acceptance score at the refined match
    levels: int = 4              # pyramid depth shared with KLT
    scale: float = 0.5


def _zncc(pl, pr):
    """Zero-mean normalized cross-correlation per patch pair (..., P, P)."""
    pl0 = pl - jnp.mean(pl, axis=(-2, -1), keepdims=True)
    pr0 = pr - jnp.mean(pr, axis=(-2, -1), keepdims=True)
    num = jnp.sum(pl0 * pr0, axis=(-2, -1))
    den = jnp.sqrt(jnp.sum(pl0 * pl0, axis=(-2, -1)) * jnp.sum(pr0 * pr0, axis=(-2, -1)) + 1e-6)
    return num / den


def _patch_cost(img_l, img_r, kp, disp, patch):
    """1 - ZNCC between left patches at kp and right patches at kp - (disp, 0).

    ZNCC rather than SSD: sparse-texture patches are background-dominated, so
    raw SSD barely discriminates the true match from anywhere else on the
    scanline; ZNCC is contrast/offset-invariant (and robust to left/right
    exposure differences on real rigs).
    """
    pl = interp.sample_patches(img_l, kp, patch)
    centers_r = jnp.stack([kp[:, 0] - disp, kp[:, 1]], axis=-1)
    pr = interp.sample_patches(img_r, centers_r, patch)
    return 1.0 - _zncc(pl, pr), pl, pr


def coarse_scan(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    kp: jnp.ndarray,
    valid: jnp.ndarray,
    d_min: jnp.ndarray,
    d_max: jnp.ndarray,
    cfg: ScanlineConfig,
):
    """Evaluate `num_candidates` disparities per keypoint at a coarse level.

    Returns (d_best, ambiguous) at the *coarse level's* pixel scale.
    """
    n = kp.shape[0]
    C = cfg.num_candidates
    patch = 2 * cfg.half_patch + 1
    t = jnp.linspace(0.0, 1.0, C, dtype=kp.dtype)
    cands = d_min + (d_max - d_min) * t  # (C,)
    kp_rep = jnp.repeat(kp, C, axis=0)                    # (N*C, 2)
    disp_rep = jnp.tile(cands, n)                          # (N*C,)
    cost, _, _ = _patch_cost(img_l, img_r, kp_rep, disp_rep, patch)
    cost = cost.reshape(n, C)
    best = jnp.argmin(cost, axis=1)
    c_best = jnp.min(cost, axis=1)
    # Parabolic subpixel interpolation over the (prev, best, next) costs.
    step = (d_max - d_min) / (C - 1)
    prev_i = jnp.clip(best - 1, 0, C - 1)
    next_i = jnp.clip(best + 1, 0, C - 1)
    cp = jnp.take_along_axis(cost, prev_i[:, None], 1)[:, 0]
    cn = jnp.take_along_axis(cost, next_i[:, None], 1)[:, 0]
    denom = cp - 2.0 * c_best + cn
    offset = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (cp - cn) / jnp.where(denom != 0, denom, 1.0), 0.0)
    offset = jnp.clip(offset, -1.0, 1.0)
    d_best = cands[best] + offset * step
    # Second-best outside the immediate neighborhood of the winner.
    idx = jnp.arange(C)[None, :]
    px_per_cand = jnp.maximum(step, 1e-6)
    near_r = jnp.maximum((2.0 / px_per_cand).astype(jnp.int32), 1)
    near = jnp.abs(idx - best[:, None]) <= near_r
    c_second = jnp.min(jnp.where(near, jnp.inf, cost), axis=1)
    ambiguous = c_best > cfg.uniqueness * c_second
    return d_best, ambiguous, c_best


def refine_1d(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    kp: jnp.ndarray,
    disp: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: ScanlineConfig,
):
    """1-D Gauss-Newton along the scanline (the x-only restriction of the
    reference's per-keypoint GN loop, algorithm.cpp:58-115)."""
    patch = 2 * cfg.half_patch + 1
    halo = patch + 2
    pl = interp.sample_patches(img_l, kp, patch)

    def body(_, st):
        d, last_cost, active = st
        centers = jnp.stack([kp[:, 0] - d, kp[:, 1]], axis=-1)
        big = interp.sample_patches(img_r, centers, halo)
        pr = big[:, 1:-1, 1:-1]
        gx = 0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2])
        err = pl - pr
        cost = jnp.sum(err * err, axis=(1, 2))
        h = jnp.sum(gx * gx, axis=(1, 2))
        # d(err)/d(disp) = +gx (the right patch is sampled at x - disp), so
        # the GN step is -sum(err * gx) / sum(gx^2).
        b = jnp.sum(err * gx, axis=(1, 2))
        upd = jnp.where(h > 1e-9, -b / jnp.where(h > 0, h, 1.0), 0.0)
        diverged = last_cost < cost
        apply = active & ~diverged & jnp.isfinite(upd)
        d = jnp.where(apply, d + upd, d)
        last_cost = jnp.where(apply, cost, last_cost)
        active = apply & (jnp.abs(upd) >= 1e-2)
        return d, last_cost, active

    inf = jnp.full(kp.shape[:1], jnp.inf, kp.dtype)
    d, cost, _ = jax.lax.fori_loop(0, cfg.refine_iterations, body, (disp, inf, valid))
    return d, cost


def match(
    pyr_l,
    pyr_r,
    kp: jnp.ndarray,
    valid: jnp.ndarray,
    d_min: float,
    d_max: float,
    cfg: ScanlineConfig = ScanlineConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full scanline match over a pyramid pair.

    Args:
      pyr_l, pyr_r: image pyramids (level 0 finest).
      kp: (N, 2) left-image keypoints.
      valid: (N,) lanes to match.
      d_min, d_max: disparity search range at level 0 (from the rig's
        depth gates: d = fx * baseline / z).

    Returns (uv_right (N, 2), ok (N,)).
    """
    lvl = cfg.scan_level
    s = cfg.scale**lvl
    d0, ambiguous, _ = coarse_scan(
        pyr_l[lvl], pyr_r[lvl], kp * s, valid,
        jnp.asarray(d_min * s, kp.dtype), jnp.asarray(d_max * s, kp.dtype), cfg,
    )
    d = d0 / s
    ok = valid & ~ambiguous
    d, _ = refine_1d(pyr_l[0], pyr_r[0], kp, d, ok, cfg)
    patch = 2 * cfg.half_patch + 1
    score, _, _ = _patch_cost(pyr_l[0], pyr_r[0], kp, d, patch)
    W = pyr_r[0].shape[1]
    x_r = kp[:, 0] - d
    in_range = (d > d_min * 0.5) & (d < d_max * 1.5) & (x_r >= 0) & (x_r < W)
    ok = ok & (score < 1.0 - cfg.min_zncc) & in_range
    return jnp.stack([x_r, kp[:, 1]], axis=-1), ok
