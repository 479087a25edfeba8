"""Pallas TPU kernel: one pyramid level's entire KLT Gauss-Newton loop.

The XLA formulation (ops/klt.py) expresses each GN iteration as ~25 small
device ops (one-hot construction, two MXU contractions, five reductions, a
2x2 solve, mask updates); at 4 pyramid levels x up to 10 iterations the
per-op fixed overhead — not FLOPs — dominates the tracking stage (~3 ms of a
~5 ms frame on a v5e).  This kernel fuses a level's whole while-loop into a
single Mosaic program per block of keypoints, so the sequential GN math
compiles to straight-line VMEM code with no per-op dispatch.

Math and semantics are identical to ops/klt.py klt_level_anchored
(algorithm.cpp:37-125 behavior: divergence break on cost increase,
convergence at |update| < eps, NaN/singular-Hessian failure marking, border
clamping via the one-hot taps):

- patch sampling: the same separable bilinear one-hot formulation, but both
  matmuls run on VMEM-resident data on the MXU inside the kernel:
  rows = Ry (B*Ph, H) @ img (H, W), then a batched per-keypoint contraction
  against Rx (B, Ph, W).
- the template (anchor) patch and its gradients come in precomputed —
  the anchored tracker's templates are extracted once per keyframe.

The kernel runs a block of B keypoints per grid step; each block exits its
while-loop as soon as every lane in the block converges/diverges (a finer
early-exit than the XLA path's global one).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_onehot(start, size: int, taps: int, dtype):
    """(B, taps, size) bilinear 2-tap one-hot rows along one image axis.

    start: (B, 1) fractional window-start coordinate per keypoint.
    Matches ops/interp.py _axis_matrix (border collapse by clamping).

    Built as the linear-interpolation hat max(0, 1 - |pos - k|), which for
    clamped pos places exactly 1-frac at floor(pos) and frac at floor(pos)+1
    (and weight 1 on the border pixel when pos collapses to it) — identical
    weights to the floor/compare construction, at roughly half the VPU ops
    per element and with no int conversions.  This runs once per GN
    iteration per axis and was the kernel's largest VPU cost (PROFILE.md
    round 4: ~5-7 us per 128-keypoint block-iteration)."""
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, taps, 1), 1)
    pos = start[:, None, :] + offs.astype(dtype)  # (B, taps, 1)
    pos = jnp.clip(pos, 0.0, float(size - 1))
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2).astype(dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - iota)).astype(dtype)


def _sample_block(img, centers_x, centers_y, taps: int, H: int, W: int):
    """Bilinear-sample (taps x taps) windows for a block of keypoints.

    img: (H, W) in VMEM; centers_*: (B, 1) window-start coordinates.
    Returns (B, taps, taps) patches (rows = y, cols = x).
    """
    dtype = img.dtype
    Ry = _axis_onehot(centers_y, H, taps, dtype)  # (B, taps, H)
    Rx = _axis_onehot(centers_x, W, taps, dtype)  # (B, taps, W)
    # (B, taps, H) x (H, W) -> (B, taps, W): plain contraction, no reshapes
    # (Mosaic's layout inference rejects dim-merging reshapes of vectors).
    rows = jax.lax.dot_general(
        Ry, img, (((2,), (0,)), ((), ())), preferred_element_type=dtype
    )
    # per-keypoint contraction over W: (B, taps_y, W) x (B, taps_x, W)
    return jax.lax.dot_general(
        rows, Rx, (((2,), (2,)), ((0,), (0,))), preferred_element_type=dtype
    )


def _sum12(x):
    """(B, P, P) -> (B, 1) without rank-1 intermediates (Mosaic layout)."""
    return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)


def _grad_split(big):
    """(B, P+2, P+2) halo -> value / grad-x / grad-y (B, P, P)."""
    val = big[:, 1:-1, 1:-1]
    gx = 0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2])
    gy = 0.5 * (big[:, 2:, 1:-1] - big[:, :-2, 1:-1])
    return val, gx, gy


def _klt_level_kernel(
    anchor_ref, img_ref, kp1_ref, d0_ref, valid_ref, d_out, succ_out,
    *, patch: int, iterations: int, eps: float, inverse: bool, H: int, W: int,
):
    halo = patch + 2
    dtype = img_ref.dtype
    img = img_ref[:]
    anchor = anchor_ref[:]
    kp1 = kp1_ref[:]           # (B, 2)
    d0 = d0_ref[:]             # (B, 2)
    valid_f = valid_ref[:]      # (B, 1) 0/1 mask (i1 loop carries don't legalize)
    B = kp1.shape[0]
    half = (halo - 1) / 2.0

    p1, gx1, gy1 = _grad_split(anchor)
    if inverse:
        Jx_fix, Jy_fix = -gx1, -gy1
        H00 = _sum12(Jx_fix * Jx_fix)
        H01 = _sum12(Jx_fix * Jy_fix)
        H11 = _sum12(Jy_fix * Jy_fix)

    inf = jnp.full((B, 1), jnp.inf, dtype)

    # Early-exiting while (see _klt_tile_kernel's loop comment).
    def cond(st):
        i, d, last_cost, succ_f, active_f = st
        return (i < iterations) & jnp.any(active_f > 0.5)

    def body(st):
        i, d, last_cost, succ_f, active_f = st
        succ = succ_f > 0.5
        active = active_f > 0.5
        cx = kp1[:, 0:1] + d[:, 0:1] - half
        cy = kp1[:, 1:2] + d[:, 1:2] - half
        big2 = _sample_block(img, cx, cy, halo, H, W)
        p2, gx2, gy2 = _grad_split(big2)
        err = p1 - p2
        cost = _sum12(err * err)

        if inverse:
            Jx, Jy = Jx_fix, Jy_fix
            h00, h01, h11 = H00, H01, H11
        else:
            Jx, Jy = -gx2, -gy2
            h00 = _sum12(Jx * Jx)
            h01 = _sum12(Jx * Jy)
            h11 = _sum12(Jy * Jy)

        bx = _sum12(-err * Jx)
        by = _sum12(-err * Jy)
        det = h00 * h11 - h01 * h01
        inv_det = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det != 0, det, 1.0), 0.0
        )
        ux = (h11 * bx - h01 * by) * inv_det
        uy = (h00 * by - h01 * bx) * inv_det

        bad = ~(jnp.isfinite(ux) & jnp.isfinite(uy)) | (jnp.abs(det) <= 1e-12)
        diverged = last_cost < cost
        apply = active & ~bad & ~diverged
        # componentwise update (concatenating i1 vectors is not lowerable)
        dx = jnp.where(apply, d[:, 0:1] + ux, d[:, 0:1])
        dy = jnp.where(apply, d[:, 1:2] + uy, d[:, 1:2])
        d = jnp.concatenate([dx, dy], axis=1)
        last_cost = jnp.where(apply, cost, last_cost)
        # if active&bad: False elif apply: True else succ — as boolean algebra
        # (select_n on bool literals lowers to an unsupported i8->i1 trunc).
        succ = (succ & ~(active & bad)) | apply
        converged = (ux * ux + uy * uy) < eps * eps
        active = apply & ~converged
        return i + 1, d, last_cost, succ.astype(dtype), active.astype(dtype)

    _, d, _, succ_f, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), d0, inf, valid_f, valid_f)
    )
    d_out[:] = d
    succ_out[:] = succ_f


# ---------------------------------------------------------------------------
# Tile-sampled variant: resolution-independent per-iteration cost.
#
# The kernel above samples with one-hot contractions over the FULL image axes,
# so each GN iteration costs O(B * halo * H * W) MXU FLOPs — 268 MFLOP per
# 128-keypoint block at KITTI half resolution, measured at ~50% of total
# device time per frame (PROFILE.md round 4).  This variant first extracts a
# (TSY, TSX) tile per keypoint (one dynamic 2D slice each — Mosaic requires
# the y start to be a multiple of 8 and the x start a multiple of 128, hence
# the aligned origins and the edge-padded image), then samples inside tiles:
# per-iteration cost drops ~10x at level 0 and becomes independent of image
# size.  Semantics match the full-image kernel except that a window drifting
# outside its tile (>~8 px vertically / >~54 px horizontally from the initial
# guess) marks the lane failed instead of continuing — the pyramid exists
# precisely to keep per-level motion far below these margins, and the
# equivalence test pins mask agreement on realistic motions.
# ---------------------------------------------------------------------------

TILE_Y, TILE_X = 32, 256


def _tile_origins(kp2: jnp.ndarray, HP: int, WP: int):
    """Aligned per-keypoint tile origins covering the initial window."""
    fx = jnp.floor(kp2[:, 0]).astype(jnp.int32)
    fy = jnp.floor(kp2[:, 1]).astype(jnp.int32)
    x0 = jnp.clip(((fx - 64) // 128) * 128, 0, WP - TILE_X)
    y0 = jnp.clip(((fy - 12) // 8) * 8, 0, HP - TILE_Y)
    return jnp.stack([x0, y0], axis=-1)


def _sample_tiles(tiles, cx, cy, taps: int):
    """Bilinear windows from per-keypoint tiles; (B,TSY,TSX) + (B,1) local
    window starts -> (B, taps, taps)."""
    dtype = tiles.dtype
    Ry = _axis_onehot(cy, TILE_Y, taps, dtype)
    Rx = _axis_onehot(cx, TILE_X, taps, dtype)
    rows = jax.lax.dot_general(
        Ry, tiles, (((2,), (1,)), ((0,), (0,))), preferred_element_type=dtype
    )
    return jax.lax.dot_general(
        rows, Rx, (((2,), (2,)), ((0,), (0,))), preferred_element_type=dtype
    )


def _klt_tile_kernel(
    kpi_ref, anchor_ref, img_ref, kp1_ref, d0_ref, valid_ref, d_out, succ_out,
    tiles_ref, *, patch: int, iterations: int, eps: float, inverse: bool,
    HP: int, WP: int,
):
    halo = patch + 2
    dtype = img_ref.dtype
    B = kp1_ref.shape[0]
    half = (halo - 1) / 2.0

    def ext(i, _):
        x0 = pl.multiple_of(kpi_ref[i, 0], 128)
        y0 = pl.multiple_of(kpi_ref[i, 1], 8)
        tiles_ref[i] = img_ref[pl.ds(y0, TILE_Y), pl.ds(x0, TILE_X)]
        return 0

    jax.lax.fori_loop(0, B, ext, 0)

    tiles = tiles_ref[:]
    kp1 = kp1_ref[:]
    d0 = d0_ref[:]
    valid_f = valid_ref[:]
    ox = kpi_ref[:, 0].astype(dtype)[:, None]
    oy = kpi_ref[:, 1].astype(dtype)[:, None]

    p1, gx1, gy1 = _grad_split(anchor_ref[:])
    if inverse:
        Jx_fix, Jy_fix = -gx1, -gy1
        H00 = _sum12(Jx_fix * Jx_fix)
        H01 = _sum12(Jx_fix * Jy_fix)
        H11 = _sum12(Jy_fix * Jy_fix)

    inf = jnp.full((B, 1), jnp.inf, dtype)

    # While-loop with the all-lanes-inactive early exit, measured the faster
    # choice on DEVICE traces: a block-iteration costs ~9-11 us either way
    # (the body's one-hot construction + batched dots dominate; the cond's
    # cross-lane `any` is noise), and real frames converge in well under the
    # 10-iteration cap, so exiting early wins.  Beware benchmarking this with
    # repeated identical calls: the axon tunnel dedupes them and wall-clock
    # numbers come out ~20x too fast (PROFILE.md round 4).
    def cond(st):
        i, d, last_cost, succ_f, active_f = st
        return (i < iterations) & jnp.any(active_f > 0.5)

    def body(st):
        i, d, last_cost, succ_f, active_f = st
        succ = succ_f > 0.5
        active = active_f > 0.5
        gx_w = kp1[:, 0:1] + d[:, 0:1] - half
        gy_w = kp1[:, 1:2] + d[:, 1:2] - half
        cx = gx_w - ox
        cy = gy_w - oy
        # Local clamping at a tile edge that IS the image edge reproduces the
        # reference's border collapse (the image is edge-padded to the aligned
        # size); clamping at an interior tile edge would silently sample the
        # wrong pixels, so such lanes fail instead.
        in_tile = (
            ((cx >= 0) | (ox <= 0))
            & ((cx <= TILE_X - halo - 1) | (ox >= WP - TILE_X))
            & ((cy >= 0) | (oy <= 0))
            & ((cy <= TILE_Y - halo - 1) | (oy >= HP - TILE_Y))
        )

        big2 = _sample_tiles(tiles, cx, cy, halo)
        p2, gx2, gy2 = _grad_split(big2)
        err = p1 - p2
        cost = _sum12(err * err)

        if inverse:
            Jx, Jy = Jx_fix, Jy_fix
            h00, h01, h11 = H00, H01, H11
        else:
            Jx, Jy = -gx2, -gy2
            h00 = _sum12(Jx * Jx)
            h01 = _sum12(Jx * Jy)
            h11 = _sum12(Jy * Jy)

        bx = _sum12(-err * Jx)
        by = _sum12(-err * Jy)
        det = h00 * h11 - h01 * h01
        inv_det = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det != 0, det, 1.0), 0.0
        )
        ux = (h11 * bx - h01 * by) * inv_det
        uy = (h00 * by - h01 * bx) * inv_det

        bad = (
            ~(jnp.isfinite(ux) & jnp.isfinite(uy))
            | (jnp.abs(det) <= 1e-12)
            | ~in_tile
        )
        diverged = last_cost < cost
        apply = active & ~bad & ~diverged
        dx = jnp.where(apply, d[:, 0:1] + ux, d[:, 0:1])
        dy = jnp.where(apply, d[:, 1:2] + uy, d[:, 1:2])
        d = jnp.concatenate([dx, dy], axis=1)
        last_cost = jnp.where(apply, cost, last_cost)
        succ = (succ & ~(active & bad)) | apply
        converged = (ux * ux + uy * uy) < eps * eps
        active = apply & ~converged
        return i + 1, d, last_cost, succ.astype(dtype), active.astype(dtype)

    _, d, _, succ_f, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), d0, inf, valid_f, valid_f)
    )
    d_out[:] = d
    succ_out[:] = succ_f


@functools.partial(
    jax.jit,
    static_argnames=("patch", "iterations", "eps", "inverse", "block", "interpret"),
)
def klt_level_anchored_tile_pallas(
    anchor: jnp.ndarray,
    img2: jnp.ndarray,
    kp1: jnp.ndarray,
    kp2: jnp.ndarray,
    valid: jnp.ndarray,
    patch: int = 7,
    iterations: int = 10,
    eps: float = 1e-2,
    inverse: bool = False,
    block: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-sampled drop-in for `klt_level_anchored_pallas` (see banner)."""
    H, W = img2.shape
    if patch + 2 > 21:
        # _tile_origins centers the initial window with fixed -64/-12 offsets;
        # the binding constraint is the 32-row tile: a first-iteration window
        # start can sit 20 - (halo-1)/2 rows into the tile and must leave
        # halo + 1 rows of headroom, which fails for halo > 21.  Fail loudly
        # instead of silently marking every lane out-of-tile.
        raise ValueError(
            f"klt_level_anchored_tile_pallas supports patch <= 19 (halo <= 21); "
            f"got patch={patch}; use klt_level_anchored_pallas for larger patches"
        )
    HP = max(-(-H // 8) * 8, TILE_Y)
    WP = max(-(-W // 128) * 128, TILE_X)
    imgp = jnp.pad(img2, ((0, HP - H), (0, WP - W)), mode="edge")
    N = kp1.shape[0]
    dtype = img2.dtype
    halo = patch + 2

    B = min(block, N)
    pad = (-N) % B
    if pad:
        anchor = jnp.pad(anchor, ((0, pad), (0, 0), (0, 0)))
        kp1 = jnp.pad(kp1, ((0, pad), (0, 0)))
        kp2 = jnp.pad(kp2, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    Np = N + pad
    d0 = kp2 - kp1
    vmask = valid.astype(dtype)[:, None]
    kpi = _tile_origins(kp2, HP, WP)

    kernel = functools.partial(
        _klt_tile_kernel,
        patch=patch, iterations=iterations, eps=eps, inverse=inverse, HP=HP, WP=WP,
    )
    d, succ = pl.pallas_call(
        kernel,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, halo, halo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 2), dtype),
            jax.ShapeDtypeStruct((Np, 1), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, TILE_Y, TILE_X), dtype)],
        interpret=interpret,
    )(kpi, anchor, imgp, kp1, d0, vmask)

    d = d[:N]
    succ = succ[:N, 0] > 0.5
    kp2_out = kp1[:N] + d
    in_img = (
        (kp2_out[:, 0] >= 0) & (kp2_out[:, 0] < W)
        & (kp2_out[:, 1] >= 0) & (kp2_out[:, 1] < H)
    )
    return kp2_out, succ & in_img & valid[:N]


@functools.partial(
    jax.jit,
    static_argnames=("patch", "iterations", "eps", "inverse", "block", "interpret"),
)
def klt_level_anchored_pallas(
    anchor: jnp.ndarray,
    img2: jnp.ndarray,
    kp1: jnp.ndarray,
    kp2: jnp.ndarray,
    valid: jnp.ndarray,
    patch: int = 7,
    iterations: int = 10,
    eps: float = 1e-2,
    inverse: bool = False,
    block: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops/klt.py klt_level_anchored, fused into one kernel/block.

    Args match klt_level_anchored: anchor (N, P+2, P+2) halo templates, img2
    (H, W), kp1/kp2 (N, 2) flow origin and initial guess, valid (N,).
    Returns (kp2_out (N, 2), success (N,)).
    """
    H, W = img2.shape
    N = kp1.shape[0]
    dtype = img2.dtype
    halo = patch + 2

    B = min(block, N)
    pad = (-N) % B
    if pad:
        anchor = jnp.pad(anchor, ((0, pad), (0, 0), (0, 0)))
        kp1 = jnp.pad(kp1, ((0, pad), (0, 0)))
        kp2 = jnp.pad(kp2, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    Np = N + pad

    d0 = kp2 - kp1
    vmask = valid.astype(dtype)[:, None]

    kernel = functools.partial(
        _klt_level_kernel,
        patch=patch, iterations=iterations, eps=eps, inverse=inverse, H=H, W=W,
    )
    grid = (Np // B,)
    d, succ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, halo, halo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 2), dtype),
            jax.ShapeDtypeStruct((Np, 1), dtype),
        ],
        interpret=interpret,
    )(anchor, img2, kp1, d0, vmask)

    d = d[:N]
    succ = succ[:N, 0] > 0.5
    kp2_out = kp1[:N] + d
    in_img = (
        (kp2_out[:, 0] >= 0) & (kp2_out[:, 0] < W)
        & (kp2_out[:, 1] >= 0) & (kp2_out[:, 1] < H)
    )
    return kp2_out, succ & in_img & valid[:N]
