"""Equivalence of the fused Pallas KLT level kernel vs the XLA formulation.

The kernel (ops/klt_pallas.py) must reproduce ops/klt.py klt_level_anchored
bit-for-bit in structure: same one-hot bilinear taps, same GN update, same
divergence/convergence/NaN semantics.  On CPU the kernel runs in Pallas
interpret mode; on a real TPU the same test exercises the Mosaic build
(scripts/micro_bench.py and the bench pipeline cover that in practice).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legoslam_tpu.ops import klt as klt_ops
from legoslam_tpu.ops import klt_pallas, pyramid as pyr_ops

INTERPRET = jax.default_backend() not in ("tpu", "axon")


def _scene(rng, H=94, W=310, n=64):
    base = jnp.asarray(rng.uniform(0, 1, (12, 39)), jnp.float32)
    img1 = jax.image.resize(base, (H, W), "bilinear") * 255.0
    img2 = jnp.roll(img1, (1, 2), (0, 1))
    kp1 = jnp.stack([
        jnp.asarray(rng.uniform(15, W - 15, n), jnp.float32),
        jnp.asarray(rng.uniform(15, H - 15, n), jnp.float32),
    ], axis=-1)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    return img1, img2, kp1, valid


@pytest.mark.parametrize("inverse", [False, True])
def test_level_kernel_matches_xla(rng, inverse):
    img1, img2, kp1, valid = _scene(rng)
    pyr1 = tuple(pyr_ops.build_pyramid(img1, 1))
    cfg = klt_ops.KLTConfig(levels=1, inverse=inverse)
    anchors = klt_ops.extract_anchors(pyr1, kp1, cfg)

    ref_kp2, ref_ok = klt_ops.klt_level_anchored(
        anchors[:, 0], img2, kp1, kp1, valid, cfg
    )
    pal_kp2, pal_ok = klt_pallas.klt_level_anchored_pallas(
        anchors[:, 0], img2, kp1, kp1, valid,
        patch=7, iterations=10, eps=1e-2, inverse=inverse,
        block=64, interpret=INTERPRET,
    )
    ref_ok, pal_ok = np.asarray(ref_ok), np.asarray(pal_ok)
    assert (ref_ok == pal_ok).mean() > 0.97
    both = ref_ok & pal_ok
    assert both.sum() > 20
    np.testing.assert_allclose(
        np.asarray(pal_kp2)[both], np.asarray(ref_kp2)[both], atol=2e-2
    )


def test_pyramid_backend_switch(rng):
    """klt_pyramid_anchored(backend='pallas') == backend='xla' end to end."""
    img1, img2, kp1, valid = _scene(rng, H=188, W=620, n=128)
    levels = 3
    pyr1 = tuple(pyr_ops.build_pyramid(img1, levels))
    pyr2 = tuple(pyr_ops.build_pyramid(img2, levels))
    cfg_x = klt_ops.KLTConfig(levels=levels, backend="xla")
    anchors = klt_ops.extract_anchors(pyr1, kp1, cfg_x)
    guess = kp1 + jnp.asarray([1.5, 0.5])

    ref_kp2, ref_ok = klt_ops.klt_pyramid_anchored(anchors, kp1, pyr2, guess, valid, cfg_x)
    if INTERPRET:
        # route the pyramid through the interpret-mode kernels (both the
        # full-image and the tile-sampled variant that large levels select)
        from legoslam_tpu.ops import klt_pallas as kp

        orig = kp.klt_level_anchored_pallas
        orig_tile = kp.klt_level_anchored_tile_pallas

        def interp_level(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        def interp_tile(*a, **kw):
            kw["interpret"] = True
            return orig_tile(*a, **kw)

        kp.klt_level_anchored_pallas = interp_level
        kp.klt_level_anchored_tile_pallas = interp_tile
        try:
            cfg_p = cfg_x._replace(backend="pallas")
            pal_kp2, pal_ok = klt_ops.klt_pyramid_anchored(
                anchors, kp1, pyr2, guess, valid, cfg_p
            )
        finally:
            kp.klt_level_anchored_pallas = orig
            kp.klt_level_anchored_tile_pallas = orig_tile
    else:
        cfg_p = cfg_x._replace(backend="pallas")
        pal_kp2, pal_ok = klt_ops.klt_pyramid_anchored(
            anchors, kp1, pyr2, guess, valid, cfg_p
        )
    ref_ok, pal_ok = np.asarray(ref_ok), np.asarray(pal_ok)
    assert (ref_ok == pal_ok).mean() > 0.95
    both = ref_ok & pal_ok
    assert both.sum() > 40
    np.testing.assert_allclose(
        np.asarray(pal_kp2)[both], np.asarray(ref_kp2)[both], atol=5e-2
    )


def test_tile_kernel_matches_full_image_kernel(rng):
    """The tile-sampled variant must agree with the full-image kernel on
    realistic per-level motions (window stays far inside the tile margins)."""
    img1, img2, kp1, valid = _scene(rng, H=188, W=620, n=128)
    pyr1 = tuple(pyr_ops.build_pyramid(img1, 1))
    cfg = klt_ops.KLTConfig(levels=1)
    anchors = klt_ops.extract_anchors(pyr1, kp1, cfg)
    guess = kp1 + jnp.asarray([2.5, -1.0])

    ref_kp2, ref_ok = klt_pallas.klt_level_anchored_pallas(
        anchors[:, 0], img2, kp1, guess, valid, interpret=INTERPRET
    )
    til_kp2, til_ok = klt_pallas.klt_level_anchored_tile_pallas(
        anchors[:, 0], img2, kp1, guess, valid, interpret=INTERPRET
    )
    ref_ok, til_ok = np.asarray(ref_ok), np.asarray(til_ok)
    assert (ref_ok == til_ok).mean() > 0.97, (ref_ok.mean(), til_ok.mean())
    both = ref_ok & til_ok
    assert both.sum() > 40
    np.testing.assert_allclose(
        np.asarray(til_kp2)[both], np.asarray(ref_kp2)[both], atol=2e-2
    )


def test_tile_kernel_success_implies_window_in_tile(rng):
    """Invariant: a successful lane's final sample window lies inside the
    tile extracted for it (or at a tile edge that is the image edge) — a
    window that drifted out must have been marked failed, never fed clamped
    samples that could still "converge"."""
    img1, img2, kp1, valid = _scene(rng, H=188, W=620, n=128)
    pyr1 = tuple(pyr_ops.build_pyramid(img1, 1))
    cfg = klt_ops.KLTConfig(levels=1)
    anchors = klt_ops.extract_anchors(pyr1, kp1, cfg)
    # large wrong guess: many lanes wander, exercising the in-tile guard
    guess = kp1 + jnp.asarray([40.0, 6.0])
    til_kp2, til_ok = klt_pallas.klt_level_anchored_tile_pallas(
        anchors[:, 0], img2, kp1, guess, valid, interpret=INTERPRET
    )
    HP, WP = 192, 640
    kpi = np.asarray(klt_pallas._tile_origins(guess, HP, WP))
    halo = 9
    half = (halo - 1) / 2.0
    kp2 = np.asarray(til_kp2)
    ok = np.asarray(til_ok)
    wx = kp2[:, 0] - half - kpi[:, 0]
    wy = kp2[:, 1] - half - kpi[:, 1]
    TX, TY = klt_pallas.TILE_X, klt_pallas.TILE_Y
    in_tile = (
        ((wx >= -1) | (kpi[:, 0] <= 0))
        & ((wx <= TX - halo) | (kpi[:, 0] >= WP - TX))
        & ((wy >= -1) | (kpi[:, 1] <= 0))
        & ((wy <= TY - halo) | (kpi[:, 1] >= HP - TY))
    )
    assert ok.sum() > 10  # the guard didn't just kill everything
    assert in_tile[ok].all()
