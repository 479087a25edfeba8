"""Micro-benchmarks of the hot device ops (sample/KLT/triangulation/solvers).

Times individual ops queue-saturated (R async calls, one block), printing
ms/call.  Used to attribute the per-stage profile (scripts/profile_stages.py)
to specific ops before optimizing.

Usage: python scripts/micro_bench.py [--reps 100]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *a, reps=100):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:44s} {ms:9.4f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from legoslam_tpu.ops import interp, klt as klt_ops, pyramid as pyr_ops
    from legoslam_tpu.geometry import triangulation

    print(f"device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    H, W, N = 188, 620, 512
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    img2 = jax.random.uniform(jax.random.PRNGKey(1), (H, W), jnp.float32) * 255.0
    centers = jnp.stack([
        jax.random.uniform(key, (N,), jnp.float32, 20, W - 20),
        jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32, 20, H - 20),
    ], axis=-1)
    valid = jnp.ones((N,), bool)

    r = args.reps
    bench("sample_patches_matmul P=11 (halo)", jax.jit(
        lambda i, c: interp.sample_patches_matmul(i, c, 11)), img, centers, reps=r)
    bench("sample_patches_gather P=11", jax.jit(
        lambda i, c: interp.sample_patches_gather(i, c, 11)), img, centers, reps=r)
    bench("klt_level (fwd, 10 iters)", jax.jit(
        lambda a, b, c, v: klt_ops.klt_level(a, b, c, c + 1.0, v)), img, img2, centers, valid, reps=r)
    anchors = klt_ops.extract_anchors(tuple(pyr_ops.build_pyramid(img, 4)), centers)
    bench("klt_level_anchored (10 iters)", jax.jit(
        lambda an, b, c, v: klt_ops.klt_level_anchored(an[:, 0], b, c, c + 1.0, v)),
        anchors, img2, centers, valid, reps=r)
    pyr1 = tuple(pyr_ops.build_pyramid(img, 4))
    pyr2 = tuple(pyr_ops.build_pyramid(img2, 4))
    bench("klt_pyramid_anchored (4 levels)", jax.jit(
        lambda an, c, v: klt_ops.klt_pyramid_anchored(an, c, pyr2, c + 1.0, v)),
        anchors, centers, valid, reps=r)

    # triangulation: (N) two-view DLT
    pn_l = jax.random.normal(key, (N, 2)) * 0.3
    pn_r = pn_l + jnp.asarray([0.05, 0.0])
    Tl = jnp.eye(4, dtype=jnp.float32)
    Tr = Tl.at[0, 3].set(-0.54)
    bench("triangulate_stereo (512 pts, SVD)", jax.jit(
        lambda a, b: triangulation.triangulate_stereo(Tl, Tr, a, b, 1e-3)), pn_l, pn_r, reps=r)

    # raw svd for reference
    A = jax.random.normal(key, (N, 4, 4), jnp.float32)
    bench("jnp.linalg.svd (512x4x4)", jax.jit(jnp.linalg.svd), A, reps=r)
    S = jnp.einsum("nij,nkj->nik", A, A)
    bench("jnp.linalg.eigh (512x4x4)", jax.jit(jnp.linalg.eigh), S, reps=r)

    # one-hot construction alone vs the big matmul alone (level-0 shapes)
    def onehot_only(c):
        Ry = interp._axis_matrix(c[:, 1] - 5.0, H, 11)
        Rx = interp._axis_matrix(c[:, 0] - 5.0, W, 11)
        return Ry.sum(), Rx.sum()
    bench("one-hot Ry/Rx build only", jax.jit(onehot_only), centers, reps=r)

    def rows_only(i, c):
        Ry = interp._axis_matrix(c[:, 1] - 5.0, H, 11)
        return (Ry.reshape(N * 11, H) @ i)
    bench("rows matmul (5632x188 @ 188x620)", jax.jit(rows_only), img, centers, reps=r)

    def einsum_only(i, c):
        Rx = interp._axis_matrix(c[:, 0] - 5.0, W, 11)
        rows = jnp.broadcast_to(i[None, :11, :], (N, 11, W))
        return jnp.einsum("nyw,nxw->nyx", rows, Rx)
    bench("x einsum (512 x 11x620 @ 620x11)", jax.jit(einsum_only), img, centers, reps=r)


if __name__ == "__main__":
    main()
