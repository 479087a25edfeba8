"""Distributed-BA scaling measurement on the virtual CPU mesh.

Runs the production-shaped sliding-window BA problem (K=16 poses, L=2048
landmarks, E=5120 edges — pipeline/state.py Capacities) through:

  1. the unsharded single-device SoA engine (lm.solve_ba, the production path),
  2. the mesh-sharded solver (parallel/dist_ba.py) on 1, 2, 4, 8 devices,

and reports per-device compiled FLOPs (XLA cost analysis — the honest
work-partition number) and wall time per solve.

Caveat stated in the output: with *virtual* CPU devices every "device" is a
thread pool on the same host, and single-device XLA-CPU already multithreads
its matmuls, so wall-clock speedup on this rig under-reports what real chips
with private MXUs would show.  The FLOP partition is the invariant quantity:
it transfers to real hardware exactly.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_dist_ba.py
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The runtime preloads jax at interpreter startup (sitecustomize), so env vars
# alone are too late — flip the config too (backends initialize lazily).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from legoslam_tpu.geometry import se3
from legoslam_tpu.parallel import dist_ba, mesh as mesh_mod
from legoslam_tpu.solver import lm, reprojection, schur

K, L, E, ITERS, REPS = 16, 2048, 5120, 8, 5


def make_problem(rng):
    """Production-shaped synthetic window: K poses on an arc looking at a
    cloud of L landmarks, E edges sampled uniformly."""
    pts = rng.uniform([-8, -4, 4], [8, 4, 24], size=(L, 3)).astype(np.float32)
    poses = []
    for k in range(K):
        d = np.zeros(6, np.float32)
        d[0] = 0.25 * k
        d[4] = 0.01 * k
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(d)[None])[0]))
    poses = np.stack(poses)
    e_pose = rng.integers(0, K, size=E).astype(np.int32)
    e_point = rng.integers(0, L, size=E).astype(np.int32)
    e_cam = rng.integers(0, 2, size=E).astype(np.int32)
    exts = np.stack([np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)])
    exts[1, 0, 3] = -0.54  # stereo baseline
    intr = reprojection.Intrinsics(
        fx=jnp.float32(360.0), fy=jnp.float32(360.0), cx=jnp.float32(304.0), cy=jnp.float32(92.0)
    )
    # Project ground truth to synthesize measurements, then perturb states.
    Ts = poses[e_pose] @ exts[e_cam]
    pc = np.einsum("eij,ej->ei", Ts[:, :3, :3], pts[e_point]) + Ts[:, :3, 3]
    uv = np.stack(
        [360.0 * pc[:, 0] / pc[:, 2] + 304.0, 360.0 * pc[:, 1] / pc[:, 2] + 92.0], -1
    ).astype(np.float32)
    uv += rng.normal(scale=0.3, size=uv.shape).astype(np.float32)
    # Depth/FoV gates, as the pipeline applies at triangulation (frontend
    # depth limits; dataset.cpp's image bounds): an edge whose point sits at
    # near-zero depth has an unbounded Jacobian, which no float32 solver
    # (sharded or not) should be asked to stomach — the production problem
    # can't contain such edges by construction.
    e_valid = (pc[:, 2] > 2.0) & (np.abs(uv[:, 0] - 304.0) < 640.0) & (
        np.abs(uv[:, 1] - 92.0) < 400.0
    )
    graph = schur.BAGraph(
        e_pose=jnp.asarray(e_pose), e_point=jnp.asarray(e_point), e_cam=jnp.asarray(e_cam),
        e_uv=jnp.asarray(uv), e_valid=jnp.asarray(e_valid), exts=jnp.asarray(exts),
        intr=intr,
        pose_fixed=jnp.zeros((K,), bool).at[0].set(True),
        point_valid=jnp.ones((L,), bool),
    )
    poses0 = poses.copy()
    for k in range(1, K):
        poses0[k] = np.asarray(
            se3.retract(jnp.asarray(poses[k]), jnp.asarray(rng.normal(scale=0.01, size=6).astype(np.float32)))
        )
    pts0 = pts + rng.normal(scale=0.1, size=pts.shape).astype(np.float32)
    return graph, jnp.asarray(poses0), jnp.asarray(pts0)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(7)
    graph, poses0, pts0 = make_problem(rng)
    cfg = lm.LMConfig(iterations=ITERS)
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    # --- unsharded production path -------------------------------------
    @jax.jit
    def single(graph, poses, points):
        st, res = lm.solve_ba(graph, poses, points, cfg=cfg)
        return st.poses, st.points, res.chi

    t_single, out_s = timed(single, graph, poses0, pts0)
    chi_s = float(out_s[2])
    flops_single = single.lower(graph, poses0, pts0).compile().cost_analysis()["flops"]
    print(f"single-device SoA : {t_single*1e3:8.1f} ms/solve  chi={chi_s:.3f}  "
          f"flops={flops_single/1e9:.2f}G")

    rows = []
    for nd in (1, 2, 4, 8):
        if nd > len(devices):
            break
        mesh = mesh_mod.make_mesh(devices[:nd])
        solve_fn = dist_ba.make_dist_solve_fn(mesh)

        @jax.jit
        def dist(graph, poses, points):
            st, res = solve_fn(graph, poses, points, cfg)
            return st.poses, st.points, res.chi

        t_d, out_d = timed(dist, graph, poses0, pts0)
        chi_d = float(out_d[2])
        # cost_analysis on a sharded program reports per-device flops under
        # SPMD; label it as such.
        flops_d = dist.lower(graph, poses0, pts0).compile().cost_analysis()["flops"]
        rows.append((nd, t_d, flops_d, chi_d))
        assert abs(chi_d - chi_s) / max(chi_s, 1e-9) < 1e-2, (chi_d, chi_s)

    print(f"\n{'ndev':>4} {'ms/solve':>9} {'per-dev GFLOP':>14} {'flop partition':>15} "
          f"{'wall speedup':>13} {'chi':>9}")
    f1 = rows[0][2]
    t1 = rows[0][1]
    for nd, t_d, fl, chi in rows:
        print(f"{nd:>4} {t_d*1e3:>9.1f} {fl/1e9:>14.2f} {f1/fl:>14.2f}x {t1/t_d:>12.2f}x {chi:>9.3f}")
    print(f"\nsharded-vs-unsharded 1-device overhead: "
          f"{(rows[0][1]/t_single - 1.0)*100:+.1f}% wall, "
          f"chi match {abs(rows[0][3]-chi_s):.2e}")
    print("note: virtual CPU devices share one host's cores; wall speedup is "
          "bounded by the host, the FLOP partition column is the "
          "hardware-transferable number.")


if __name__ == "__main__":
    main()
