"""Distributed sliding-window BA over a device mesh.

The BASELINE north star: partition the BA problem across chips and reduce the
Schur system with collectives over ICI.  Edges (observations) shard across
the mesh axis; every device computes the residual/Jacobian/robust-weight
terms and partial Hessian blocks for its edge shard, `psum` assembles the
full block system, and the (small) reduced pose solve runs replicated so the
LM control flow stays in lockstep on every device — the while_loop predicate
is a psum'd scalar, identical everywhere.

This mirrors the structure of the reference's OpenMP-parallel Hessian
assembly (problem.cpp:282-284) scaled from 4 threads to a TPU slice: the
assembly fan-out is where the work is; the 6Kx6K pose solve is negligible.

The landmark back-substitution is evenly sharded by construction (each
landmark's 3x3 solve is independent, problem.cpp:396-400).

Usage: `solve_fn = make_dist_solve_fn(mesh)` plugs into
`pipeline.backend.ba_step(..., solve_fn=solve_fn)`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from legoslam_tpu.geometry import se3
from legoslam_tpu.parallel.mesh import BA_AXIS
from legoslam_tpu.solver import lm as lm_ops
from legoslam_tpu.solver import robust, schur


def _pad_edges(graph: schur.BAGraph, multiple: int) -> schur.BAGraph:
    e = graph.e_pose.shape[0]
    pad = (-e) % multiple
    if pad == 0:
        return graph
    return graph._replace(
        e_pose=jnp.pad(graph.e_pose, (0, pad)),
        e_point=jnp.pad(graph.e_point, (0, pad)),
        e_cam=jnp.pad(graph.e_cam, (0, pad)),
        e_uv=jnp.pad(graph.e_uv, ((0, pad), (0, 0))),
        e_valid=jnp.pad(graph.e_valid, (0, pad)),  # padded lanes invalid
    )


def make_dist_solve_fn(mesh: Mesh, axis: str = BA_AXIS, kernel: str = robust.HUBER, delta: float = 5.991):
    """Build a drop-in replacement for the single-chip LM solve in
    `backend.ba_step` that shards edge work across `mesh`."""
    ndev = mesh.shape[axis]

    def solve_fn(graph: schur.BAGraph, poses: jnp.ndarray, points: jnp.ndarray, cfg: lm_ops.LMConfig):
        graph = _pad_edges(graph, ndev)

        edge_spec = schur.BAGraph(
            e_pose=P(axis), e_point=P(axis), e_cam=P(axis), e_uv=P(axis), e_valid=P(axis),
            exts=P(), intr=jax.tree_util.tree_map(lambda _: P(), graph.intr),
            pose_fixed=P(), point_valid=P(),
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(edge_spec, P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        )
        def run(g: schur.BAGraph, poses0, points0):
            def psum_tree(t):
                return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), t)

            def build(st: lm_ops.BAState):
                blocks = schur.build_blocks(g, st.poses, st.points, kernel, delta)
                blocks = psum_tree(blocks)
                diag = jnp.concatenate(
                    [
                        jnp.diagonal(blocks.Hpp, axis1=-2, axis2=-1).reshape(-1),
                        jnp.diagonal(blocks.Hll, axis1=-2, axis2=-1).reshape(-1),
                    ]
                )
                return (blocks, diag)

            def chi_fn(st: lm_ops.BAState):
                return jax.lax.psum(schur.robust_chi(g, st.poses, st.points, kernel, delta), axis)

            def solve_lin(aux, lam):
                blocks, _ = aux
                S, bs, Hll_inv = schur.schur_reduce(blocks, g.point_valid)
                dx_p = schur.damp_and_solve(S, bs, lam, cfg.strategy)
                dx_l = schur.back_substitute(blocks, Hll_inv, dx_p)
                return (dx_p.reshape(-1, 6), dx_l)

            def retract_fn(st: lm_ops.BAState, dx):
                dx_p, dx_l = dx
                poses_n = se3.retract(st.poses, dx_p)
                finite = jnp.all(jnp.isfinite(dx_l), axis=-1, keepdims=True)
                points_n = st.points + jnp.where(finite & g.point_valid[:, None], dx_l, 0.0)
                return lm_ops.BAState(poses=poses_n, points=points_n)

            def dot_scale(aux, dx, lam):
                blocks, diag = aux
                dx_p, dx_l = dx
                flat = jnp.concatenate([dx_p.reshape(-1), dx_l.reshape(-1)])
                b = jnp.concatenate([blocks.bp.reshape(-1), blocks.bl.reshape(-1)])
                if cfg.strategy == "strategy1":
                    return 0.5 * jnp.dot(flat, lam * diag * flat + b)
                return 0.5 * jnp.dot(flat, lam * flat + b)

            def max_diag(aux):
                return jnp.max(jnp.abs(aux[1]))

            fns = lm_ops.LMFunctions(
                build=build, chi=chi_fn, solve=solve_lin,
                retract=retract_fn, dot_scale=dot_scale, max_diag=max_diag,
            )
            res = lm_ops.lm_optimize(fns, lm_ops.BAState(poses=poses0, points=points0), cfg)
            return res.state.poses, res.state.points, res.chi, res.lam, res.iterations

        poses_n, points_n, chi, lam, iters = run(graph, poses, points)
        state = lm_ops.BAState(poses=poses_n, points=points_n)
        res = lm_ops.LMResult(state=state, chi=chi, lam=lam, iterations=iters, attempts=iters)
        return state, res

    return solve_fn
