"""Marginalization-prior wiring tests (VERDICT round-1 weakness 7): the
evicted-keyframe prior (solver/marginalization.py, the reference's
problem.cpp:617-781 machinery its pipeline never calls) is now fed by window
eviction and consumed by the BA solves, behind `use_marg_prior`."""

import jax.numpy as jnp
import numpy as np
import pytest

from legoslam_tpu.pipeline.visual_odometry import FrontendStatus
from legoslam_tpu.solver import lm as lm_ops
from legoslam_tpu.solver import robust
from legoslam_tpu.utils import evaluation
from tests.test_backend import init_state
from tests.test_pipeline import SCENE_OVERRIDES, _run_vo, make_dataset


def test_pose_prior_anchors_solution(init_state):
    """A strong prior pinning the (otherwise gauge-free) init keyframe at a
    shifted pose must pull the solve toward that pose; without the prior the
    solve stays at the unconstrained optimum."""
    from legoslam_tpu.pipeline import backend as backend_mod

    ds, cfg, feats, wmap = init_state
    problem, _ = backend_mod.build_problem(cfg, ds.rig, wmap)

    K = problem.poses.shape[0]
    T_lin = jnp.broadcast_to(jnp.eye(4), (K, 4, 4))
    T_lin = T_lin.at[0, 0, 3].set(0.5)  # prior wants keyframe 0 at x=+0.5
    # Huge information on slot 0's coordinates only.
    m6 = jnp.zeros((K * 6,)).at[:6].set(1.0)
    prior_J = jnp.diag(1e4 * m6)
    prior = (prior_J, jnp.zeros((K * 6,)), T_lin)

    state, _ = lm_ops.solve_ba(
        problem.graph, problem.poses, problem.points,
        kernel=robust.HUBER, delta=5.991,
        cfg=lm_ops.LMConfig(iterations=10), pose_prior=prior,
    )
    # exp(dx) T_lin with dx -> 0 means the pose converges to T_lin[0].
    assert abs(float(state.poses[0, 0, 3]) - 0.5) < 2e-2, state.poses[0]

    state0, _ = lm_ops.solve_ba(
        problem.graph, problem.poses, problem.points,
        kernel=robust.HUBER, delta=5.991, cfg=lm_ops.LMConfig(iterations=10),
    )
    assert abs(float(state0.poses[0, 0, 3])) < 1e-3  # stays at the origin


def _ate(vo, ds):
    est_wc = vo.trajectory_T_wc()
    return evaluation.ate_rmse(est_wc[:, :3, 3], ds.gt_T_wc[:, :3, 3])


def test_marg_prior_ab_long_horizon():
    """A/B gate: with evictions forced every frame (max_keyframe_gap=1, window
    7), the marginalization prior must match or improve the open-loop ATE."""
    kw = dict(inline_ba=True, max_keyframe_gap=2, **SCENE_OVERRIDES)
    ds_a = make_dataset(n_frames=30)
    vo_a = _run_vo(ds_a, **kw)
    ds_b = make_dataset(n_frames=30)
    vo_b = _run_vo(ds_b, use_marg_prior=True, **kw)

    assert (vo_b.statuses() != FrontendStatus.LOST).all()
    ate_off, ate_on = _ate(vo_a, ds_a), _ate(vo_b, ds_b)
    # "Improves or at least matches": allow noise-level slack.
    assert ate_on < max(ate_off * 1.10, ate_off + 0.01), (ate_on, ate_off)
    # The prior was genuinely built: the final map carries one.
    assert int(np.sum(np.asarray(vo_b.carry.wmap.marg.prior_kf_id) >= 0)) > 0
    assert float(np.abs(np.asarray(vo_b.carry.wmap.marg.prior_J)).max()) > 0
