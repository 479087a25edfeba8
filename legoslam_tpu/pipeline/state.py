"""Fixed-shape world-model state for the SLAM pipeline.

Re-designs the reference's mutex-guarded object graph — `Map`, `Frame`,
`MapPoint`, `Feature` (src/{map,frame,mappoint,feature}.cpp) — as a pair of
pytrees of fixed-capacity arrays with validity masks:

- `Features`: the per-frame feature table (the reference's
  `features_left_`/`features_right_` aligned vectors, frame.h:39-41), with
  integer landmark ids replacing `weak_ptr<MapPoint>` back-references.
- `WorldMap`: the landmark table plus the active keyframe window
  (`Map::landmarks_`/`active_keyframes_`, map.h:76-80), with observation
  *flags per (keyframe, feature)* replacing the `MapPoint::observations_`
  weak-pointer lists (mappoint.h:51).

Everything jits: births are slot allocations from a cursor, deaths are mask
clears, and "erase" is never a reshape.  Thread-safety needs no mutexes —
functional snapshots replace the reference's per-object locks (SURVEY §2
concurrency model).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Capacities(NamedTuple):
    """Static capacities; every pipeline function specializes on these."""

    max_features: int = 512        # per-frame feature slots (tracked + detected)
    window: int = 16               # keyframe slots (15 active + insertion slack)
    active_landmarks: int = 2048   # landmark slots in one BA problem
    landmarks: int = 1 << 17       # global landmark table
    ba_edges: int = 5120           # observation edges in one BA problem


class Features(NamedTuple):
    """Per-frame feature table (index-aligned left/right, frame.h:39-41).

    `anchor`/`anchor_uv` hold per-level template patches extracted at the
    keyframe where each feature was last (re)detected, for drift-free
    anchored tracking (ops/klt.py klt_pyramid_anchored)."""

    uv: jnp.ndarray          # (NF, 2) left-image position
    uv_r: jnp.ndarray        # (NF, 2) right-image position
    has_right: jnp.ndarray   # (NF,) right match exists (features_right_[i] != nullptr)
    lm: jnp.ndarray          # (NF,) int32 global landmark id, -1 = none
    valid: jnp.ndarray       # (NF,) slot occupied
    anchor: jnp.ndarray      # (NF, levels, P+2, P+2) keyframe template patches
    anchor_uv: jnp.ndarray   # (NF, 2) template position in its keyframe image

    @staticmethod
    def empty(caps: Capacities, dtype=jnp.float32, levels: int = 4, halo: int = 9) -> "Features":
        nf = caps.max_features
        return Features(
            uv=jnp.zeros((nf, 2), dtype),
            uv_r=jnp.zeros((nf, 2), dtype),
            has_right=jnp.zeros((nf,), bool),
            lm=jnp.full((nf,), -1, jnp.int32),
            valid=jnp.zeros((nf,), bool),
            anchor=jnp.zeros((nf, levels, halo, halo), dtype),
            anchor_uv=jnp.zeros((nf, 2), dtype),
        )

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


class MargState(NamedTuple):
    """Marginalization bookkeeping for the sliding window (optional — active
    only under `use_marg_prior`; zeros otherwise).

    The reference carries the same machinery in `lego::Problem`
    (H_prior_/b_prior_, problem.cpp:617-781, applied :338-355) but its SLAM
    pipeline never invokes it — window eviction just discards information
    (map.cpp:34-86).  Here eviction can fold the evicted keyframe's
    information into a square-root prior over the surviving window poses.

    `prior_*` is the active prior consumed by the next BA solves; `info_*` is
    the window's pose information (Schur-reduced, prior included) at the last
    BA linearization — the matrix the *next* eviction marginalizes.  Both are
    slot-aligned with the keyframe window and tagged by kf_id so recycled
    slots mask out.
    """

    prior_J: jnp.ndarray      # (KW*6, KW*6) sqrt-form prior Jacobian (H = J^T J)
    prior_err: jnp.ndarray    # (KW*6,) linearized prior residual
    prior_T: jnp.ndarray      # (KW, 4, 4) linearization poses
    prior_kf_id: jnp.ndarray  # (KW,) which keyframe each slot's prior refers to (-1 none)
    info_S: jnp.ndarray       # (KW*6, KW*6) last BA pose information
    info_b: jnp.ndarray       # (KW*6,)
    info_T: jnp.ndarray       # (KW, 4, 4)
    info_kf_id: jnp.ndarray   # (KW,)

    @staticmethod
    def empty(caps: "Capacities", dtype=jnp.float32) -> "MargState":
        kw = caps.window

        # Distinct arrays per leaf: aliased leaves break donate_argnums
        # ("attempt to donate the same buffer twice").
        def eye():
            return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (kw, 4, 4))

        return MargState(
            prior_J=jnp.zeros((kw * 6, kw * 6), dtype),
            prior_err=jnp.zeros((kw * 6,), dtype),
            prior_T=eye(),
            prior_kf_id=jnp.full((kw,), -1, jnp.int32),
            info_S=jnp.zeros((kw * 6, kw * 6), dtype),
            info_b=jnp.zeros((kw * 6,), dtype),
            info_T=eye(),
            info_kf_id=jnp.full((kw,), -1, jnp.int32),
        )


class WorldMap(NamedTuple):
    """Landmark table + keyframe window (the reference `Map`)."""

    # --- landmarks (global table) ---
    lm_pos: jnp.ndarray       # (ML, 3) world position
    lm_alive: jnp.ndarray     # (ML,) created and not reset
    lm_obs: jnp.ndarray       # (ML,) int32 registered window observations
    lm_next: jnp.ndarray      # () int32 allocation cursor
    # --- keyframe window ---
    kf_pose: jnp.ndarray      # (KW, 4, 4) T_cw
    kf_id: jnp.ndarray        # (KW,) int32 keyframe id (monotonic), -1 = empty
    kf_frame_id: jnp.ndarray  # (KW,) int32 source frame id
    kf_valid: jnp.ndarray     # (KW,)
    next_kf_id: jnp.ndarray   # () int32
    # --- per-keyframe observations (reference MapPoint::observations_) ---
    kf_uv: jnp.ndarray        # (KW, NF, 2) left measurement
    kf_uv_r: jnp.ndarray      # (KW, NF, 2) right measurement
    kf_lm: jnp.ndarray        # (KW, NF) int32 landmark id, -1 = none
    kf_obs_left: jnp.ndarray  # (KW, NF) left obs registered for BA
    kf_obs_right: jnp.ndarray  # (KW, NF) right obs registered (only at birth kf)
    # --- marginalization prior (zeros unless use_marg_prior) ---
    marg: "MargState"

    @staticmethod
    def empty(caps: Capacities, dtype=jnp.float32) -> "WorldMap":
        ml, kw, nf = caps.landmarks, caps.window, caps.max_features
        return WorldMap(
            lm_pos=jnp.zeros((ml, 3), dtype),
            lm_alive=jnp.zeros((ml,), bool),
            lm_obs=jnp.zeros((ml,), jnp.int32),
            lm_next=jnp.asarray(0, jnp.int32),
            kf_pose=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (kw, 4, 4)),
            kf_id=jnp.full((kw,), -1, jnp.int32),
            kf_frame_id=jnp.full((kw,), -1, jnp.int32),
            kf_valid=jnp.zeros((kw,), bool),
            next_kf_id=jnp.asarray(0, jnp.int32),
            kf_uv=jnp.zeros((kw, nf, 2), dtype),
            kf_uv_r=jnp.zeros((kw, nf, 2), dtype),
            kf_lm=jnp.full((kw, nf), -1, jnp.int32),
            kf_obs_left=jnp.zeros((kw, nf), bool),
            kf_obs_right=jnp.zeros((kw, nf), bool),
            marg=MargState.empty(caps, dtype),
        )

    def num_keyframes(self) -> jnp.ndarray:
        return jnp.sum(self.kf_valid.astype(jnp.int32))

    def lm_active_mask(self) -> jnp.ndarray:
        """THE definition of "active landmark" (the reference MapPoint active
        flag + Map::CleanMap invariant, map.cpp:88-100): alive with at least
        one registered window observation.  Derived — never stored — so it
        cannot drift from the observation grid the BA problem is built from
        (backend.build_problem groups that same grid by landmark id)."""
        return self.lm_alive & (self.lm_obs > 0)
