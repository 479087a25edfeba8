"""Per-stage device-time profile of the fused SLAM frame step.

VERDICT round-1 item 4: break the ~7 ms frame into its stages so the top
cost can be attacked with numbers, not guesses.  Each pipeline stage
(pyramid build, anchored KLT track, motion-only pose LM, GFTT detection,
anchor extraction, scanline stereo, triangulation, window BA) is jitted
standalone and timed on the real accelerator with the *same* steady-state
inputs the fused step sees (captured by running the bench sequence to a
mid-sequence carry).  Measurement is queue-saturated async dispatch — R
back-to-back calls, one block at the end — the same discipline bench.py
uses, so per-call dispatch latency amortizes out.

Optionally captures a jax.profiler trace of the fused step
(--trace /tmp/legoslam_trace, view with tensorboard or xprof).

Usage: python scripts/profile_stages.py [--reps 50] [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--trace", type=str, default="")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/legoslam_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from legoslam_tpu.pipeline import backend as backend_mod
    from legoslam_tpu.pipeline import frontend as frontend_mod
    from legoslam_tpu.pipeline import visual_odometry as vo_mod
    from legoslam_tpu.ops import klt as klt_ops
    from legoslam_tpu.ops import pyramid as pyr_ops
    from legoslam_tpu.geometry import se3
    from legoslam_tpu.utils.config import Config

    import bench  # repo-root bench: reuse its dataset/frame preparation

    ds = bench.make_dataset()
    frames = bench.load_frames(ds)[: args.frames]
    dev = jax.devices()[0]
    print(f"profile: device={dev}, {len(frames)} frames", file=sys.stderr)

    config = Config({
        "stereo_depth_inferior_limit": 2.0,
        "stereo_depth_superior_limit": 60.0,
    })
    cfg = frontend_mod.FrontendConfig.from_config(config)
    ba_cfg = backend_mod.BAConfig()
    rig = ds.rig

    step = jax.jit(
        lambda carry, l, r, i: vo_mod.process_frame(
            cfg, rig, carry, l, r, i, ba_cfg=ba_cfg, inline_ba=True
        )
    )

    device_frames = [
        (jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32)) for l, r in frames
    ]

    # --- run to steady state, capturing a mid-sequence carry + stage inputs
    carry = vo_mod.initial_carry(cfg, frames[0][0].shape)
    carries = []
    kf_flags = []
    for i, (l, r) in enumerate(device_frames):
        carry, out = step(carry, l, r, jnp.asarray(i, jnp.int32))
        carries.append(carry)
        kf_flags.append(out.kf_inserted)
    jax.block_until_ready(carry)
    kf_flags = [bool(k) for k in kf_flags]
    # A steady-state tracking frame: last frame that did NOT insert a keyframe,
    # past the midpoint; and the latest keyframe frame for the BA-shaped input.
    mid = len(frames) // 2
    track_idx = max(i for i in range(mid, len(frames)) if not kf_flags[i])
    kf_idxs = [i for i in range(len(frames)) if kf_flags[i]]
    kf_idx = kf_idxs[-1] if kf_idxs else track_idx
    print(
        f"profile: keyframes at {kf_idxs}; timing tracking frame {track_idx}, "
        f"keyframe frame {kf_idx}", file=sys.stderr,
    )

    carry_t = carries[track_idx - 1]  # input carry for frame track_idx
    carry_k = carries[kf_idx - 1]
    img_l, img_r = device_frames[track_idx]
    img_lk, img_rk = device_frames[kf_idx]

    # Rebuild the stage inputs exactly as process_frame does.
    pyr_l = tuple(pyr_ops.build_pyramid(img_l, cfg.klt.levels))
    pyr_r = tuple(pyr_ops.build_pyramid(img_r, cfg.klt.levels))
    pyr_lk = tuple(pyr_ops.build_pyramid(img_lk, cfg.klt.levels))
    pyr_rk = tuple(pyr_ops.build_pyramid(img_rk, cfg.klt.levels))
    T_prior = se3.se3_orthonormalize(carry_t.rel_motion @ carry_t.T_cur)
    feats_tracked = frontend_mod.track_last_frame(
        cfg, rig, carry_t.pyr_last, pyr_l, carry_t.feats, carry_t.wmap.lm_pos, T_prior
    )
    T_new, feats_posed, _ = frontend_mod.estimate_current_pose(
        cfg, rig, feats_tracked, carry_t.wmap.lm_pos, T_prior
    )
    # Keyframe-branch stage inputs (from the keyframe frame's carry).
    T_prior_k = se3.se3_orthonormalize(carry_k.rel_motion @ carry_k.T_cur)
    feats_k = frontend_mod.track_last_frame(
        cfg, rig, carry_k.pyr_last, pyr_lk, carry_k.feats, carry_k.wmap.lm_pos, T_prior_k
    )
    T_k, feats_k, _ = frontend_mod.estimate_current_pose(
        cfg, rig, feats_k, carry_k.wmap.lm_pos, T_prior_k
    )
    feats_det = frontend_mod.detect_features(cfg, img_lk, feats_k)
    feats_anch = feats_det._replace(
        anchor=klt_ops.extract_anchors(pyr_lk, feats_det.uv, cfg.klt),
        anchor_uv=feats_det.uv,
    )
    feats_right = frontend_mod.find_features_in_right(
        cfg, rig, pyr_lk, pyr_rk, feats_anch, carry_k.wmap.lm_pos, T_k
    )
    wmap_kf = carries[kf_idx].wmap  # post-insert map: the BA input shape
    jax.block_until_ready((feats_posed, feats_right, wmap_kf))

    # --- stages: name -> (jitted fn, args)
    stages = {}

    def add(name, fn, *a):
        stages[name] = (jax.jit(fn), a)

    add("pyramid(l+r)",
        lambda l, r: (tuple(pyr_ops.build_pyramid(l, cfg.klt.levels)),
                      tuple(pyr_ops.build_pyramid(r, cfg.klt.levels))),
        img_l, img_r)
    add("track (anchored KLT)",
        lambda pyr, feats, lm, T: frontend_mod.track_last_frame(
            cfg, rig, pyr, pyr, feats, lm, T),
        pyr_l, carry_t.feats, carry_t.wmap.lm_pos, T_prior)
    add("pose LM (motion-only)",
        lambda feats, lm, T: frontend_mod.estimate_current_pose(cfg, rig, feats, lm, T),
        feats_tracked, carry_t.wmap.lm_pos, T_prior)
    add("detect (GFTT)",
        lambda img, feats: frontend_mod.detect_features(cfg, img, feats),
        img_lk, feats_k)
    add("extract anchors",
        lambda pyr, feats: klt_ops.extract_anchors(pyr, feats.uv, cfg.klt),
        pyr_lk, feats_det)
    add("stereo (scanline)",
        lambda pl, pr, feats, lm, T: frontend_mod.find_features_in_right(
            cfg, rig, pl, pr, feats, lm, T),
        pyr_lk, pyr_rk, feats_anch, carry_k.wmap.lm_pos, T_k)
    add("triangulate",
        lambda feats, wmap, T: frontend_mod.triangulate_new_points(cfg, rig, feats, wmap, T),
        feats_right, carry_k.wmap, T_k)
    add("window BA",
        lambda wmap: backend_mod.ba_step(cfg, rig, wmap, ba_cfg),
        wmap_kf)
    add("FULL step (tracking)",
        lambda carry, l, r: vo_mod.process_frame(
            cfg, rig, carry, l, r, jnp.asarray(track_idx, jnp.int32),
            ba_cfg=ba_cfg, inline_ba=True),
        carry_t, img_l, img_r)
    add("FULL step (keyframe+BA)",
        lambda carry, l, r: vo_mod.process_frame(
            cfg, rig, carry, l, r, jnp.asarray(kf_idx, jnp.int32),
            ba_cfg=ba_cfg, inline_ba=True),
        carry_k, img_lk, img_rk)

    # --- timing: R queued calls, one block.
    results = {}
    for name, (fn, a) in stages.items():
        out = fn(*a)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = dt * 1e3
        print(f"  {name:28s} {dt * 1e3:8.3f} ms", file=sys.stderr)

    if args.trace:
        with jax.profiler.trace(args.trace):
            c = carry_t
            for i in range(8):
                l, r = device_frames[(track_idx + i) % len(device_frames)]
                c, _ = step(c, l, r, jnp.asarray(track_idx + i, jnp.int32))
            jax.block_until_ready(c)
        print(f"profile: trace written to {args.trace}", file=sys.stderr)

    track_sum = results["pyramid(l+r)"] + results["track (anchored KLT)"] + results["pose LM (motion-only)"]
    print("\n== per-stage device time (queue-saturated, ms/call) ==")
    for name, ms in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name:28s} {ms:8.3f}")
    print(f"\ntracking-frame stage sum   {track_sum:8.3f}  vs FULL step (tracking) "
          f"{results['FULL step (tracking)']:.3f}")


if __name__ == "__main__":
    main()
