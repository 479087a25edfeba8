"""Device-trace profiler: per-stage *device* time + MFU for the fused SLAM step.

Captures a `jax.profiler` trace of the production frame step on the real
accelerator, parses the exported trace JSON directly (no tensorboard on this
machine), and aggregates XLA-op device time by pipeline stage using the
`jax.named_scope` annotations in pipeline/{visual_odometry,frontend,backend}.py
and solver/lm.py.  Unlike scripts/profile_stages.py (wall-clock of standalone
stage programs, each carrying a ~0.6 ms dispatch floor — PROFILE.md round 3),
these are the observed on-device durations inside the single fused program.

Also reports achieved FLOP/s vs peak (MFU) using XLA's own cost analysis of
the compiled step (`compiled.cost_analysis()['flops']`).

Usage:  python scripts/profile_trace.py [--frames N] [--keyframe-only]
Writes: /tmp/legoslam_trace/ (raw trace) and a table on stdout.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    "pyr_build_l",
    "pyr_build_r",
    "klt_track",
    "pose_solve",
    "gftt_detect",
    "extract_anchors",
    "stereo_match",
    "triangulate",
    "ba_build_problem",
    "lm_linear_solve",
    "lm_retract",
    "lm_chi_build",
    "ba_lm_solve",      # catch-all for BA solve ops not in the 3 sub-scopes
    "ba_outliers",
    "window_ba",        # catch-all for merge etc.
    "branch_0_fun",     # init branch (stereo bootstrap)
    "branch_2_fun",     # LOST/reset branch
]

# v5e (v5 lite) peak: 197 TFLOP/s bf16 / 98.5 TFLOP/s fp32-via-3-pass (the MXU
# is bf16xbf16->f32; XLA's default f32 matmul uses bf16_3x passes).
PEAK_BF16 = 197e12
PEAK_F32_3X = 98.5e12 / 1.5  # ~65.7e12 effective for 3-pass f32


def build_step(matched=False):
    import jax
    import jax.numpy as jnp

    from legoslam_tpu.pipeline import backend as backend_mod
    from legoslam_tpu.pipeline import frontend as frontend_mod
    from legoslam_tpu.pipeline import visual_odometry as vo_mod
    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
    from legoslam_tpu.pipeline.state import Capacities
    from legoslam_tpu.utils.config import Config

    SHAPE = (188, 620)
    ds = SyntheticPlanesDataset(
        n_frames=40, shape=SHAPE, focal=360.0, baseline=0.54, speed=0.12,
        half_width=10.0, length=200.0,
    )
    cache = f"/tmp/legoslam_bench_{SHAPE[0]}x{SHAPE[1]}_40.npz"
    if os.path.exists(cache):
        data = np.load(cache)
        frames = list(zip(data["left"], data["right"]))
    else:
        ds.init()
        frames = []
        for _ in range(40):
            fr = ds.next_frame()
            frames.append((fr.left, fr.right))
    config = Config({
        "stereo_depth_inferior_limit": 2.0,
        "stereo_depth_superior_limit": 60.0,
    })
    cfg = frontend_mod.FrontendConfig.from_config(config)
    ba_cfg = backend_mod.BAConfig(
        assembly_precision=str(config["ba_assembly_precision"])
    )
    inline_ba = True
    if matched:
        cfg = cfg._replace(
            caps=Capacities(max_features=192),
            gftt=cfg.gftt._replace(max_corners=150),
        )
        inline_ba = False
    rig = ds.rig

    def step(carry, img_l, img_r, frame_id):
        return vo_mod.process_frame(
            cfg, rig, carry, img_l, img_r, frame_id, ba_cfg=ba_cfg, inline_ba=inline_ba
        )

    jitted = jax.jit(step, donate_argnums=(0,))
    carry = vo_mod.initial_carry(cfg, SHAPE)
    device_frames = [
        (jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32)) for l, r in frames
    ]
    return jax, jnp, jitted, carry, device_frames


CONTAINERS = ("cond", "while", "call")  # XLA Ops lane entries that nest leaves


def parse_trace(trace_dir):
    """Leaf device-op events from the 'XLA Ops' lane: (name, tf_op, dur_us, ts).

    The perfetto JSON has one '/device:TPU:N' process; its 'XLA Ops' thread
    carries one complete-event per executed HLO op with args.tf_op holding the
    jax named_scope path.  cond/while/call entries are containers whose nested
    ops are ALSO emitted — summing them would double count, so they are
    dropped (their exclusive time is negligible glue)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    out = []
    t_min, t_max = np.inf, -np.inf
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_name.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        base = e.get("name", "").split(".")[0]
        if base in CONTAINERS:
            continue
        dur = float(e.get("dur", 0.0))
        args = e.get("args", {}) or {}
        out.append((e.get("name", ""), args.get("tf_op", ""), dur, float(e.get("ts", 0.0))))
        t_min = min(t_min, float(e.get("ts", 0.0)))
        t_max = max(t_max, float(e.get("ts", 0.0)) + dur)
    return out, (t_max - t_min if out else 0.0)


def classify(tf_op):
    """Innermost named_scope stage in the op's scope path."""
    cands = [(tf_op.rfind("/" + s + "/"), s) for s in STAGES if "/" + s + "/" in tf_op]
    return max(cands)[1] if cands else "other"


def print_table(events, span_us, n, kf_frames):
    by_stage = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    total = 0.0
    for name, tf_op, dur, ts in events:
        st = classify(tf_op)
        by_stage[st] += dur
        by_op[(st, name.split(".")[0])] += dur
        op_count[st] += 1
        total += dur
    print(f"\n=== device time by stage ({n} frames, {kf_frames} keyframes) ===")
    print(f"{'stage':<20}{'total ms':>10}{'ms/frame':>10}{'ms/kf':>9}{'ops':>8}")
    for st, dur in by_stage.most_common():
        print(f"{st:<20}{dur/1e3:>10.2f}{dur/1e3/n:>10.3f}"
              f"{dur/1e3/max(kf_frames,1):>9.3f}{op_count[st]:>8}")
    print(f"{'TOTAL':<20}{total/1e3:>10.2f}{total/1e3/n:>10.3f}")
    print(f"trace span: {span_us/1e3:.2f} ms -> device busy {100*total/max(span_us,1):.1f}%")
    print(f"device ms/frame (busy): {total/1e3/n:.3f}")
    print("\n=== top ops ===")
    for (st, op), dur in by_op.most_common(25):
        print(f"  {dur/1e3:>8.2f} ms  {st:<18} {op}")
    return total


def trace_scan(jax, jnp, args, device_frames, matched=False):
    """Trace ONE process_chunk program over the bench frames (the scan-fused
    execution mode that usually sets the headline fps)."""
    from legoslam_tpu.pipeline import backend as backend_mod
    from legoslam_tpu.pipeline import frontend as frontend_mod
    from legoslam_tpu.pipeline import visual_odometry as vo_mod
    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
    from legoslam_tpu.pipeline.state import Capacities
    from legoslam_tpu.utils.config import Config

    config = Config({
        "stereo_depth_inferior_limit": 2.0,
        "stereo_depth_superior_limit": 60.0,
    })
    cfg = frontend_mod.FrontendConfig.from_config(config)
    ba_cfg = backend_mod.BAConfig(
        assembly_precision=str(config["ba_assembly_precision"])
    )
    inline_ba = True
    if matched:
        cfg = cfg._replace(
            caps=Capacities(max_features=192),
            gftt=cfg.gftt._replace(max_corners=150),
        )
        inline_ba = False
    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset as _DS
    rig = _DS(n_frames=2, shape=(188, 620), focal=360.0, baseline=0.54).rig

    jitted = jax.jit(
        lambda c, l, r, fid: vo_mod.process_chunk(
            cfg, rig, c, l, r, fid, ba_cfg=ba_cfg, inline_ba=inline_ba
        ),
        donate_argnums=(0,),
    )

    def fresh_carry():
        c = vo_mod.initial_carry(cfg, (188, 620))
        step = jax.jit(
            lambda c, l, r, fid: vo_mod.process_frame(
                cfg, rig, c, l, r, fid, ba_cfg=ba_cfg, inline_ba=inline_ba
            ),
            donate_argnums=(0,),
        )
        for i in range(4):
            l, r = device_frames[i]
            c, _ = step(c, l, r, jnp.asarray(i, jnp.int32))
        jax.block_until_ready(c)
        return c

    il = jnp.stack([f[0] for f in device_frames[4:]])
    ir = jnp.stack([f[1] for f in device_frames[4:]])
    fids = jnp.arange(4, len(device_frames), dtype=jnp.int32)
    n = int(il.shape[0])

    c, outs = jitted(fresh_carry(), il, ir, fids)   # compile
    jax.block_until_ready(outs.status)
    kf = int(np.sum(np.asarray(outs.kf_inserted)))
    c2 = fresh_carry()
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        c2, outs = jitted(c2, il, ir, fids)
        jax.block_until_ready(outs.status)
    events, span_us = parse_trace(args.trace_dir)
    print_table(events, span_us, n, kf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--trace-dir", default="/tmp/legoslam_trace")
    ap.add_argument("--matched", action="store_true",
                    help="trace the matched-workload bench config instead")
    ap.add_argument("--scan", action="store_true",
                    help="trace the scan-fused chunk program (process_chunk) "
                         "instead of the per-frame stepwise program")
    args = ap.parse_args()

    jax, jnp, jitted, carry, device_frames = build_step(matched=args.matched)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    if args.scan:
        trace_scan(jax, jnp, args, device_frames, matched=args.matched)
        return

    # Warmup/compile.
    for i in range(4):
        l, r = device_frames[i]
        carry, out = jitted(carry, l, r, jnp.asarray(i, jnp.int32))
    jax.block_until_ready(carry)

    # FLOP estimate of one compiled step (XLA cost analysis).
    try:
        l, r = device_frames[4]
        lowered = jax.jit(lambda c, a, b, f: jitted(c, a, b, f)).lower(
            carry, l, r, jnp.asarray(4, jnp.int32)
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", float("nan")))
    except Exception as e:
        print(f"cost_analysis failed: {e}", file=sys.stderr)
        flops_per_step = float("nan")

    os.makedirs(args.trace_dir, exist_ok=True)
    n = min(args.frames, len(device_frames) - 4)
    with jax.profiler.trace(args.trace_dir):
        statuses = []
        for i in range(4, 4 + n):
            l, r = device_frames[i]
            carry, out = jitted(carry, l, r, jnp.asarray(i, jnp.int32))
            statuses.append(out.kf_inserted)
        jax.block_until_ready(carry)
    kf_frames = int(np.sum([bool(s) for s in statuses]))
    print(f"traced {n} frames ({kf_frames} keyframe frames)", file=sys.stderr)

    events, span_us = parse_trace(args.trace_dir)
    if not events:
        print("no device events parsed", file=sys.stderr)
        return

    by_stage = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    total = 0.0
    for name, tf_op, dur, ts in events:
        st = classify(tf_op)
        by_stage[st] += dur
        by_op[(st, name.split(".")[0])] += dur
        op_count[st] += 1
        total += dur

    print(f"\n=== device time by stage ({n} frames, {kf_frames} keyframes) ===")
    print(f"{'stage':<20}{'total ms':>10}{'ms/frame':>10}{'ms/kf':>9}{'ops':>8}")
    for st, dur in by_stage.most_common():
        print(f"{st:<20}{dur/1e3:>10.2f}{dur/1e3/n:>10.3f}"
              f"{dur/1e3/max(kf_frames,1):>9.3f}{op_count[st]:>8}")
    print(f"{'TOTAL':<20}{total/1e3:>10.2f}{total/1e3/n:>10.3f}")
    print(f"trace span: {span_us/1e3:.2f} ms -> device busy {100*total/max(span_us,1):.1f}%")
    print(f"device ms/frame (busy): {total/1e3/n:.3f}")

    if np.isfinite(flops_per_step):
        flops_per_sec = flops_per_step / (total / 1e6 / n)
        print(f"\nXLA cost analysis: {flops_per_step/1e9:.3f} GFLOP/step (tracking-frame program)")
        print(f"achieved {flops_per_sec/1e12:.3f} TFLOP/s over busy device time")
        print(f"MFU vs bf16 peak (197 TF): {100*flops_per_sec/PEAK_BF16:.2f}%")

    print("\n=== top ops ===")
    for (st, op), dur in by_op.most_common(25):
        print(f"  {dur/1e3:>8.2f} ms  {st:<18} {op}")


if __name__ == "__main__":
    main()
