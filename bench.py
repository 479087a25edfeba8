"""Benchmark: end-to-end SLAM frame throughput on the available accelerator.

Runs the fused per-frame SLAM step (anchored pyramid KLT + motion-only pose
LM + keyframe detection/stereo/triangulation + inline sliding-window BA) over
a KITTI-half-resolution-sized stereo sequence and reports steady-state
frames/s as ONE JSON line on stdout.

Baseline: the reference (zha0ming1e/LEGO-SLAM) publishes no throughput
numbers (BASELINE.md); its pipeline is visually paced by the viewer's
cv::waitKey(120) (viewer.cpp:76-79), i.e. at most 8.33 frames/s end-to-end.
That 8.33 fps is used as the reference baseline here.

Frames come from the procedural plane-world renderer (KITTI imagery is not
present on this machine); set LEGOSLAM_KITTI_DIR to bench on a real KITTI
sequence instead.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_FPS = 8.33  # viewer-paced reference loop (viewer.cpp:76-79)
SHAPE = (188, 620)    # KITTI half resolution (dataset.cpp:76)
N_FRAMES = 40
WARMUP = 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dataset():
    kitti_dir = os.environ.get("LEGOSLAM_KITTI_DIR")
    if kitti_dir:
        from legoslam_tpu.pipeline.dataset import KittiDataset

        ds = KittiDataset(kitti_dir)
        if ds.init():
            log(f"bench: KITTI sequence at {kitti_dir}")
            return ds
        log("bench: KITTI init failed, falling back to synthetic")
    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset

    return SyntheticPlanesDataset(
        n_frames=N_FRAMES, shape=SHAPE, focal=360.0, baseline=0.54, speed=0.12,
        half_width=10.0, length=200.0,
    )


def load_frames(ds):
    """Pre-render/pre-decode all frames (host I/O is outside the timing)."""
    cache = None
    if ds.__class__.__name__ == "SyntheticPlanesDataset":
        cache = f"/tmp/legoslam_bench_{SHAPE[0]}x{SHAPE[1]}_{N_FRAMES}.npz"
        if os.path.exists(cache):
            data = np.load(cache)
            return list(zip(data["left"], data["right"]))
    frames = []
    ds.init()
    for _ in range(N_FRAMES):
        fr = ds.next_frame()
        if fr is None:
            break
        frames.append((fr.left, fr.right))
    if cache:
        np.savez_compressed(
            cache,
            left=np.stack([f[0] for f in frames]),
            right=np.stack([f[1] for f in frames]),
        )
    return frames


def main():
    import jax

    # Persistent compilation cache: the fused frame step is a large program;
    # repeat runs (driver re-benches every round) skip the multi-minute compile.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/legoslam_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"bench: compilation cache unavailable: {e}")

    import jax.numpy as jnp

    from legoslam_tpu.pipeline import frontend as frontend_mod
    from legoslam_tpu.pipeline import visual_odometry as vo_mod
    from legoslam_tpu.utils.config import Config

    ds = make_dataset()
    t0 = time.perf_counter()
    frames = load_frames(ds)
    log(f"bench: {len(frames)} frames prepared in {time.perf_counter() - t0:.1f}s; "
        f"device={jax.devices()[0]}")

    config = Config({
        "stereo_depth_inferior_limit": 2.0,
        "stereo_depth_superior_limit": 60.0,
    })
    cfg = frontend_mod.FrontendConfig.from_config(config)
    rig = ds.rig

    def step(carry, img_l, img_r, frame_id):
        return vo_mod.process_frame(cfg, rig, carry, img_l, img_r, frame_id, inline_ba=True)

    jitted = jax.jit(step, donate_argnums=(0,))
    carry = vo_mod.initial_carry(cfg, frames[0][0].shape)

    # Upload all frames once (the timed loop measures compute, not PCIe).
    device_frames = [
        (jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32)) for l, r in frames
    ]

    t0 = time.perf_counter()
    for i in range(WARMUP):
        l, r = device_frames[i % len(device_frames)]
        carry, out = jitted(carry, l, r, jnp.asarray(i, jnp.int32))
    jax.block_until_ready(carry)
    log(f"bench: warmup/compile {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    outs = []
    n = len(device_frames) - WARMUP
    for i in range(WARMUP, len(device_frames)):
        l, r = device_frames[i]
        carry, out = jitted(carry, l, r, jnp.asarray(i, jnp.int32))
        outs.append(out.status)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    fps = n / dt

    statuses = [int(s) for s in outs]
    good = sum(1 for s in statuses if s in (1, 2)) / max(1, len(statuses))
    log(f"bench: {n} frames in {dt:.2f}s -> {fps:.2f} fps ({1e3 * dt / n:.2f} ms/frame), "
        f"tracking ratio {good:.2f}")

    print(json.dumps({
        "metric": "slam_frames_per_second",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
