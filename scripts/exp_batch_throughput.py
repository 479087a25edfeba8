"""Experiment: batched multi-sequence VO throughput on one chip.

vmaps the fused frame step over B independent sequences and measures
aggregate frames/s vs the single-stream number.  This is the TPU-native
scaling axis the reference cannot express: its threads saturate at one
sequence per core.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/legoslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from legoslam_tpu.pipeline import frontend as frontend_mod
from legoslam_tpu.pipeline import visual_odometry as vo_mod
from legoslam_tpu.utils.config import Config

SHAPE = (188, 620)
N_FRAMES = 24
WARMUP = 4


def frames():
    cache = f"/tmp/legoslam_bench_{SHAPE[0]}x{SHAPE[1]}_40.npz"
    data = np.load(cache)
    return data["left"][:N_FRAMES], data["right"][:N_FRAMES]


def main():
    inline_ba = "--ba" in sys.argv
    Bs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 32]
    left, right = frames()
    config = Config({"stereo_depth_inferior_limit": 2.0, "stereo_depth_superior_limit": 60.0})
    cfg = frontend_mod.FrontendConfig.from_config(config)
    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset

    ds = SyntheticPlanesDataset(n_frames=2, shape=SHAPE, focal=360.0, baseline=0.54)
    ds.init()
    rig = ds.rig

    for B in Bs:
        def step1(carry, il, ir, fid):
            return vo_mod.process_frame(cfg, rig, carry, il, ir, fid, inline_ba=inline_ba)

        step = jax.jit(jax.vmap(step1, in_axes=(0, 0, 0, None)), donate_argnums=(0,))
        carry0 = vo_mod.initial_carry(cfg, SHAPE)
        carry = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), carry0)
        # Shift each sequence's frames by one so batches aren't identical work.
        dl = [jnp.asarray(np.stack([left[(i + b) % N_FRAMES] for b in range(B)]), jnp.float32)
              for i in range(N_FRAMES)]
        dr = [jnp.asarray(np.stack([right[(i + b) % N_FRAMES] for b in range(B)]), jnp.float32)
              for i in range(N_FRAMES)]
        for i in range(WARMUP):
            carry, out = step(carry, dl[i], dr[i], jnp.asarray(i, jnp.int32))
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        n = N_FRAMES - WARMUP
        for i in range(WARMUP, N_FRAMES):
            carry, out = step(carry, dl[i], dr[i], jnp.asarray(i, jnp.int32))
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        ok = float(jnp.mean((out.status == 1) | (out.status == 2)))
        print(f"B={B:4d} ba={inline_ba}: {1e3*dt/n:7.2f} ms/step  "
              f"{B*n/dt:9.1f} agg fps  tracking_ok={ok:.2f}")


if __name__ == "__main__":
    main()
