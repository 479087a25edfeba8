"""Diagnose long-horizon drift on the synthetic corridor (VERDICT item 1).

Runs the 40-frame scenario from tests/test_pipeline.py::test_vo_long_horizon
with per-frame instrumentation, in several configurations, to isolate the
feedback loop: BA on/off, anchored/frame tracking, marg on/off.
"""

import os, sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
from legoslam_tpu.pipeline.visual_odometry import VisualOdometry, FrontendStatus
from legoslam_tpu.utils.config import Config
from legoslam_tpu.utils import evaluation
from legoslam_tpu.pipeline.state import Capacities

SMALL_CAPS = Capacities(max_features=320, window=8, active_landmarks=1024, landmarks=8192)
SCENE = dict(
    stereo_depth_inferior_limit=2.0,
    stereo_depth_superior_limit=50.0,
    detect_mask_half=6,
    gftt_min_distance=6,
)

N_FRAMES = int(os.environ.get("N_FRAMES", 40))


def make_dataset():
    return SyntheticPlanesDataset(
        n_frames=N_FRAMES, shape=(160, 240), focal=260.0, baseline=0.54, speed=0.25
    )


def run(label, inline_ba, **overrides):
    ds = make_dataset()
    config = Config({
        "max_features": SMALL_CAPS.max_features,
        "keyframe_window_capacity": SMALL_CAPS.window,
        "max_active_landmarks": SMALL_CAPS.active_landmarks,
        "max_landmarks": SMALL_CAPS.landmarks,
        "num_active_keyframes": 7,
        **SCENE,
        **overrides,
    })
    vo = VisualOdometry(config=config, dataset=ds, inline_ba=inline_ba)
    assert vo.init()
    vo.run()
    est_wc = vo.trajectory_T_wc()
    gt = ds.gt_T_wc
    n = min(len(est_wc), len(gt))
    ate = evaluation.ate_rmse(est_wc[:n, :3, 3], gt[:n, :3, 3])
    print(f"\n=== {label}: ATE={ate:.4f} m ===")
    statuses = vo.statuses()
    for i, o in enumerate(vo.outputs):
        err = np.linalg.norm(est_wc[i, :3, 3] - gt[i, :3, 3])
        chi = float(o.ba_chi)
        print(
            f"  f{i:03d} st={int(o.status)} kf={int(o.kf_inserted)} "
            f"inl={int(o.n_inliers):3d} ba_chi={chi:10.2f} |t_err|={err:.4f}"
        )
    return ate


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "noba"):
        run("no-BA anchored", inline_ba=False)
    if which in ("all", "ba"):
        run("BA anchored", inline_ba=True)
    if which in ("all", "frame"):
        run("no-BA frame-mode", inline_ba=False, track_mode="frame")
    if which in ("all", "baframe"):
        run("BA frame-mode", inline_ba=True, track_mode="frame")
