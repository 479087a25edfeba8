"""Drift diagnosis round 2: per-frame error decomposition (t_xyz, rotation),
landmark depth-error statistics for the tracked inlier set, keyframe cadence.
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

from legoslam_tpu.geometry import se3
from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
from legoslam_tpu.pipeline.visual_odometry import VisualOdometry
from legoslam_tpu.utils.config import Config
from legoslam_tpu.pipeline.state import Capacities

SMALL_CAPS = Capacities(max_features=320, window=8, active_landmarks=1024, landmarks=8192)

N = int(os.environ.get("N_FRAMES", 26))
SPEED = float(os.environ.get("SPEED", 0.25))
TRACK_MODE = os.environ.get("TRACK_MODE", "anchored")
INLINE_BA = os.environ.get("INLINE_BA", "0") == "1"

ds = SyntheticPlanesDataset(n_frames=N, shape=(160, 240), focal=260.0, baseline=0.54, speed=SPEED)
config = Config({
    "max_features": SMALL_CAPS.max_features,
    "keyframe_window_capacity": SMALL_CAPS.window,
    "max_active_landmarks": SMALL_CAPS.active_landmarks,
    "max_landmarks": SMALL_CAPS.landmarks,
    "num_active_keyframes": 7,
    "stereo_depth_inferior_limit": 2.0,
    "stereo_depth_superior_limit": 50.0,
    "detect_mask_half": 6,
    "gftt_min_distance": 6,
    "track_mode": TRACK_MODE,
})
vo = VisualOdometry(config=config, dataset=ds, inline_ba=INLINE_BA)
assert vo.init()

print(f"mode={TRACK_MODE} ba={INLINE_BA} speed={SPEED}")
prev_T = np.eye(4)
while True:
    fr = ds.next_frame()
    if fr is None:
        break
    out = vo.process(fr)
    i = fr.frame_id
    T_cw = np.asarray(out.T_cw)
    gt_T_wc = ds.gt_T_wc[i]
    # absolute error
    E = gt_T_wc @ T_cw  # should be identity
    t_err = E[:3, 3]
    r_err = np.asarray(se3.se3_log(jnp.asarray(E)))[3:]
    # relative error vs gt relative motion
    gt_prev = ds.gt_T_wc[max(i - 1, 0)]
    rel_est = T_cw @ np.linalg.inv(prev_T)  # cur_cw @ wc_prev = T(cur<-prev)
    rel_gt = np.linalg.inv(gt_T_wc) @ gt_prev
    RE = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(rel_gt) @ rel_est)))
    prev_T = T_cw

    # landmark stats for currently linked features
    feats = vo.carry.feats
    wmap = vo.carry.wmap
    mask = np.asarray(feats.valid & (feats.lm >= 0))
    lm_ids = np.asarray(feats.lm)[mask]
    lm_p = np.asarray(wmap.lm_pos)[lm_ids]
    # project into GT camera to get gt depth at those pixels
    T_gt_cw = np.linalg.inv(gt_T_wc)
    p_cam = (T_gt_cw[:3, :3] @ lm_p.T + T_gt_cw[:3, 3:]).T
    uv = np.asarray(feats.uv)[mask]
    depth_gt = ds.render_depth(i)
    zi = depth_gt[np.clip(uv[:, 1].astype(int), 0, 159), np.clip(uv[:, 0].astype(int), 0, 239)]
    zrel = np.abs(p_cam[:, 2] - zi) / np.maximum(zi, 1e-6)
    zrel = zrel[np.isfinite(zrel)]
    n_lm = mask.sum()
    med_z = np.median(p_cam[:, 2]) if n_lm else 0.0
    med_zerr = np.median(zrel) if len(zrel) else -1
    p90_zerr = np.percentile(zrel, 90) if len(zrel) else -1
    print(
        f"f{i:03d} st={int(out.status)} kf={int(out.kf_inserted)} inl={int(out.n_inliers):3d} "
        f"nlm={n_lm:3d} medz={med_z:5.1f} zerr(med/p90)={med_zerr:.3f}/{p90_zerr:.3f} "
        f"|terr|={np.linalg.norm(t_err):7.4f} t=({t_err[0]:+.3f},{t_err[1]:+.3f},{t_err[2]:+.3f}) "
        f"|rerr|={np.linalg.norm(r_err):.4f} relerr={np.linalg.norm(RE):.4f}"
    )
