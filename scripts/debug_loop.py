"""Diagnose the loop-closure e2e failure: run the closed arm of
tests/test_loop_closure.py with instrumentation and dump every intermediate
to /tmp/loopdbg.npz for offline analysis."""

import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_loop_closure import loop_trajectory, SHAPE, FOCAL

from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
from legoslam_tpu.pipeline import loop_closure as lc_mod
from legoslam_tpu.pipeline.visual_odometry import VisualOdometry
from legoslam_tpu.utils import evaluation
from legoslam_tpu.utils.config import Config

traj = loop_trajectory()
base = {
    "max_features": 320,
    "keyframe_window_capacity": 8,
    "max_active_landmarks": 1536,
    "max_landmarks": 16384,
    "num_active_keyframes": 7,
    "stereo_depth_inferior_limit": 2.0,
    "stereo_depth_superior_limit": 50.0,
    "detect_mask_half": 6,
    "gftt_min_distance": 6,
    "use_loop_closure": True,
    "loop_zncc_min": 0.5,
}

dump = {}

orig_optimize = lc_mod.LoopCloser._optimize
orig_verify = lc_mod.LoopCloser._verify


def patched_verify(self, j):
    ok, M, n_in = orig_verify(self, j)
    if ok:
        i = len(self.records) - 1
        dump.setdefault("verify", []).append(
            dict(i=i, j=j, M=np.asarray(M), n_in=n_in,
                 T_i_stored=self.records[i].T_cw.copy(),
                 T_j_stored=self.records[j].T_cw.copy(),
                 fid_i=self.records[i].frame_id,
                 fid_j=self.records[j].frame_id)
        )
    return ok, M, n_in


def patched_optimize(self):
    pre = np.stack([r.T_cw for r in self.records])
    fids = np.array([r.frame_id for r in self.records])
    corrected = orig_optimize(self)
    dump.setdefault("opt", []).append(
        dict(pre=pre, post=corrected.copy(), fids=fids,
             loop_edges=[(i, j, M.copy()) for (i, j, M) in self.loop_edges])
    )
    return corrected


lc_mod.LoopCloser._optimize = patched_optimize
lc_mod.LoopCloser._verify = patched_verify

for zncc in (1.1, 0.5):
    ds = SyntheticPlanesDataset(
        shape=SHAPE, focal=FOCAL, baseline=0.54,
        half_width=20.0, length=30.0, z_min=-25.0, trajectory=traj,
    )
    vo = VisualOdometry(config=Config({**base, "loop_zncc_min": zncc}), dataset=ds)
    assert vo.init()
    vo.run()
    est = vo.trajectory_T_wc()
    full_ate = evaluation.ate_rmse(est[:, :3, 3], traj[: len(est), :3, 3])
    ids, kf_T_cw = vo.keyframe_trajectory()
    kf_wc = np.linalg.inv(kf_T_cw)
    kf_ate = evaluation.ate_rmse(kf_wc[:, :3, 3], traj[ids][:, :3, 3])
    print(f"zncc={zncc}: full ATE", full_ate, "kf ATE", kf_ate, "stats", vo.loop_closer.stats)

np.savez(
    "/tmp/loopdbg.npz",
    traj=traj,
    est=est,
    kf_ids=np.array(ids),
    kf_T_cw=kf_T_cw,
    n_verify=len(dump.get("verify", [])),
    n_opt=len(dump.get("opt", [])),
)
import pickle
with open("/tmp/loopdbg.pkl", "wb") as f:
    pickle.dump(dump, f)
print("dumped", len(dump.get("verify", [])), "verifications,", len(dump.get("opt", [])), "optimizations")
