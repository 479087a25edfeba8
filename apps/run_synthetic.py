#!/usr/bin/env python
"""Run stereo SLAM on the procedural plane-world sequence (no dataset needed).

Companion to apps/run_kitti.py for machines without KITTI; exercises the full
pipeline and reports ATE against the exact synthetic ground truth.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--speed", type=float, default=0.2)
    ap.add_argument("--out_dir", default="out_synth")
    ap.add_argument("--no_ba", action="store_true")
    args = ap.parse_args()

    from legoslam_tpu.pipeline.dataset import SyntheticPlanesDataset
    from legoslam_tpu.pipeline.visual_odometry import VisualOdometry
    from legoslam_tpu.utils import evaluation
    from legoslam_tpu.utils.config import Config
    from legoslam_tpu.utils.logging import get_logger

    log = get_logger("legoslam.app")
    ds = SyntheticPlanesDataset(n_frames=args.frames, shape=(160, 240), focal=260.0,
                                baseline=0.54, speed=args.speed)
    config = Config({
        "stereo_depth_inferior_limit": 2.0,
        "stereo_depth_superior_limit": 50.0,
        "detect_mask_half": 6,
        "gftt_min_distance": 6,
    })
    vo = VisualOdometry(config=config, dataset=ds, inline_ba=not args.no_ba)
    assert vo.init()
    vo.run()

    est = vo.trajectory_T_wc()
    gt = ds.ground_truth[: len(est)]
    ate = evaluation.ate_rmse(est[:, :3, 3], gt[:, :3, 3])
    log.info("ATE RMSE: %.4f m over %d frames", ate, len(est))
    os.makedirs(args.out_dir, exist_ok=True)
    vo.save_trajectory(os.path.join(args.out_dir, "trajectory_kitti.txt"))
    for p in vo.save_visualization(args.out_dir, ground_truth=gt):
        log.info("wrote %s", p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
