"""Headless viewer / visualization.

The reference runs a Pangolin GL thread drawing the current frame frustum,
keyframes, trajectory and landmarks, plus an OpenCV window of tracked
features (src/viewer.cpp).  A GL window makes no sense on a TPU host, so the
TPU-native equivalent collects the same data (trajectory, keyframe poses,
landmark cloud, per-frame feature overlays) and renders them to image files
on demand — the artifacts reviewers actually consume from a headless run.

`Viewer.add_current_frame` / `Viewer.update_map` mirror the reference's API
(viewer.h:24-31); everything is host-side and optional (matplotlib-gated).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from legoslam_tpu.utils.logging import get_logger

log = get_logger("legoslam.viewer")


class Viewer:
    def __init__(self, every_n: int = 1):
        self.every_n = every_n
        self.trajectory: List[np.ndarray] = []   # T_cw per frame
        self.keyframe_poses: Optional[np.ndarray] = None
        self.landmarks: Optional[np.ndarray] = None
        self.last_frame_img: Optional[np.ndarray] = None
        self.last_features: Optional[np.ndarray] = None
        self._n = 0

    # --- reference-style API -------------------------------------------------
    def add_current_frame(self, T_cw, img=None, feature_uv=None, feature_valid=None) -> None:
        """Viewer::AddCurrentFrame (viewer.cpp:19-22)."""
        self.trajectory.append(np.asarray(T_cw, np.float64))
        self._n += 1
        if img is not None and (self._n % self.every_n == 0):
            self.last_frame_img = np.asarray(img)
            if feature_uv is not None:
                uv = np.asarray(feature_uv)
                mask = np.asarray(feature_valid) if feature_valid is not None else np.ones(len(uv), bool)
                self.last_features = uv[mask]

    def update_map(self, keyframe_poses, keyframe_valid, lm_pos, lm_alive) -> None:
        """Viewer::UpdateMap (viewer.cpp:24-36): snapshot keyframes+landmarks."""
        kv = np.asarray(keyframe_valid)
        self.keyframe_poses = np.asarray(keyframe_poses)[kv]
        alive = np.asarray(lm_alive)
        self.landmarks = np.asarray(lm_pos)[alive]

    # --- rendering -----------------------------------------------------------
    def save(self, out_dir: str, ground_truth: Optional[np.ndarray] = None) -> List[str]:
        """Write trajectory / map / feature-overlay images; returns paths."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            log.warning("matplotlib unavailable; viewer output skipped")
            return []

        os.makedirs(out_dir, exist_ok=True)
        paths = []

        if self.trajectory:
            T_wc = np.linalg.inv(np.stack(self.trajectory))
            pos = T_wc[:, :3, 3]
            fig, ax = plt.subplots(figsize=(7, 7))
            ax.plot(pos[:, 0], pos[:, 2], "b-", lw=1.5, label="estimate")
            if ground_truth is not None:
                gt = np.asarray(ground_truth)[:, :3, 3]
                ax.plot(gt[:, 0], gt[:, 2], "k--", lw=1.0, label="ground truth")
            if self.keyframe_poses is not None and len(self.keyframe_poses):
                kf = np.linalg.inv(self.keyframe_poses)[:, :3, 3]
                ax.plot(kf[:, 0], kf[:, 2], "g^", ms=6, label="active keyframes")
            if self.landmarks is not None and len(self.landmarks):
                ax.plot(self.landmarks[:, 0], self.landmarks[:, 2], "r.", ms=1, alpha=0.4, label="landmarks")
            ax.set_xlabel("x [m]")
            ax.set_ylabel("z [m]")
            ax.axis("equal")
            ax.legend()
            ax.set_title("legoslam_tpu trajectory (top view)")
            p = os.path.join(out_dir, "trajectory.png")
            fig.savefig(p, dpi=120, bbox_inches="tight")
            plt.close(fig)
            paths.append(p)

        if self.last_frame_img is not None:
            fig, ax = plt.subplots(figsize=(10, 4))
            ax.imshow(self.last_frame_img, cmap="gray")
            if self.last_features is not None and len(self.last_features):
                ax.plot(self.last_features[:, 0], self.last_features[:, 1], "g+", ms=6)
            ax.set_title("tracked features (last frame)")
            ax.axis("off")
            p = os.path.join(out_dir, "features.png")
            fig.savefig(p, dpi=120, bbox_inches="tight")
            plt.close(fig)
            paths.append(p)

        return paths
