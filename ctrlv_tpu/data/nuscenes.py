"""nuScenes dataset (front camera, 3D boxes projected to image space).

Behavioral parity: /root/reference/src/ctrlv/datasets/nuscenes_.py —
CAM_FRONT keyframes resampled from 12Hz to ~7Hz, 3D box corners projected
through the camera intrinsics with in-front-of-camera clipping, matplotlib-
prerendered bbox frames cached under `bbox_dir`.

The nuscenes devkit is an optional dependency (not in this image): the
class gates on it at construction. The 3D->2D projection math is native
(numpy) so the devkit is only needed for metadata IO.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from .base import VideoDataset


def view_points(points: np.ndarray, view: np.ndarray) -> np.ndarray:
    """Project (3, N) camera-space points through a 3x3 intrinsic."""
    viewpad = np.eye(4)
    viewpad[:3, :3] = view
    nbr = points.shape[1]
    pts = np.concatenate([points, np.ones((1, nbr))])
    pts = viewpad @ pts
    pts = pts[:3]
    return pts[:2] / np.maximum(pts[2:3], 1e-6)


@dataclasses.dataclass
class NuScenesDataset(VideoDataset):
    version: str = "v1.0-trainval"
    bbox_dir: Optional[str] = None
    target_fps: float = 7.0
    max_boxes: int = 30

    def __post_init__(self):
        try:
            from nuscenes.nuscenes import NuScenes  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "NuScenesDataset requires the `nuscenes-devkit` package, which "
                "is not installed in this environment. The projection math "
                "(view_points) and the rest of the pipeline are native; only "
                "metadata IO needs the devkit."
            ) from e
        from nuscenes.nuscenes import NuScenes

        self.orig_H, self.orig_W = 900, 1600
        self.nusc = NuScenes(
            version=self.version, dataroot=os.path.join(self.root, "nuscenes"),
            verbose=False,
        )
        # Front-cam sample_data tokens per scene, resampled 12Hz -> target_fps.
        self.clips: List[List[str]] = []
        step = max(int(round(12.0 / self.target_fps)), 1)
        for scene in self.nusc.scene:
            tokens = []
            sd = self.nusc.get("sample", scene["first_sample_token"])
            cam = self.nusc.get("sample_data", sd["data"]["CAM_FRONT"])
            while cam is not None:
                tokens.append(cam["token"])
                cam = (
                    self.nusc.get("sample_data", cam["next"]) if cam["next"] else None
                )
            tokens = tokens[::step]
            for ci in range(len(tokens) // self.clip_length):
                self.clips.append(
                    tokens[ci * self.clip_length : (ci + 1) * self.clip_length]
                )

    def __len__(self):
        return len(self.clips)

    def num_frames_total(self):
        return len(self.clips) * self.clip_length

    def get_frame_file_by_index(self, index, offset=0):
        token = self.clips[index][offset]
        sd = self.nusc.get("sample_data", token)
        return os.path.join(self.nusc.dataroot, sd["filename"])

    def get_labels_by_index(self, index, offset=0) -> List[dict]:
        token = self.clips[index][offset]
        _, boxes, camera_intrinsic = self.nusc.get_sample_data(token)
        labels = []
        for box in boxes:
            corners = box.corners()  # (3, 8) camera frame
            if (corners[2] < 0.1).any():
                continue  # behind camera
            pts = view_points(corners, camera_intrinsic)
            x1, y1 = pts.min(axis=1)
            x2, y2 = pts.max(axis=1)
            labels.append(
                dict(
                    frame=offset,
                    trackID=hash(box.token) % 10000,
                    type=box.name,
                    truncated=0.0,
                    occluded=0,
                    alpha=0.0,
                    bbox=[float(x1), float(y1), float(x2), float(y2)],
                    dimensions=[float(box.wlh[2]), float(box.wlh[0]), float(box.wlh[1])],
                    location=[float(c) for c in box.center],
                    rotation_y=float(box.orientation.yaw_pitch_roll[0]),
                    id_type=1,
                )
            )
            if len(labels) >= self.max_boxes:
                break
        return labels

    def get_bbox_image_file_by_index(self, index=None, image_file=None):
        if self.bbox_dir is None or image_file is None:
            return None
        return os.path.join(self.bbox_dir, os.path.basename(image_file))

    def get_prompt(self, index):
        return "This is a real-world driving scene."
