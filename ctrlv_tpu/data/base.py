"""Abstract video dataset: transforms, clip assembly, bbox-frame rendering.

Behavioral parity: KittiAbstract
(/root/reference/src/ctrlv/datasets/kitti_abstract.py:11-256):
  - transform = resize to (train_H=320, train_W=512) + scale to [-1,1],
  - clip assembly from per-frame files with non-overlapping option,
  - per-frame label dicts (type/truncated/occluded/alpha/bbox/dimensions/
    location/rotation_y/id_type/trackID),
  - on-the-fly bbox-frame rasterization (here: the XLA rasterizer in
    ctrlv_tpu.ops.rasterize instead of cv2) or preplotted image loading,
  - trajectory frames for the last-frame-trajectory option.

Host-side IO (PIL, numpy) stays on CPU; rendering runs on device.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


FrameLabel = Dict[str, object]  # one object's label dict


@dataclasses.dataclass
class VideoDataset:
    """Base class. Subclasses implement the per-dataset indexing/parsing."""

    root: str = "."
    train: bool = True
    data_type: str = "clip"  # "image" | "clip"
    clip_length: int = 25
    if_return_bbox_im: bool = False
    train_H: int = 320
    train_W: int = 512
    use_preplotted_bbox: bool = True
    non_overlapping_clips: bool = False
    if_last_frame_trajectory: bool = False

    # subclass-populated
    orig_H: int = 375
    orig_W: int = 1242
    fps: int = 7

    # ------------------------------------------------------------------
    # transforms
    def load_image(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB").resize((self.train_W, self.train_H))
        return self.to_tensor(np.asarray(img, np.float32) / 255.0)

    @staticmethod
    def to_tensor(img01: np.ndarray) -> np.ndarray:
        """[0,1] (H,W,3) -> [-1,1] float32 (channels-last, TPU layout)."""
        return (np.asarray(img01, np.float32) - 0.5) / 0.5

    @staticmethod
    def revert_transform(img: np.ndarray) -> np.ndarray:
        """[-1,1] -> [0,1]."""
        return np.clip(img * 0.5 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------------
    # subclass interface
    def num_frames_total(self) -> int:
        raise NotImplementedError

    def get_frame_file_by_index(self, index: int, offset: int = 0) -> str:
        """Resolve (clip index, frame offset) -> image path."""
        raise NotImplementedError

    def get_labels_by_index(self, index: int, offset: int = 0) -> Optional[List[FrameLabel]]:
        raise NotImplementedError

    def get_calib_by_index(self, index: int) -> Optional[np.ndarray]:
        return None

    def get_bbox_image_file_by_index(self, index: int = None, image_file=None) -> Optional[str]:
        return None

    def get_prompt(self, index: int) -> str:
        return "A driving scene."

    def __len__(self) -> int:
        if self.data_type == "image":
            return self.num_frames_total()
        if self.non_overlapping_clips:
            return self.num_frames_total() // self.clip_length
        return max(self.num_frames_total() - self.clip_length + 1, 0)

    def _clip_start(self, index: int) -> int:
        return index * self.clip_length if self.non_overlapping_clips else index

    # ------------------------------------------------------------------
    def render_bbox_frame(
        self, labels: Optional[List[FrameLabel]], calib: Optional[np.ndarray]
    ) -> np.ndarray:
        """Rasterize one conditioning frame -> [-1,1] numpy.

        Host path prefers the native C++ rasterizer (no device round-trip
        per frame in __getitem__); falls back to the XLA kernel. Both are
        bit-matched (tests/test_native.py).
        """
        from ..data.collate import objects_to_arrays
        from ..ops.rasterize import TYPE_COLORS, project_boxes_3d_np, track_color

        arrays = objects_to_arrays([labels])
        sx = self.train_W / self.orig_W
        sy = self.train_H / self.orig_H
        bbox = (arrays["bbox"][0] * np.asarray([sx, sy, sx, sy], np.float32))
        if calib is None:
            corners = np.full((bbox.shape[0], 8, 2), -1e4, np.float32)
        else:
            calib_used = np.asarray(calib, np.float32)
            if calib_used.shape != (3, 4):
                calib_used = np.pad(calib_used, ((0, 0), (0, 1)))
            calib_used = np.diag([sx, sy, 1.0]).astype(np.float32) @ calib_used
            corners = project_boxes_3d_np(
                arrays["locations"][0], arrays["dimensions"][0],
                arrays["rotation_y"][0], calib_used,
            )
        n = bbox.shape[0]
        valid = np.arange(n) < arrays["num_objects"][0]
        tcol = np.asarray(TYPE_COLORS)[
            np.clip(arrays["id_type"][0], 0, len(TYPE_COLORS) - 1)
        ].astype(np.float32)
        kcol = np.asarray(track_color(np.asarray(arrays["track_id"][0])), np.float32)

        from .native import load_native, rasterize_frame_native

        if load_native() is not None:
            frame = rasterize_frame_native(
                corners, bbox, valid, tcol, kcol,
                height=self.train_H, width=self.train_W,
            )
        else:
            import jax.numpy as jnp

            from ..ops.rasterize import rasterize_frame

            frame = np.asarray(
                rasterize_frame(
                    jnp.asarray(corners), jnp.asarray(bbox), jnp.asarray(valid),
                    jnp.asarray(tcol), jnp.asarray(kcol),
                    height=self.train_H, width=self.train_W,
                )
            )
        return self.to_tensor(frame)

    def load_bbox_frame(
        self, index: int, offset: int, labels, calib
    ) -> np.ndarray:
        path = None
        if self.use_preplotted_bbox:
            try:
                path = self.get_bbox_image_file_by_index(
                    image_file=self.get_frame_file_by_index(index, offset)
                )
            except TypeError:
                path = self.get_bbox_image_file_by_index(index)
        if path is not None and os.path.exists(path):
            return self.load_image(path)
        return self.render_bbox_frame(labels, calib)

    # ------------------------------------------------------------------
    def __getitem__(self, index: int) -> dict:
        if self.data_type == "image":
            img = self.load_image(self.get_frame_file_by_index(index))
            labels = self.get_labels_by_index(index)
            return dict(
                clip=img,
                labels=[labels],
                prompt=self.get_prompt(index),
                index=index,
                bbox_images=None,
            )

        calib = self.get_calib_by_index(index)
        frames, labels_per_frame, bbox_frames = [], [], []
        for off in range(self.clip_length):
            frames.append(self.load_image(self.get_frame_file_by_index(index, off)))
            labels = self.get_labels_by_index(index, off)
            labels_per_frame.append(labels)
            if self.if_return_bbox_im:
                bbox_frames.append(self.load_bbox_frame(index, off, labels, calib))

        sample = dict(
            clip=np.stack(frames),
            labels=labels_per_frame,
            prompt=self.get_prompt(index),
            index=index,
            cam_to_img=calib,
        )
        if self.if_return_bbox_im:
            if self.if_last_frame_trajectory:
                bbox_frames[-1] = self.render_trajectory_frame(
                    labels_per_frame[-1]
                )
            sample["bbox_images"] = np.stack(bbox_frames)
        return sample

    def render_trajectory_frame(self, labels: Optional[List[FrameLabel]]) -> np.ndarray:
        from ..data.collate import objects_to_arrays
        from ..ops.rasterize import rasterize_trajectory_frame, track_color, TYPE_COLORS
        import jax.numpy as jnp

        arrays = objects_to_arrays([labels])
        sx = self.train_W / self.orig_W
        sy = self.train_H / self.orig_H
        bbox = arrays["bbox"][0] * np.asarray([sx, sy, sx, sy], np.float32)
        centers = np.stack(
            [(bbox[:, 0] + bbox[:, 2]) / 2, (bbox[:, 1] + bbox[:, 3]) / 2], axis=-1
        )
        valid = np.arange(centers.shape[0]) < arrays["num_objects"][0]
        tcol = np.asarray(TYPE_COLORS)[
            np.clip(arrays["id_type"][0], 0, len(TYPE_COLORS) - 1)
        ]
        kcol = np.asarray(track_color(jnp.asarray(arrays["track_id"][0])))
        frame = rasterize_trajectory_frame(
            jnp.asarray(centers),
            jnp.asarray(valid),
            jnp.asarray(tcol),
            jnp.asarray(kcol),
            height=self.train_H,
            width=self.train_W,
        )
        return self.to_tensor(np.asarray(frame))
