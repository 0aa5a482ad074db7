"""Pre-render bbox conditioning frames for a dataset.

Behavioral parity: /root/reference/tools/preprocessing/preprocess_dataset.py
— render every frame's bbox image into the dataset's preplotted-bbox dir
(kitti bbox_02 / vkitti bbox / bdd100k bbox/track) so training doesn't pay
rasterization per step. Rendering uses the XLA rasterizer (batched over
frames on device) instead of per-frame cv2 calls.
"""

from __future__ import annotations

import os

from common import build_models  # noqa: F401  (sys.path setup)

import numpy as np
from PIL import Image

from ctrlv_tpu.data import build_dataset
from ctrlv_tpu.utils.config import parse_args


def main(cfg=None):
    cfg = cfg or parse_args()
    ds = build_dataset(
        cfg.dataset_name, cfg.data_root, if_train=True, data_type="image",
        clip_length=cfg.clip_length, train_H=cfg.train_H, train_W=cfg.train_W,
        use_preplotted_bbox=False,
    )
    n = ds.num_frames_total()
    print(f"rendering {n} bbox frames for {cfg.dataset_name}")
    is_nusc = cfg.dataset_name == "nuscenes"
    for i in range(n):
        if is_nusc:
            # nuScenes renders my_render_3d_style frames cached by token
            # (reference nuscenes_.py:354-384); already [0,1]
            token = ds._token_at(i, 0)
            frame01 = ds.render_nusc_bbox_frame(token)
            out_path = ds.get_bbox_image_file_by_index(i) or os.path.join(
                cfg.output_dir, "bbox_frames", f"{token}.png"
            )
        else:
            labels = ds.get_labels_by_index(i)
            calib = ds.get_calib_by_index(i)
            frame01 = ds.render_bbox_frame(labels, calib) * 0.5 + 0.5  # [-1,1]
            out_path = ds.get_bbox_image_file_by_index(i) or os.path.join(
                cfg.output_dir, "bbox_frames", f"{i:08d}.png"
            )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        img = (np.clip(frame01, 0.0, 1.0) * 255).astype(np.uint8)
        Image.fromarray(img).save(out_path)
        if i % 100 == 0:
            print(f"{i}/{n}")


if __name__ == "__main__":
    main()
