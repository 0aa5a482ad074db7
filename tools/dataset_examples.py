"""Dataset smoke walkthrough (non-interactive).

Behavioral parity: /root/reference/tools/preprocessing/dataset_examples.py
— loads each available dataset/collate combination and prints shapes
(instead of dropping into pdb).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.utils.config import parse_args


def main(cfg=None):
    cfg = cfg or parse_args()
    names = ["synthetic", "kitti", "vkitti", "mkitti", "bdd100k", "davis"]
    for name in names:
        try:
            ds, loader = get_dataloader(
                cfg.data_root, name, if_train=True, batch_size=1,
                clip_length=min(cfg.clip_length, 5), if_return_bbox_im=True,
                train_H=64, train_W=96, prefetch=0,
            )
            if len(ds) == 0:
                print(f"{name}: present but empty (no data at {cfg.data_root})")
                continue
            batch = next(iter(loader))
            shapes = {
                k: np.shape(v) for k, v in batch.items() if hasattr(v, "shape")
            }
            print(f"{name}: {len(ds)} samples, clips={shapes.get('clips')}, "
                  f"bbox_images={np.shape(batch.get('bbox_images'))}, "
                  f"objects.bbox={batch['objects']['bbox'].shape}")
        except Exception as e:  # noqa: BLE001 — smoke tool reports and continues
            print(f"{name}: unavailable ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
