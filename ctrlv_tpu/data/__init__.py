from .collate import (
    MAX_BOXES_PER_DATA,
    COCO_LABELS_LOOKUP,
    init_objects,
    collate_clip_batch,
    objects_to_arrays,
)
from .base import VideoDataset, FrameLabel
from .kitti import KittiDataset
from .vkitti import VKittiDataset
from .mkitti import MergedKittiDataset
from .bdd100k import BDD100KDataset
from .davis import DAVISDataset
from .nuscenes import NuScenesDataset
from .synthetic import SyntheticDrivingDataset
from .loader import get_dataloader, build_dataset, DataLoader

__all__ = [
    "MAX_BOXES_PER_DATA",
    "COCO_LABELS_LOOKUP",
    "init_objects",
    "collate_clip_batch",
    "objects_to_arrays",
    "VideoDataset",
    "FrameLabel",
    "KittiDataset",
    "VKittiDataset",
    "MergedKittiDataset",
    "BDD100KDataset",
    "DAVISDataset",
    "NuScenesDataset",
    "SyntheticDrivingDataset",
    "get_dataloader",
    "build_dataset",
    "DataLoader",
]
