"""Dataset factory + batching iterator (host-side input pipeline).

Behavioral parity: get_dataloader
(/root/reference/src/ctrlv/utils/util.py:37-93) — name->Dataset dispatch,
collate selection, shuffled/drop-last batching. TPU-native: instead of
torch DataLoader workers, a simple prefetching iterator that yields dense
numpy dicts ready for jax.device_put (double-buffered via a background
thread when prefetch>0).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .collate import collate_clip_batch


def build_dataset(
    dset_name: str,
    dset_root: str,
    if_train: bool,
    data_type: str = "clip",
    clip_length: int = 25,
    if_return_bbox_im: bool = False,
    train_H: int = 320,
    train_W: int = 512,
    use_segmentation: bool = False,
    use_preplotted_bbox: bool = True,
    if_last_frame_traj: bool = False,
    non_overlapping_clips: bool = False,
    **kwargs,
):
    name = dset_name.lower()
    common = dict(
        root=dset_root,
        train=if_train,
        data_type=data_type,
        clip_length=clip_length,
        if_return_bbox_im=if_return_bbox_im,
        train_H=train_H,
        train_W=train_W,
        non_overlapping_clips=non_overlapping_clips,
        use_preplotted_bbox=use_preplotted_bbox,
    )
    if name == "kitti":
        from .kitti import KittiDataset

        return KittiDataset(**common, **kwargs)
    if name == "vkitti":
        from .vkitti import VKittiDataset

        return VKittiDataset(**common, **kwargs)
    if name == "mkitti":
        from .mkitti import MergedKittiDataset

        return MergedKittiDataset(**common, **kwargs)
    if name == "bdd100k":
        from .bdd100k import BDD100KDataset

        ds = BDD100KDataset(use_segmentation=use_segmentation, **common, **kwargs)
        ds.set_if_last_frame_trajectory(if_last_frame_traj)
        return ds
    if name == "davis":
        from .davis import DAVISDataset

        return DAVISDataset(**common, **kwargs)
    if name == "nuscenes":
        from .nuscenes import NuScenesDataset

        return NuScenesDataset(**common, **kwargs)
    if name == "synthetic":
        from .synthetic import SyntheticDrivingDataset

        common.pop("use_preplotted_bbox")
        return SyntheticDrivingDataset(**common, **kwargs)
    raise NotImplementedError(f"Dataset {dset_name} not implemented")


class DataLoader:
    """Shuffled, drop-last batch iterator with optional thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        collate_fn=collate_clip_batch,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        if self.prefetch <= 0:
            for batch_idx in self._index_batches():
                yield self.collate_fn([self.dataset[int(i)] for i in batch_idx])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for batch_idx in self._index_batches():
                    q.put(self.collate_fn([self.dataset[int(i)] for i in batch_idx]))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def get_dataloader(
    dset_root: str,
    dset_name: str,
    if_train: bool,
    batch_size: int,
    num_workers: int = 0,  # accepted for API parity; prefetch thread instead
    data_type: str = "clip",
    clip_length: int = 25,
    shuffle: bool = True,
    if_return_bbox_im: bool = False,
    train_H: int = 320,
    train_W: int = 512,
    use_segmentation: bool = False,
    use_preplotted_bbox: bool = True,
    if_last_frame_traj: bool = False,
    non_overlapping_clips: bool = False,
    seed: int = 0,
    prefetch: int = 2,
    **kwargs,
):
    dset = build_dataset(
        dset_name,
        dset_root,
        if_train,
        data_type=data_type,
        clip_length=clip_length,
        if_return_bbox_im=if_return_bbox_im,
        train_H=train_H,
        train_W=train_W,
        use_segmentation=use_segmentation,
        use_preplotted_bbox=use_preplotted_bbox,
        if_last_frame_traj=if_last_frame_traj,
        non_overlapping_clips=non_overlapping_clips,
        **kwargs,
    )
    if len(dset) == 0:
        raise FileNotFoundError(
            f"dataset '{dset_name}' at '{dset_root}' produced 0 "
            f"{data_type}s — check --data_root (expected layout documented "
            f"in ctrlv_tpu/data/{dset_name.lower()}.py)"
        )
    loader = DataLoader(
        dset, batch_size=batch_size, shuffle=shuffle, drop_last=True, seed=seed,
        prefetch=prefetch,
    )
    return dset, loader
