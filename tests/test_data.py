"""Data layer tests: synthetic dataset, collate padding, KITTI parsing from
a generated fixture tree, loader batching, fourier embeddings, config."""

import os

import numpy as np
import pytest

from ctrlv_tpu.data import (
    MAX_BOXES_PER_DATA,
    SyntheticDrivingDataset,
    collate_clip_batch,
    get_dataloader,
    init_objects,
    objects_to_arrays,
)
from ctrlv_tpu.utils import Config, get_fourier_embeds_from_boundingbox, to_binary

F = 3


def test_synthetic_dataset_sample():
    ds = SyntheticDrivingDataset(
        clip_length=F, train_H=64, train_W=96, num_clips=2, if_return_bbox_im=True
    )
    sample = ds[0]
    assert sample["clip"].shape == (F, 64, 96, 3)
    assert sample["bbox_images"].shape == (F, 64, 96, 3)
    assert sample["clip"].min() >= -1.0 and sample["clip"].max() <= 1.0
    assert len(sample["labels"]) == F
    assert len(sample["labels"][0]) > 0
    # determinism
    sample2 = ds[0]
    np.testing.assert_array_equal(sample["clip"], sample2["clip"])


def test_collate_shapes():
    ds = SyntheticDrivingDataset(
        clip_length=F, train_H=64, train_W=96, num_clips=3, if_return_bbox_im=True
    )
    batch = collate_clip_batch([ds[0], ds[1]])
    assert batch["clips"].shape == (2, F, 64, 96, 3)
    assert batch["bbox_images"].shape == (2, F, 64, 96, 3)
    assert batch["objects"]["bbox"].shape == (2, F, MAX_BOXES_PER_DATA, 4)
    assert batch["objects"]["num_objects"].shape == (2, F)
    n = int(batch["objects"]["num_objects"][0, 0])
    # padding beyond num_objects must be zero
    assert np.allclose(batch["objects"]["bbox"][0, 0, n:], 0)


def test_kitti_parsing(tmp_path):
    """Generate a mini KITTI tree and parse it."""
    from PIL import Image

    root = tmp_path
    scene = "0000"
    img_dir = root / "kitti" / "training" / "image_02" / scene
    lbl_dir = root / "kitti" / "training" / "label_02"
    cal_dir = root / "kitti" / "training" / "calib"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    cal_dir.mkdir(parents=True)
    for i in range(6):
        Image.new("RGB", (1242, 375), (i * 30, 100, 50)).save(
            img_dir / f"{i:06d}.png"
        )
    rows = []
    for i in range(6):
        rows.append(
            f"{i} 1 Car 0.0 0 -1.5 100.0 150.0 300.0 250.0 1.5 1.7 4.0 2.0 1.6 15.0 -1.2"
        )
        rows.append(
            f"{i} 2 Pedestrian 0.1 1 0.5 400.0 160.0 430.0 240.0 1.8 0.6 0.8 -3.0 1.6 12.0 0.3"
        )
        rows.append(f"{i} 3 DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10")
    (lbl_dir / f"{scene}.txt").write_text("\n".join(rows))
    (cal_dir / f"{scene}.txt").write_text(
        "P2: 721.5 0.0 609.5 44.8 0.0 721.5 172.8 0.2 0.0 0.0 1.0 0.002\n"
    )

    from ctrlv_tpu.data import KittiDataset

    ds = KittiDataset(
        root=str(root), train=True, data_type="clip", clip_length=3,
        if_return_bbox_im=True, use_preplotted_bbox=False,
        train_H=64, train_W=96,
    )
    assert len(ds) == 3  # 6 frames, clip 3 -> sliding windows minus one
    sample = ds[0]
    assert sample["clip"].shape == (3, 64, 96, 3)
    labels0 = sample["labels"][0]
    assert len(labels0) == 2  # DontCare dropped
    assert labels0[0]["type"] == "Car" and labels0[0]["id_type"] == 1
    assert labels0[1]["id_type"] == 4
    calib = ds.get_calib_by_index(0)
    assert calib.shape == (3, 4) and np.isclose(calib[0, 0], 721.5)
    # bbox conditioning frames rendered by the XLA rasterizer
    assert sample["bbox_images"].shape == (3, 64, 96, 3)
    assert sample["bbox_images"].max() > -1.0  # something was drawn


def test_dataloader_batching():
    ds, loader = get_dataloader(
        dset_root=".", dset_name="synthetic", if_train=True, batch_size=2,
        clip_length=F, train_H=32, train_W=48, if_return_bbox_im=False,
        num_clips=5, prefetch=0,
    )
    batches = list(iter(loader))
    assert len(batches) == 2  # drop_last of 5/2
    assert batches[0]["clips"].shape == (2, F, 32, 48, 3)


def test_fourier_embeds():
    import jax.numpy as jnp

    B, Fr, N = 2, 3, 5
    rng = np.random.default_rng(0)
    objects = dict(
        bbox=jnp.asarray(rng.uniform(0, 300, (B, Fr, N, 4)), jnp.float32),
        truncated=jnp.zeros((B, Fr, N)),
        alpha=jnp.zeros((B, Fr, N)),
        dimensions=jnp.asarray(rng.uniform(0, 3, (B, Fr, N, 3)), jnp.float32),
        locations=jnp.asarray(rng.uniform(-5, 5, (B, Fr, N, 3)), jnp.float32),
        rotation_y=jnp.zeros((B, Fr, N)),
        track_id=jnp.asarray(rng.integers(0, 15, (B, Fr, N))),
        id_type=jnp.asarray(rng.integers(0, 9, (B, Fr, N))),
        num_objects=jnp.asarray([[3] * Fr, [0] * Fr]),
    )
    emb = get_fourier_embeds_from_boundingbox(objects)
    assert emb.shape == (B, Fr, N, 8 * 2 * (13 + 8 + 1))
    # slots beyond num_objects zeroed; batch 1 has no objects at all
    assert np.allclose(np.asarray(emb[0, :, 3:]), 0)
    assert np.allclose(np.asarray(emb[1]), 0)
    assert not np.allclose(np.asarray(emb[0, :, :3]), 0)


def test_to_binary():
    import jax.numpy as jnp

    out = np.asarray(to_binary(jnp.asarray([5]), bits=4))
    np.testing.assert_array_equal(out[0], [True, False, True, False])


def test_config_defaults_and_fps():
    cfg = Config()
    assert cfg.clip_length == 25 and cfg.train_H == 320 and cfg.train_W == 512
    assert cfg.fps == 7
    assert Config(dataset_name="bdd100k").fps == 5
    import jax.numpy as jnp

    assert Config(mixed_precision="bf16").compute_dtype == jnp.bfloat16


def test_config_cli_roundtrip():
    from ctrlv_tpu.utils import parse_args

    cfg = parse_args(
        ["--dataset_name", "kitti", "--learning_rate", "5e-6", "--predict_bbox"]
    )
    assert cfg.learning_rate == 5e-6 and cfg.predict_bbox is True
