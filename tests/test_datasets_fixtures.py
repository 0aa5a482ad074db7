"""Parser tests for vkitti / bdd100k / davis / mkitti from generated
fixture trees (the KITTI fixture test lives in test_data.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _make_kitti(root, scene="0000", n=6):
    img_dir = root / "kitti" / "training" / "image_02" / scene
    lbl_dir = root / "kitti" / "training" / "label_02"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        Image.new("RGB", (128, 64), (i * 20, 90, 40)).save(img_dir / f"{i:06d}.png")
    rows = [
        f"{i} 1 Car 0.0 0 -1.5 10.0 15.0 60.0 50.0 1.5 1.7 4.0 2.0 1.6 15.0 -1.2"
        for i in range(n)
    ]
    (lbl_dir / f"{scene}.txt").write_text("\n".join(rows))


def _make_vkitti(root, scene="Scene01", setting="clone", n=5):
    rgb_dir = root / "vkitti_2.0.3" / "rgb" / scene / setting / "frames/rgb/Camera_0"
    txt_dir = root / "vkitti_2.0.3" / "textgt" / scene / setting
    rgb_dir.mkdir(parents=True, exist_ok=True)
    txt_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        Image.new("RGB", (128, 64), (40, i * 30, 80)).save(rgb_dir / f"rgb_{i:05d}.jpg")
    bbox_rows = ["frame cameraID trackID left right top bottom number_pixels truncation_ratio occupancy_ratio isMoving"]
    pose_rows = [
        "frame cameraID trackID alpha width height length "
        "world_space_X world_space_Y world_space_Z rotation_world_space_y "
        "camera_space_X camera_space_Y camera_space_Z rotation_camera_space_y"
    ]
    for i in range(n):
        bbox_rows.append(f"{i} 0 2 10 60 15 50 1000 0.1 0.2 True")
        bbox_rows.append(f"{i} 0 3 5 20 5 20 100 0.0 0.0 False")  # < pixel thresh
        pose_rows.append(f"{i} 0 2 0.5 1.7 1.5 4.0 0 0 0 0 2.0 1.6 15.0 -1.2")
        pose_rows.append(f"{i} 0 3 0.0 1.0 1.0 1.0 0 0 0 0 1.0 1.0 5.0 0.0")
    (txt_dir / "bbox.txt").write_text("\n".join(bbox_rows))
    (txt_dir / "pose.txt").write_text("\n".join(pose_rows))
    (txt_dir / "info.txt").write_text("trackID label model color\n2 Car sedan red\n3 Van van blue")
    intr = ["frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]"]
    for i in range(n):
        intr.append(f"{i} 0 725.0 725.0 64.0 32.0")
    (txt_dir / "intrinsic.txt").write_text("\n".join(intr))


def test_vkitti_parsing(tmp_path):
    _make_vkitti(tmp_path)
    from ctrlv_tpu.data import VKittiDataset

    ds = VKittiDataset(
        root=str(tmp_path), train=True, data_type="clip", clip_length=3,
        train_H=32, train_W=64, use_preplotted_bbox=False,
    )
    assert len(ds) == 2  # 5 frames, sliding windows minus one
    labels = ds.get_labels_by_index(0, 0)
    assert len(labels) == 1  # number_pixels filter dropped track 3
    assert labels[0]["type"] == "Car" and labels[0]["trackID"] == 2
    assert labels[0]["location"] == [2.0, 1.6, 15.0]
    K = ds.get_calib_by_index(0)
    assert K.shape == (3, 3) and np.isclose(K[0, 0], 725.0)
    assert "simulated driving scene" in ds.get_prompt(0)
    sample = ds[0]
    assert sample["clip"].shape == (3, 32, 64, 3)


def test_mkitti_dispatch(tmp_path):
    _make_kitti(tmp_path)
    _make_vkitti(tmp_path)
    from ctrlv_tpu.data import MergedKittiDataset

    ds = MergedKittiDataset(
        root=str(tmp_path), train=True, data_type="clip", clip_length=3,
        train_H=32, train_W=64, use_preplotted_bbox=False,
    )
    assert len(ds) == len(ds.vkitti) + len(ds.kitti)
    # index beyond vkitti hits kitti
    labels = ds.get_labels_by_index(len(ds.vkitti), 0)
    assert labels[0]["type"] == "Car"
    assert "Karlsruhe" in ds.get_prompt(len(ds.vkitti))


def test_bdd100k_parsing(tmp_path):
    clip_id = "b1c9c847-3bda4659"
    img_dir = tmp_path / "bdd100k/images/track/train" / clip_id
    lbl_dir = tmp_path / "bdd100k/labels/box_track_20/train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    n = 5
    for i in range(1, n + 1):
        Image.new("RGB", (128, 72), (30, 60, i * 25)).save(
            img_dir / f"{clip_id}-{i:07d}.jpg"
        )
    frames = []
    for i in range(1, n + 1):
        frames.append(
            dict(
                name=f"{clip_id}-{i:07d}.jpg",
                labels=[
                    dict(
                        id="17",
                        category="car",
                        attributes=dict(truncated=False, occluded=True),
                        box2d=dict(x1=10.0, y1=12.0, x2=60.0, y2=50.0),
                    ),
                    dict(
                        id="4",
                        category="sky",  # unknown category dropped
                        attributes={},
                        box2d=dict(x1=0, y1=0, x2=1, y2=1),
                    ),
                ],
            )
        )
    (lbl_dir / f"{clip_id}.json").write_text(json.dumps(frames))

    from ctrlv_tpu.data import BDD100KDataset

    ds = BDD100KDataset(
        root=str(tmp_path), train=True, data_type="clip", clip_length=3,
        train_H=36, train_W=64, use_preplotted_bbox=False,
    )
    assert ds.fps == 5 and ds.orig_W == 1280
    assert len(ds) == 3
    labels = ds.get_labels_by_index(0, 1)
    assert len(labels) == 1
    assert labels[0]["id_type"] == 3 and labels[0]["trackID"] == 17
    assert labels[0]["occluded"] == 1
    sample = ds[0]
    assert sample["clip"].shape == (3, 36, 64, 3)
    # val split uses non-overlapping chunks
    ds_val = BDD100KDataset(
        root=str(tmp_path), train=True, data_type="clip", clip_length=2,
        train_H=36, train_W=64, non_overlapping_clips=True,
    )
    assert len(ds_val) == 2


def test_davis_parsing(tmp_path):
    seq = "bear"
    img_dir = tmp_path / "DAVIS/JPEGImages/480p" / seq
    ann_dir = tmp_path / "DAVIS/Annotations/480p" / seq
    sets_dir = tmp_path / "DAVIS/ImageSets/2017"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    sets_dir.mkdir(parents=True)
    (sets_dir / "train.txt").write_text(seq + "\n")
    n = 4
    for i in range(n):
        Image.new("RGB", (96, 54), (10, 120, 60)).save(img_dir / f"{i:05d}.jpg")
        mask = np.zeros((54, 96), np.uint8)
        mask[10:30, 20 + i : 50 + i] = 1  # object 1 moves right
        mask[35:45, 5:25] = 2
        Image.fromarray(mask, mode="L").save(ann_dir / f"{i:05d}.png")

    from ctrlv_tpu.data import DAVISDataset

    ds = DAVISDataset(
        root=str(tmp_path), train=True, data_type="clip", clip_length=3,
        train_H=32, train_W=64, use_preplotted_bbox=False,
    )
    assert len(ds) == 2
    labels = ds.get_labels_by_index(0, 2)
    assert len(labels) == 2
    by_id = {l["trackID"]: l for l in labels}
    assert by_id[1]["bbox"] == [22.0, 10.0, 51.0, 29.0]
    assert by_id[2]["bbox"][0] == 5.0
