"""Devkit-free nuScenes backend: table joins, quaternion/box geometry,
keyframe/sweep box lookup, and the full dataset against a synthetic
nuScenes dataroot (reference parity: nuscenes_.py:257-494 via
ctrlv_tpu/data/nuscenes_tables.py + nuscenes.py)."""

import json
import math
import os

import numpy as np

from ctrlv_tpu.data.nuscenes import (
    NuScenesDataset,
    NUSC_CLASS_TO_GROUP_IDS_KITTI,
)
from ctrlv_tpu.data.nuscenes_tables import (
    Box,
    NuScenesTables,
    Quaternion,
    split_scene_names,
)

INTRINSIC = [[100.0, 0.0, 800.0], [0.0, 100.0, 450.0], [0.0, 0.0, 1.0]]
IDENT_Q = [1.0, 0.0, 0.0, 0.0]


# ---------------------------------------------------------------- fixture
def _build_dataroot(tmp_path, sweeps_per_gap=5):
    """Two scenes of CAM_FRONT data: scene-0001 has 3 keyframes (2 Hz) with
    12 Hz sweeps between them and three instances; scene-0002 is keyframes
    only. Identity extrinsics so camera frame == global frame."""
    root = tmp_path / "data"
    tdir = root / "nuscenes" / "v1.0-trainval"
    os.makedirs(tdir)
    img_dir = root / "nuscenes" / "samples" / "CAM_FRONT"
    os.makedirs(img_dir)

    sensor = [dict(token="sens1", channel="CAM_FRONT", modality="camera")]
    calib = [
        dict(
            token="cs1",
            sensor_token="sens1",
            translation=[0.0, 0.0, 0.0],
            rotation=IDENT_Q,
            camera_intrinsic=INTRINSIC,
        )
    ]
    scenes, samples, sample_data, ego_poses, anns = [], [], [], [], []
    instances = [
        dict(token="inst_car", category_token="cat_car"),
        dict(token="inst_cone", category_token="cat_cone"),
        dict(token="inst_ped", category_token="cat_ped"),
    ]
    categories = [
        dict(token="cat_car", name="vehicle.car", description=""),
        dict(token="cat_cone", name="movable_object.trafficcone", description=""),
        dict(token="cat_ped", name="human.pedestrian.adult", description=""),
    ]

    from PIL import Image

    def add_scene(name, n_keyframes, sweeps, with_objects):
        sample_toks = [f"{name}-s{i}" for i in range(n_keyframes)]
        for i, tok in enumerate(sample_toks):
            samples.append(
                dict(
                    token=tok,
                    timestamp=i * 500_000,
                    scene_token=name,
                    prev=sample_toks[i - 1] if i > 0 else "",
                    next=sample_toks[i + 1] if i + 1 < n_keyframes else "",
                )
            )
        scenes.append(
            dict(
                token=name,
                name=name,
                first_sample_token=sample_toks[0],
                last_sample_token=sample_toks[-1],
                nbr_samples=n_keyframes,
                description="",
                log_token="",
            )
        )
        # sample_data chain: keyframe, then `sweeps` sweeps pointing at the
        # NEXT sample (devkit interpolation semantics), repeated.
        sd_specs = []  # (timestamp_us, is_key, sample_token)
        for i in range(n_keyframes):
            sd_specs.append((i * 500_000, True, sample_toks[i]))
            if i + 1 < n_keyframes:
                for j in range(1, sweeps + 1):
                    sd_specs.append(
                        (
                            i * 500_000 + j * 500_000 // (sweeps + 1),
                            False,
                            sample_toks[i + 1],
                        )
                    )
        sd_toks = [f"{name}-sd{i}" for i in range(len(sd_specs))]
        for i, (ts, key, stok) in enumerate(sd_specs):
            fname = f"samples/CAM_FRONT/{name}-f{i}.jpg"
            Image.new("RGB", (16, 9), (i * 9 % 255, 0, 0)).save(
                root / "nuscenes" / fname
            )
            ego_poses.append(
                dict(
                    token=f"{name}-ego{i}",
                    timestamp=ts,
                    rotation=IDENT_Q,
                    translation=[0.0, 0.0, 0.0],
                )
            )
            sample_data.append(
                dict(
                    token=sd_toks[i],
                    sample_token=stok,
                    ego_pose_token=f"{name}-ego{i}",
                    calibrated_sensor_token="cs1",
                    timestamp=ts,
                    fileformat="jpg",
                    is_key_frame=key,
                    height=900,
                    width=1600,
                    filename=fname,
                    prev=sd_toks[i - 1] if i > 0 else "",
                    next=sd_toks[i + 1] if i + 1 < len(sd_specs) else "",
                )
            )
        if not with_objects:
            return
        # car: moves +12 z per keyframe; cone static; pedestrian from s1 on
        for i, tok in enumerate(sample_toks):
            anns.append(
                dict(
                    token=f"{name}-ann-car{i}",
                    sample_token=tok,
                    instance_token="inst_car",
                    visibility_token="4",
                    attribute_tokens=[],
                    translation=[0.0, 0.0, 10.0 + 12.0 * i],
                    size=[2.0, 4.0, 1.5],  # w, l, h
                    rotation=IDENT_Q,
                    prev="",
                    next="",
                    num_lidar_pts=1,
                    num_radar_pts=1,
                )
            )
            anns.append(
                dict(
                    token=f"{name}-ann-cone{i}",
                    sample_token=tok,
                    instance_token="inst_cone",
                    visibility_token="4",
                    attribute_tokens=[],
                    translation=[2.0, 0.0, 12.0],
                    size=[0.4, 0.4, 0.8],
                    rotation=IDENT_Q,
                    prev="",
                    next="",
                    num_lidar_pts=1,
                    num_radar_pts=1,
                )
            )
            if i >= 1:
                anns.append(
                    dict(
                        token=f"{name}-ann-ped{i}",
                        sample_token=tok,
                        instance_token="inst_ped",
                        visibility_token="4",
                        attribute_tokens=[],
                        translation=[-3.0, 0.0, 15.0],
                        size=[0.6, 0.6, 1.8],
                        rotation=IDENT_Q,
                        prev="",
                        next="",
                        num_lidar_pts=1,
                        num_radar_pts=1,
                    )
                )

    add_scene("scene-0001", 3, sweeps_per_gap, with_objects=True)
    add_scene("scene-0002", 3, 0, with_objects=False)

    for name, records in [
        ("scene", scenes),
        ("sample", samples),
        ("sample_data", sample_data),
        ("ego_pose", ego_poses),
        ("calibrated_sensor", calib),
        ("sensor", sensor),
        ("sample_annotation", anns),
        ("instance", instances),
        ("category", categories),
    ]:
        json.dump(records, open(tdir / f"{name}.json", "w"))
    json.dump(
        {"train": ["scene-0001"], "val": ["scene-0002"], "test": []},
        open(tdir / "splits.json", "w"),
    )
    return str(root)


# ------------------------------------------------------------- quaternion
def test_quaternion_rotation_matrix_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        ours = Quaternion(q).rotation_matrix
        theirs = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_quaternion_angle_axis_inverse():
    half = math.pi / 6  # 60deg about z
    q = Quaternion([math.cos(half), 0.0, 0.0, math.sin(half)])
    assert abs(q.angle - math.pi / 3) < 1e-12
    np.testing.assert_allclose(q.axis, [0, 0, 1], atol=1e-12)
    ident = q * q.inverse
    np.testing.assert_allclose(ident.q, [1, 0, 0, 0], atol=1e-12)
    # wrap: 270deg about z reports -90deg (pyquaternion wrapping)
    h = 3 * math.pi / 4
    q270 = Quaternion([math.cos(h), 0.0, 0.0, math.sin(h)])
    assert abs(q270.angle + math.pi / 2) < 1e-12


def test_quaternion_slerp_midpoint():
    q0 = Quaternion(IDENT_Q)
    q1 = Quaternion([math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)])  # 90deg z
    mid = Quaternion.slerp(q0, q1, 0.5)
    assert abs(mid.angle - math.pi / 4) < 1e-9
    np.testing.assert_allclose(Quaternion.slerp(q0, q1, 0.0).q, q0.q, atol=1e-12)
    np.testing.assert_allclose(Quaternion.slerp(q0, q1, 1.0).q, q1.q, atol=1e-12)


def test_box_corners_convention():
    box = Box([1.0, 2.0, 3.0], [2.0, 4.0, 1.5], Quaternion(IDENT_Q))
    c = box.corners()
    assert c.shape == (3, 8)
    np.testing.assert_allclose(c[0].min(), 1.0 - 2.0)  # l/2 along x
    np.testing.assert_allclose(c[0].max(), 1.0 + 2.0)
    np.testing.assert_allclose(c[1].min(), 2.0 - 1.0)  # w/2 along y
    np.testing.assert_allclose(c[2].max(), 3.0 + 0.75)  # h/2 along z
    # 90deg yaw about z swaps the x/y extents
    box.rotate(Quaternion([math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]))
    c = box.corners()
    np.testing.assert_allclose(c[0].max() - c[0].min(), 2.0, atol=1e-9)
    np.testing.assert_allclose(c[1].max() - c[1].min(), 4.0, atol=1e-9)


# ----------------------------------------------------------------- tables
def test_tables_reverse_indexes(tmp_path):
    root = _build_dataroot(tmp_path)
    nusc = NuScenesTables(os.path.join(root, "nuscenes"))
    s0 = nusc.get("sample", "scene-0001-s0")
    assert s0["data"]["CAM_FRONT"] == "scene-0001-sd0"
    assert set(s0["anns"]) == {"scene-0001-ann-car0", "scene-0001-ann-cone0"}
    ann = nusc.get("sample_annotation", "scene-0001-ann-car0")
    assert ann["category_name"] == "vehicle.car"
    sd = nusc.get("sample_data", "scene-0001-sd0")
    assert sd["channel"] == "CAM_FRONT" and sd["is_key_frame"]


def test_get_boxes_keyframe_and_sweep_interpolation(tmp_path):
    root = _build_dataroot(tmp_path)
    nusc = NuScenesTables(os.path.join(root, "nuscenes"))
    # keyframe: recorded pose
    boxes = {b.name: b for b in nusc.get_boxes("scene-0001-sd0")}
    np.testing.assert_allclose(boxes["vehicle.car"].center, [0, 0, 10])
    # sweeps sd1..sd5 sit between s0 (t=0) and s1 (t=500ms); car moves
    # z 10 -> 22, so the interpolated z tracks the timestamp linearly
    for i in range(1, 6):
        sd = nusc.get("sample_data", f"scene-0001-sd{i}")
        frac = sd["timestamp"] / 500_000
        b = {x.name: x for x in nusc.get_boxes(f"scene-0001-sd{i}")}
        np.testing.assert_allclose(
            b["vehicle.car"].center, [0, 0, 10 + 12 * frac], atol=1e-9
        )
        np.testing.assert_allclose(b["movable_object.trafficcone"].center, [2, 0, 12])
        # pedestrian exists only from s1 on: no prev ann -> recorded pose
        np.testing.assert_allclose(
            b["human.pedestrian.adult"].center, [-3, 0, 15], atol=1e-12
        )


def test_split_scene_names_fallback(tmp_path):
    root = _build_dataroot(tmp_path)
    dataroot = os.path.join(root, "nuscenes")
    nusc = NuScenesTables(dataroot)
    # splits.json present -> used verbatim
    assert split_scene_names(dataroot, "v1.0-trainval", "train", nusc.scene) == [
        "scene-0001"
    ]
    # without it: deterministic name-sorted 85/15 fallback
    os.remove(os.path.join(dataroot, "v1.0-trainval", "splits.json"))
    train = split_scene_names(dataroot, "v1.0-trainval", "train", nusc.scene)
    val = split_scene_names(dataroot, "v1.0-trainval", "val", nusc.scene)
    assert sorted(train + val) == ["scene-0001", "scene-0002"] and train


# ---------------------------------------------------------------- dataset
def test_dataset_clip_assembly_and_labels(tmp_path):
    root = _build_dataroot(tmp_path)
    ds = NuScenesDataset(
        root=root, train=True, data_type="clip", clip_length=4, train_H=32, train_W=64
    )
    # scene-0001 only (splits.json); 13 raw frames at ~12 Hz resample to
    # every 2nd -> 7 start candidates, overlapping starts = 7-4+1
    assert len(ds) == 4
    # frames inside a clip follow the RAW next chain (reference
    # nuscenes_.py:400-412), not the resampled list
    f0 = ds.get_frame_file_by_index(0, 0)
    f1 = ds.get_frame_file_by_index(0, 1)
    assert f0.endswith("scene-0001-f0.jpg") and f1.endswith("scene-0001-f1.jpg")

    labels = ds.get_labels_by_index(0, 0)
    names = [l["type"] for l in labels]
    assert names == ["vehicle.car"]  # trafficcone filtered (KITTI group 8)
    car = labels[0]
    # identity extrinsics: u = 800 + 100*x/z, v = 450 + 100*y/z over the
    # 8 corners of the (w=2,l=4,h=1.5) box at z=10
    zs = np.array([10 - 0.75, 10 + 0.75])
    u = 800 + 100 * np.array([[-2.0], [2.0]]) / zs
    v = 450 + 100 * np.array([[-1.0], [1.0]]) / zs
    np.testing.assert_allclose(
        car["bbox"], [u.min(), v.min(), u.max(), v.max()], atol=1e-6
    )
    # reference nuscenes_.py:442: id_type comes from the KITTI-style map
    assert car["trackID"] == 0
    assert car["id_type"] == NUSC_CLASS_TO_GROUP_IDS_KITTI["vehicle.car"] == 1
    assert car["dimensions"] == [1.5, 2.0, 4.0]  # [h, w, l]

    item = ds[0]
    assert item["clip"].shape == (4, 32, 64, 3)
    assert len(item["labels"]) == 4
    assert item["prompt"] == "This is a real-world driving scene."


def test_dataset_val_split_non_overlapping(tmp_path):
    root = _build_dataroot(tmp_path)
    ds = NuScenesDataset(
        root=root, train=False, data_type="clip", clip_length=3, train_H=32, train_W=64
    )
    # scene-0002: 3 keyframes at 2 Hz, no sweeps -> resample keeps all 3;
    # non-overlapping is forced for validation -> exactly one clip
    assert len(ds) == 1
    assert ds.get_labels_by_index(0, 0) == []  # scene-0002 has no objects


def test_dataset_ego_and_sensor_transform(tmp_path):
    """Non-identity ego pose: camera coords = global - ego translation."""
    root = _build_dataroot(tmp_path)
    tdir = os.path.join(root, "nuscenes", "v1.0-trainval")
    poses = json.load(open(os.path.join(tdir, "ego_pose.json")))
    for p in poses:
        p["translation"] = [1.0, -2.0, 3.0]
    json.dump(poses, open(os.path.join(tdir, "ego_pose.json"), "w"))
    anns = json.load(open(os.path.join(tdir, "sample_annotation.json")))
    for a in anns:  # shift objects by the same offset -> identical camera frame
        a["translation"] = [t + o for t, o in zip(a["translation"], [1.0, -2.0, 3.0])]
    json.dump(anns, open(os.path.join(tdir, "sample_annotation.json"), "w"))

    ds = NuScenesDataset(
        root=root, train=True, data_type="clip", clip_length=4, train_H=32, train_W=64
    )
    car = ds.get_labels_by_index(0, 0)[0]
    zs = np.array([10 - 0.75, 10 + 0.75])
    u = 800 + 100 * np.array([[-2.0], [2.0]]) / zs
    v = 450 + 100 * np.array([[-1.0], [1.0]]) / zs
    np.testing.assert_allclose(
        car["bbox"], [u.min(), v.min(), u.max(), v.max()], atol=1e-6
    )


def test_dataset_through_loader_and_collate(tmp_path):
    """Full input-pipeline integration: factory dispatch, batching,
    object collate, and rasterized bbox conditioning frames."""
    from ctrlv_tpu.data.loader import get_dataloader

    root = _build_dataroot(tmp_path)
    ds, dl = get_dataloader(
        root,
        "nuscenes",
        if_train=True,
        batch_size=1,
        clip_length=4,
        data_type="clip",
        train_H=32,
        train_W=64,
        if_return_bbox_im=True,
        prefetch=0,
    )
    batch = next(iter(dl))
    assert batch["clips"].shape == (1, 4, 32, 64, 3)
    assert batch["bbox_images"].shape == (1, 4, 32, 64, 3)
    assert batch["objects"]["num_objects"].shape[0] == 1
    # the rendered conditioning frame is non-empty (the car rect drew)
    assert float(np.abs(batch["bbox_images"] + 1).max()) > 0.1


def test_dataset_image_mode(tmp_path):
    """Image mode indexes the resampled frames directly (reference
    nuscenes_.py:309-311)."""
    root = _build_dataroot(tmp_path)
    ds = NuScenesDataset(
        root=root, train=True, data_type="image", clip_length=4,
        train_H=32, train_W=64,
    )
    # scene-0001: 13 raw frames resample to every 2nd -> 7 image frames
    assert len(ds) == 7
    # index 1 = resampled frame 1 = raw frame 2 (not a clip start walk)
    assert ds.get_frame_file_by_index(1).endswith("scene-0001-f2.jpg")
    item = ds[6]  # last resampled frame must be reachable
    assert item["clip"].shape == (32, 64, 3)


def test_dataset_test_split_switches_version(tmp_path):
    """test_split=True must look for v1.0-test tables, not filter trainval
    down to an empty set (reference nuscenes_.py:256)."""
    import pytest

    root = _build_dataroot(tmp_path)
    with pytest.raises(FileNotFoundError, match="v1.0-test"):
        NuScenesDataset(root=root, train=True, test_split=True, clip_length=4)


def test_bbox_frame_render_and_cache(tmp_path):
    """Native my_render_3d_style path (reference nuscenes_.py:354-384):
    with a bbox_dir the frame is rendered once into {token}.png and served
    from the cache after; the renderer draws EVERY visible box (the
    trafficcone is class-filtered from labels but still rendered)."""
    root = _build_dataroot(tmp_path)
    bbox_dir = str(tmp_path / "bbox_cache")
    ds = NuScenesDataset(
        root=root, train=True, data_type="clip", clip_length=4,
        train_H=32, train_W=64, bbox_dir=bbox_dir,
    )
    token = ds._token_at(0, 0)
    frame = ds.load_bbox_frame(0, 0, None, None)
    assert frame.shape == (32, 64, 3)
    path = os.path.join(bbox_dir, f"{token}.png")
    assert os.path.exists(path)
    assert ds.get_bbox_image_file_by_index(0) == path
    # cached load is bit-identical (no re-render)
    again = ds.load_bbox_frame(0, 0, None, None)
    np.testing.assert_array_equal(frame, again)

    # renderer input: labels filter the cone, the render path keeps it
    corners, valid, outline, fill = ds._render_arrays(token)
    assert corners.shape[0] == 2  # car + cone (identity extrinsics, both visible)
    assert [l["type"] for l in ds.get_labels_by_index(0, 0)] == ["vehicle.car"]

    # in-memory path (no bbox_dir) draws the same geometry
    ds2 = NuScenesDataset(
        root=root, train=True, data_type="clip", clip_length=4,
        train_H=32, train_W=64,
    )
    mem = ds2.load_bbox_frame(0, 0, None, None)
    assert mem.shape == (32, 64, 3)
    assert float(np.abs(mem + 1).max()) > 0.1  # non-empty, [-1,1]


def test_vae_encode_chunk_rounds_to_divisor():
    """A non-dividing encode chunk keeps a bound by rounding down to the
    largest divisor instead of silently encoding all frames at once."""
    import jax
    import jax.numpy as jnp

    from ctrlv_tpu.models import AutoencoderKLTemporalDecoder, VAEConfig
    from ctrlv_tpu.train.train_step import _vae_encode_frames

    vae = AutoencoderKLTemporalDecoder(config=VAEConfig.tiny())
    frames = jnp.zeros((10, 16, 16, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), frames[:1])
    rng = jax.random.PRNGKey(1)
    a = _vae_encode_frames(vae, params, frames, rng, chunk=4)   # -> divisor 2
    b = _vae_encode_frames(vae, params, frames, rng, chunk=2)
    import numpy as np

    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert a.shape[0] == 10
