"""Tests for utility odds and ends: rand_log_normal, objectnet helpers,
sample generators, profiling timer, offline-eval pairing."""

import jax
import jax.numpy as jnp
import numpy as np


def test_rand_log_normal():
    from ctrlv_tpu.utils import rand_log_normal

    x = np.asarray(rand_log_normal(jax.random.PRNGKey(0), (20000,)))
    assert (x > 0).all()
    # lognormal(0,1): median = 1, mean = exp(0.5)
    assert 0.9 < np.median(x) < 1.1
    assert 1.5 < x.mean() < 1.8


def test_objectnet_convert_revert_roundtrip():
    from ctrlv_tpu.utils.objectnet import OBJECT_DIM, convert_objects, revert_embed

    rng = np.random.default_rng(0)
    B, F, N = 2, 3, 4
    objects = dict(
        truncated=jnp.asarray(rng.random((B, F, N)), jnp.float32),
        occluded=jnp.asarray(rng.integers(0, 3, (B, F, N))),
        alpha=jnp.asarray(rng.random((B, F, N)), jnp.float32),
        bbox=jnp.asarray(rng.random((B, F, N, 4)), jnp.float32),
        dimensions=jnp.asarray(rng.random((B, F, N, 3)), jnp.float32),
        locations=jnp.asarray(rng.random((B, F, N, 3)), jnp.float32),
        rotation_y=jnp.asarray(rng.random((B, F, N)), jnp.float32),
        id_type=jnp.asarray(rng.integers(0, 9, (B, F, N))),
        track_id=jnp.asarray(rng.integers(0, 30, (B, F, N))),
    )
    flat = convert_objects(objects)
    assert flat.shape == (B, F, N * OBJECT_DIM)
    back = revert_embed(flat, N)
    np.testing.assert_allclose(np.asarray(back["bbox"]), np.asarray(objects["bbox"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back["id_type"]), np.asarray(objects["id_type"]))


def test_sample_generators():
    from ctrlv_tpu.data import SyntheticDrivingDataset, DataLoader
    from ctrlv_tpu.utils import get_n_training_samples, eval_samples_generator

    ds = SyntheticDrivingDataset(
        clip_length=3, train_H=32, train_W=48, num_clips=4, if_return_bbox_im=True
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, prefetch=0)
    samples = get_n_training_samples(loader, 2)
    assert len(samples) == 2
    s = samples[0]
    assert s["gt_clip"].shape == (3, 32, 48, 3)
    assert s["gt_clip_np"].dtype == np.uint8
    assert s["bbox_img"].shape == (3, 32, 48, 3)
    assert len(s["gt_labels"]) == 3
    gen = eval_samples_generator(loader, start_index=1)
    s1 = next(gen)
    assert s1["index"] == samples[1]["index"]


def test_step_timer():
    from ctrlv_tpu.utils.profiling import StepTimer

    timer = StepTimer(warmup=1)
    for _ in range(4):
        with timer:
            pass
    summary = timer.summary()
    assert summary["steps"] == 3
    assert summary["mean_s"] >= 0


def test_offline_eval_pairing(tmp_path):
    from ctrlv_tpu.metrics.offline_eval import pair_video_files

    for i in (0, 1, 3):
        (tmp_path / f"generated_video_{i}.gif").write_bytes(b"x")
    for i in (0, 3, 4):
        (tmp_path / f"gt_video_{i}.gif").write_bytes(b"x")
    pairs = pair_video_files(str(tmp_path))
    assert len(pairs) == 2
    assert pairs[0][0].endswith("generated_video_0.gif")
    assert pairs[1][1].endswith("gt_video_3.gif")


def test_png_sequence_roundtrip(tmp_path):
    """PNG-sequence export is bit-exact even for identical consecutive
    frames (which GIF export merges — STATUS r1 caveat 7)."""
    from ctrlv_tpu.utils.video_io import export_to_frames, load_video

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(5, 8, 10, 3), dtype=np.uint8)
    frames[2] = frames[1]  # identical consecutive frames survive
    out = export_to_frames(list(frames), str(tmp_path / "seq"))
    back = load_video(out)
    np.testing.assert_array_equal(back, frames)
