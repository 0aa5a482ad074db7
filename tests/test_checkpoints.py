"""Checkpoint/export tests: Orbax save/restore/rotation + HF export roundtrip
+ DAVISEvaluation wrapper."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_orbax_save_restore_rotation(tmp_path):
    from ctrlv_tpu.train import CheckpointManager

    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2, async_save=False)
    for step in (1, 2, 3):
        mgr.save(step, jax.tree.map(lambda x: x * step, tree), wait=True)
    assert mgr.latest_step() == 3
    restored = mgr.restore(template=tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4.0) * 3)
    # rotation kept only the last two
    steps = sorted(
        int(d.split("_")[-1]) for d in os.listdir(tmp_path / "ckpts") if "checkpoint" in d
    )
    assert steps == [2, 3]
    mgr.close()


def test_hf_export_roundtrip(tmp_path):
    from ctrlv_tpu.models import CLIPVisionConfig, CLIPVisionModelWithProjection
    from ctrlv_tpu.train import load_hf_component
    from ctrlv_tpu.train.hf_export import save_pipeline

    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(config=cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(lambda k: model.init(k, x))(jax.random.PRNGKey(0))

    out = save_pipeline(str(tmp_path / "pipe"), clip_params=params, clip_config=cfg)
    assert os.path.exists(os.path.join(out, "image_encoder", "model.safetensors"))
    assert os.path.exists(os.path.join(out, "image_encoder", "config.json"))
    assert os.path.exists(os.path.join(out, "model_index.json"))

    loaded = load_hf_component(
        os.path.join(out, "image_encoder"), expected=params["params"]
    )
    import flax

    f0 = flax.traverse_util.flatten_dict(params["params"])
    f1 = flax.traverse_util.flatten_dict(loaded)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]))


def test_davis_evaluation():
    from ctrlv_tpu.metrics import DAVISEvaluation

    gt = np.zeros((2, 3, 16, 16), bool)
    gt[0, :, 4:10, 4:10] = True
    gt[1, :, 2:6, 2:6] = True
    j, f = DAVISEvaluation.evaluate_semisupervised(gt, gt.copy())
    assert j.shape == (2, 3) and np.allclose(j, 1.0)
    assert np.allclose(f, 1.0)
    # fewer predicted objects are zero-padded
    j2, _ = DAVISEvaluation.evaluate_semisupervised(gt, gt[:1].copy())
    assert np.allclose(j2[0], 1.0) and np.allclose(j2[1], 0.0)
