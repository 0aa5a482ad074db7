"""Baseline extras: coords-regression variant, image-context encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.baseline import (
    BaselineConfig,
    BboxPredictorLM,
    ImageEncoder,
    bbox_seq_to_actions,
)
from helpers import build_tiny_models


def _fake_batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    t, n = cfg.num_timesteps, cfg.max_num_agents
    start = rng.uniform(0.2, 0.6, (b, 1, n, 4))
    steps = rng.uniform(-0.01, 0.01, (b, t, n, 4))
    bboxes = np.clip(start + np.cumsum(steps, axis=1), 0.05, 0.95)
    actions = np.asarray(bbox_seq_to_actions(jnp.asarray(bboxes, jnp.float32)))
    return dict(
        bboxes=jnp.asarray(bboxes, jnp.float32),
        coords=jnp.asarray(bboxes, jnp.float32),
        actions=jnp.asarray(actions),
        type_ids=jnp.ones((b, t, n, 1), jnp.float32),
        existence=jnp.ones((b, t, n, 1), bool),
    )


def test_coords_regression_variant():
    cfg = BaselineConfig.tiny(pred_coords=True, regression=True, existence_head=True)
    model = BboxPredictorLM(cfg=cfg)
    data = _fake_batch(cfg)
    params = jax.jit(lambda k: model.init(k, data))(jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, data)
    assert out["coord_preds"].shape == (
        2, cfg.num_timesteps, cfg.max_num_agents, 4
    )
    assert "existence_preds" in out
    loss = BboxPredictorLM.loss(cfg, out)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_coords_token_variant():
    cfg = BaselineConfig.tiny(pred_coords=True)
    model = BboxPredictorLM(cfg=cfg)
    data = _fake_batch(cfg)
    params = jax.jit(lambda k: model.init(k, data))(jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, data)
    assert out["action_preds"].shape == (
        2, cfg.num_timesteps, cfg.max_num_agents, 4, cfg.vocabulary_size
    )
    assert np.isfinite(float(BboxPredictorLM.loss(cfg, out)))


def test_image_context_encoder():
    models = build_tiny_models(
        num_frames=3, image_hw=(32, 32), components=("vae", "clip")
    )
    cfg = BaselineConfig.tiny(map_embedding=True)
    enc = ImageEncoder(
        cfg, models["vae"], models["vae_params"], models["clip"], models["clip_params"]
    )
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), minval=-1, maxval=1)
    proj_params = enc.init(jax.random.PRNGKey(1), images)
    tokens = enc(proj_params, images)
    assert tokens.shape == (2, 1 + 32, cfg.hidden_dim)
    assert np.isfinite(np.asarray(tokens)).all()

    # tokens feed the model's encoder memory
    model = BboxPredictorLM(cfg=cfg)
    data = _fake_batch(cfg)
    params = jax.jit(lambda k: model.init(k, data, tokens))(jax.random.PRNGKey(2))
    out = model.apply(params, data, tokens)
    out2 = model.apply(params, data, tokens + 1.0)
    assert not np.allclose(
        np.asarray(out["action_preds"]), np.asarray(out2["action_preds"])
    )
