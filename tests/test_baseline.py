"""Baseline AR bbox-LM tests: action math roundtrips, model forward/loss,
rollout policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.baseline import (
    BaselineConfig,
    BboxPredictorLM,
    BboxPredictorLMPolicy,
    actions_to_bbox_seq,
    bbox_seq_to_actions,
    discretize_actions,
    normalize_track_ids,
    process_data,
    undiscretize_actions,
)

CFG = BaselineConfig.tiny()


def _fake_batch(b=2, t=CFG.num_timesteps, n=CFG.max_num_agents, seed=0):
    rng = np.random.default_rng(seed)
    # smooth random walks in [0.1, 0.9]
    start = rng.uniform(0.2, 0.6, (b, 1, n, 4))
    steps = rng.uniform(-0.01, 0.01, (b, t, n, 4))
    bboxes = np.clip(start + np.cumsum(steps, axis=1), 0.05, 0.95)
    bboxes[..., 2] = bboxes[..., 0] + 0.1  # x2 > x1
    bboxes[..., 3] = bboxes[..., 1] + 0.1
    actions = np.asarray(bbox_seq_to_actions(jnp.asarray(bboxes, jnp.float32)))
    return dict(
        bboxes=jnp.asarray(bboxes, jnp.float32),
        actions=jnp.asarray(actions),
        type_ids=jnp.ones((b, t, n, 1), jnp.float32),
        existence=jnp.ones((b, t, n, 1), bool),
    )


def test_action_roundtrip():
    data = _fake_batch()
    actions = data["actions"]
    tokens = discretize_actions(actions)
    recovered = undiscretize_actions(tokens)
    # norms quantized to 16 bins over [0, 0.1]
    np.testing.assert_allclose(
        np.asarray(recovered[..., 1]),
        np.clip(np.asarray(actions[..., 1]), 0, 0.1),
        atol=0.1 / 15 / 2 + 1e-6,
    )


def test_bbox_actions_roundtrip():
    data = _fake_batch()
    bboxes = data["bboxes"]
    actions = bbox_seq_to_actions(bboxes)
    rebuilt = actions_to_bbox_seq(actions, bboxes[:, 0])
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(bboxes), atol=1e-4)


def test_normalize_track_ids():
    ids = np.asarray([[[7, 3, 0, 0], [7, 0, 3, 0]]])  # (1, 2, 4)
    out = normalize_track_ids(ids)
    assert out[0, 0, 0] == 0 and out[0, 0, 1] == 1  # first-seen order
    assert out[0, 0, 2] == -1  # non-leading zeros are padding
    assert out[0, 1, 2] == 1  # same raw id -> same slot


def test_process_data():
    b, t, n = 1, 4, 6
    rng = np.random.default_rng(0)
    obj = dict(
        bbox=rng.uniform(10, 400, (b, t, n, 4)).astype(np.float32),
        id_type=rng.integers(1, 5, (b, t, n)),
        track_id=np.tile(np.arange(1, n + 1), (b, t, 1)),
    )
    out = process_data(CFG, obj)
    assert out["actions"].shape == (b, t, n, 2, 2)
    assert out["bboxes"].max() <= 1.0 + 1e-6
    assert out["existence"].shape == (b, t, n, 1)


@pytest.fixture(scope="module")
def model_and_params():
    model = BboxPredictorLM(cfg=CFG)
    data = _fake_batch()
    params = jax.jit(lambda k: model.init(k, data))(jax.random.PRNGKey(0))
    return model, params, data


def test_model_forward_and_loss(model_and_params):
    model, params, data = model_and_params
    out = jax.jit(model.apply)(params, data)
    assert out["action_preds"].shape == (
        2, CFG.num_timesteps, CFG.max_num_agents, 2, CFG.vocabulary_size
    )
    loss = BboxPredictorLM.loss(CFG, out)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_model_trains(model_and_params):
    """A few gradient steps must reduce the CE loss."""
    import optax

    model, params, data = model_and_params
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return BboxPredictorLM.loss(CFG, model.apply(p, data))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_rollout_policy(model_and_params):
    model, params, data = model_and_params
    policy = BboxPredictorLMPolicy(CFG, model, params)
    pred = policy.rollout(data, jax.random.PRNGKey(0))
    assert pred.shape == data["bboxes"].shape
    # conditioning frames are seeded from GT
    np.testing.assert_allclose(
        np.asarray(pred[:, : CFG.initial_frames_condition_num]),
        np.asarray(data["bboxes"][:, : CFG.initial_frames_condition_num]),
        atol=1e-4,
    )
    frames = policy.render(np.asarray(pred[0]), np.asarray(data["type_ids"][0]))
    assert frames.shape == (CFG.num_timesteps, CFG.train_H, CFG.train_W, 3)
    scores = policy.score(frames, frames)
    assert scores["miou"] == 1.0
