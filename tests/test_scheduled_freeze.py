"""Scheduled temporal-only switch (reference
train_video_diffusion.py:375-387: full finetune until global_step >=
backprop_temporal_blocks_start_iter, temporal-only after, optimizer state
cleared at the switch) — tested at the optax-transform level."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ctrlv_tpu.train.state import make_optimizer, scheduled_freeze, trainable_mask


def _params():
    return {
        "block": {
            "temporal_transformer_blocks_0": {"kernel": jnp.ones((3,))},
            "attn1": {"kernel": jnp.ones((3,))},
        }
    }


def _mask(params):
    return trainable_mask(
        params, lambda path: any("temporal_transformer_blocks" in p for p in path)
    )


def test_switch_freezes_non_temporal_after_start_iter():
    params = _params()
    tx = make_optimizer(
        learning_rate=0.1,
        adam_weight_decay=0.1,  # nonzero: catches weight-decay leaks on frozen leaves
        scheduled_mask=_mask(params),
        freeze_start_iter=2,
        nan_guard_steps=0,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    history = [params]
    for _ in range(4):
        params, opt_state = step(params, opt_state)
        history.append(params)

    def leaf(p, name):
        return np.asarray(p["block"][name]["kernel"])

    # steps 1-2 (counts 0,1 < start_iter): everything trains
    for i in (1, 2):
        assert not np.allclose(leaf(history[i], "attn1"), leaf(history[i - 1], "attn1"))
        assert not np.allclose(
            leaf(history[i], "temporal_transformer_blocks_0"),
            leaf(history[i - 1], "temporal_transformer_blocks_0"),
        )
    # steps 3-4 (counts 2,3 >= start_iter): non-temporal params frozen EXACTLY
    for i in (3, 4):
        np.testing.assert_array_equal(
            leaf(history[i], "attn1"), leaf(history[2], "attn1")
        )
        assert not np.allclose(
            leaf(history[i], "temporal_transformer_blocks_0"),
            leaf(history[i - 1], "temporal_transformer_blocks_0"),
        )


def test_switch_resets_inner_state():
    params = _params()
    inner = optax.adam(0.1)
    tx = scheduled_freeze(inner, _mask(params), start_iter=2)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    up = jax.jit(lambda g, s, p: tx.update(g, s, p))
    for expected_count in range(3):
        assert int(opt_state["count"]) == expected_count
        _, opt_state = up(grads, opt_state, params)
    # the switch step re-initialized adam's moments before applying: its
    # count restarted from 0 (reference's optimizer.state.clear())
    inner_count = opt_state["inner"][0].count
    assert int(inner_count) == 1  # reset at count==2, then one update


def test_start_iter_zero_equals_static_mask():
    params = _params()
    mask = _mask(params)
    tx_sched = make_optimizer(
        learning_rate=0.1, scheduled_mask=mask, freeze_start_iter=0, nan_guard_steps=0
    )
    tx_static = make_optimizer(learning_rate=0.1, mask=mask, nan_guard_steps=0)
    grads = jax.tree.map(jnp.ones_like, params)
    p1 = optax.apply_updates(
        params, tx_sched.update(grads, tx_sched.init(params), params)[0]
    )
    p2 = optax.apply_updates(
        params, tx_static.update(grads, tx_static.init(params), params)[0]
    )
    np.testing.assert_allclose(
        np.asarray(p1["block"]["attn1"]["kernel"]),
        np.asarray(p2["block"]["attn1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(p1["block"]["temporal_transformer_blocks_0"]["kernel"]),
        np.asarray(p2["block"]["temporal_transformer_blocks_0"]["kernel"]),
        rtol=1e-6,
    )


def test_bool_flags_support_no_prefix():
    from ctrlv_tpu.utils import parse_args

    cfg = parse_args(["--no-use_preplotted_bbox", "--predict_bbox"])
    assert cfg.use_preplotted_bbox is False
    assert cfg.predict_bbox is True
    assert parse_args([]).use_preplotted_bbox is True
