"""AR bbox predictor LM: encoder/decoder transformer in flax.

Behavioral parity: /root/reference/src/ctrlv/bbox_generator_baseline/
{models/bbox_predictor_lm.py, modules/encoder.py, modules/decoder.py}:
  - encoder: state MLP over (bbox4 ++ type) + tokenized-action embeddings
    (two corner tokens, concat+linear), agent-id + sinusoidal timestep
    embeddings, existence masking, TransformerEncoder over the
    conditioning frames (first K, optionally + last) with key padding,
    optional image-context tokens appended,
  - decoder: TransformerDecoder (post-LN, relu FF) with the block-causal
    mask that exposes all agents' tokens up to the current timestep, key
    padding from existence; MLP head -> 2 action tokens x vocab,
  - loss: CE over discretized actions masked by existence (or coords
    tokens/regression + existence head in the coords variants).

TPU-first deltas: invalid batches (an empty frame) are masked out of the
loss instead of dropped (static shapes); the causal mask is built as one
vectorized jnp expression.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .actions import discretize_actions
from .config import BaselineConfig


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(max_len)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def block_causal_mask(num_timesteps: int, num_agents: int) -> jnp.ndarray:
    """(T*N, T*N) bool: token (t,a) attends to every token with t' <= t.

    This is the net effect of the reference's causal x multi-agent x
    current-state-visible mask composition (decoder.py:33-63) with one
    token type per agent-step.
    """
    t_of = jnp.arange(num_timesteps * num_agents) // num_agents
    return t_of[None, :] <= t_of[:, None]


class MLPLayer(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class TransformerLayer(nn.Module):
    """Post-LN transformer layer (torch nn.TransformerEncoder/DecoderLayer
    default flavor: attn -> add&norm -> [cross -> add&norm] -> relu-FF ->
    add&norm)."""

    hidden: int
    heads: int
    ffn: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, key_pad=None, memory=None, mem_pad=None):
        def mha(q, kv, mask, name):
            b, sq, c = q.shape
            heads = self.heads
            hd = c // heads
            qq = nn.Dense(c, name=f"{name}_q")(q).reshape(b, sq, heads, hd)
            kk = nn.Dense(c, name=f"{name}_k")(kv).reshape(b, kv.shape[1], heads, hd)
            vv = nn.Dense(c, name=f"{name}_v")(kv).reshape(b, kv.shape[1], heads, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk) / jnp.sqrt(hd)
            if mask is not None:
                logits = jnp.where(mask, logits, -1e9)
            w = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, vv).reshape(b, sq, c)
            return nn.Dense(c, name=f"{name}_o")(out)

        # self-attention
        mask = None
        if attn_mask is not None:
            mask = attn_mask[None, None]
        if key_pad is not None:
            kp = (~key_pad)[:, None, None, :]  # True=masked-out
            mask = kp if mask is None else (mask & kp)
        x = nn.LayerNorm(name="norm1")(x + mha(x, x, mask, "self_attn"))

        if self.cross:
            cmask = None
            if mem_pad is not None:
                cmask = (~mem_pad)[:, None, None, :]
            x = nn.LayerNorm(name="norm2")(x + mha(x, memory, cmask, "cross_attn"))

        h = nn.Dense(self.ffn, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, name="linear2")(h)
        x = nn.LayerNorm(name="norm3")(x + h)
        return x


class BboxPredictorLM(nn.Module):
    cfg: BaselineConfig = BaselineConfig()

    @nn.compact
    def __call__(
        self,
        data: Dict[str, jnp.ndarray],
        image_tokens: Optional[jnp.ndarray] = None,  # (B, M, hidden) context
        actions_override: Optional[jnp.ndarray] = None,  # tokens for rollout
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        hidden = cfg.hidden_dim
        n = cfg.max_num_agents
        bboxes = data["bboxes"][:, :, :n]
        type_ids = data["type_ids"][:, :, :n]
        existence = data["existence"][:, :, :n].astype(jnp.float32)
        b, t = bboxes.shape[:2]

        if cfg.last_frame_traj:
            x1, y1, x2, y2 = (bboxes[:, -1, :, i] for i in range(4))
            cx = (jnp.maximum(x1, x2) + jnp.minimum(x1, x2)) / 2
            cy = (jnp.maximum(y1, y2) + jnp.minimum(y1, y2)) / 2
            last = jnp.stack([cx, cy, jnp.zeros_like(cx), jnp.zeros_like(cy)], -1)
            bboxes = bboxes.at[:, -1].set(last)

        # --- embeddings ------------------------------------------------
        states = jnp.concatenate([bboxes, type_ids], axis=-1)
        state_emb = MLPLayer(hidden, hidden, name="embed_state")(states)

        if actions_override is not None:
            tokens = actions_override.astype(jnp.int32)
        elif cfg.pred_coords:
            from .actions import discretize_coords

            tokens = discretize_coords(data["coords"][:, :, :n], cfg.vocabulary_size)
        else:
            tokens = discretize_actions(
                data["actions"][:, :, :n], cfg.dir_disc, cfg.norm_disc
            ).astype(jnp.int32)

        embed_action = nn.Embed(cfg.vocabulary_size, hidden, name="embed_action")
        if tokens.shape[-1] == 2:
            a_emb = jnp.concatenate(
                [embed_action(tokens[..., 0]), embed_action(tokens[..., 1])], axis=-1
            )
        else:  # coords: 4 tokens
            a_emb = jnp.concatenate(
                [embed_action(tokens[..., i]) for i in range(tokens.shape[-1])], axis=-1
            )
        action_emb = nn.Dense(hidden, name="embed_action_combine")(a_emb)

        id_emb = nn.Embed(n, hidden, name="embed_agent_id")(jnp.arange(n))[None, None]
        pe = sinusoidal_positions(cfg.num_timesteps, hidden)[None, :t, None]

        emb = state_emb + action_emb + id_emb + pe

        if cfg.only_keep_initial_agents:
            init_exist = existence[:, 0:1]
            if cfg.always_predict_initial_agents:
                existence = jnp.broadcast_to(init_exist, existence.shape)
            else:
                existence = existence * init_exist
        emb = emb * existence

        # valid batches: at least one live agent at every timestep
        valid_batch = jnp.all(jnp.sum(existence[..., 0], axis=2) > 0, axis=1)

        # --- encoder over conditioning frames --------------------------
        k = cfg.initial_frames_condition_num
        cond_emb = emb[:, :k]
        cond_exist = existence[:, :k]
        if cfg.condition_last_frame:
            cond_emb = jnp.concatenate([cond_emb, emb[:, -1:]], axis=1)
            cond_exist = jnp.concatenate([cond_exist, existence[:, -1:]], axis=1)
        cond_emb = cond_emb.reshape(b, -1, hidden)
        cond_valid = cond_exist.reshape(b, -1) > 0  # True = attendable

        if image_tokens is not None:
            cond_emb = jnp.concatenate([cond_emb, image_tokens], axis=1)
            cond_valid = jnp.concatenate(
                [cond_valid, jnp.ones(image_tokens.shape[:2], bool)], axis=1
            )

        enc = cond_emb
        for i in range(cfg.num_encoder_layers):
            enc = TransformerLayer(
                hidden, cfg.num_heads, cfg.dim_feedforward, name=f"encoder_{i}"
            )(enc, key_pad=cond_valid)
        n_cond_tokens = cond_exist.reshape(b, -1).shape[1]
        enc = enc.at[:, :n_cond_tokens].multiply(
            cond_exist.reshape(b, -1, 1)
        )

        # --- decoder over the full token sequence ----------------------
        if cfg.use_state_embeddings:
            dec_in = emb
        else:
            dec_in = (action_emb + id_emb + pe) * existence
        dec_in = dec_in.reshape(b, t * n, hidden)
        dec_in = nn.LayerNorm(name="embedding_layer_norm")(dec_in)

        tgt_valid = existence[..., 0].reshape(b, t * n) > 0
        causal = block_causal_mask(t, n)
        dec = dec_in
        for i in range(cfg.num_decoder_layers):
            dec = TransformerLayer(
                hidden, cfg.num_heads, cfg.dim_feedforward, cross=True,
                name=f"decoder_{i}",
            )(dec, attn_mask=causal, key_pad=tgt_valid, memory=enc, mem_pad=cond_valid)

        out = dict(
            actions_tokenized=tokens,
            existence=existence,
            valid_batch=valid_batch,
        )
        if cfg.pred_coords and cfg.regression:
            # coords-regression variant (modules/decoder_coords.py):
            # direct (x1,y1,x2,y2) prediction head instead of token logits.
            out["coord_preds"] = MLPLayer(hidden, 4, name="predict_coords")(
                dec
            ).reshape(b, t, n, 4)
            out["coords"] = data["coords"][:, :, :n]
        else:
            num_outputs = 4 if cfg.pred_coords else 2
            head = MLPLayer(
                hidden, cfg.vocabulary_size * num_outputs, name="predict_actions"
            )(dec)
            out["action_preds"] = head.reshape(
                b, t, n, num_outputs, cfg.vocabulary_size
            )
        if cfg.existence_head:
            out["existence_preds"] = MLPLayer(hidden, 1, name="predict_existence")(
                dec
            ).reshape(b, t, n)
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def loss(cfg: BaselineConfig, outputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Shifted CE over action tokens (or coord MSE for the regression
        variant) masked by existence + validity."""
        exist_all = outputs["existence"][:, 1:, :, 0]
        valid_all = outputs["valid_batch"].astype(jnp.float32)[:, None, None]
        if "coord_preds" in outputs:
            pred = outputs["coord_preds"][:, :-1].astype(jnp.float32)
            target = outputs["coords"][:, 1:].astype(jnp.float32)
            mask = (exist_all * valid_all)[..., None]
            sq = (pred - target) ** 2 * mask
            loss = jnp.sum(sq) / jnp.maximum(jnp.sum(mask) * 4, 1.0)
            loss = loss * cfg.coords_loss_weight
            if cfg.existence_head and "existence_preds" in outputs:
                ep = outputs["existence_preds"][:, :-1].astype(jnp.float32)
                bce = jnp.maximum(ep, 0) - ep * exist_all + jnp.log1p(
                    jnp.exp(-jnp.abs(ep))
                )
                loss = loss + cfg.existence_loss_weight * jnp.mean(bce)
            return loss
        preds = outputs["action_preds"][:, :-1]  # predict t+1 from <=t
        targets = outputs["actions_tokenized"][:, 1:].astype(jnp.int32)
        exist = outputs["existence"][:, 1:, :, 0]
        valid = outputs["valid_batch"].astype(jnp.float32)[:, None, None, None]

        logp = jax.nn.log_softmax(preds.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = exist[..., None] * valid
        total = jnp.sum(nll * mask)
        count = jnp.maximum(jnp.sum(mask), 1.0)
        loss = total / count

        if cfg.existence_head and "existence_preds" in outputs:
            ep = outputs["existence_preds"][:, :-1].astype(jnp.float32)
            et = exist
            bce = jnp.maximum(ep, 0) - ep * et + jnp.log1p(jnp.exp(-jnp.abs(ep)))
            loss = loss + cfg.existence_loss_weight * jnp.mean(bce)
        return loss
