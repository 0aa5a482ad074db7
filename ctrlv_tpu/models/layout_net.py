"""LayoutNet: GPT-2 causal transformer over flattened layout vectors.

Behavioral parity: /root/reference/src/ctrlv/models/layout_net.py —
linear in-projection (n_layout+1024 -> n_embd, no bias), GPT-2 trunk
(learned positions, pre-LN blocks, gelu_new MLP), linear out-projection
(n_embd -> n_layout, no bias), MSE next-token loss over shifted sequences.
GPT-2 is implemented natively in flax (no torch dependency).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Dtype


@dataclasses.dataclass(frozen=True)
class LayoutNetConfig:
    n_layout: int = 1024
    n_cond: int = 1024  # extra conditioning channels appended to layout
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5

    @classmethod
    def tiny(cls) -> "LayoutNetConfig":
        return cls(n_layout=16, n_cond=8, n_positions=32, n_embd=32, n_layer=2, n_head=2)


class GPT2Block(nn.Module):
    config: LayoutNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, c = x.shape
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=jnp.float32, name="ln_1")(
            x
        ).astype(self.dtype)
        qkv = nn.Dense(3 * cfg.n_embd, dtype=self.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = cfg.n_embd // cfg.n_head
        q = q.reshape(b, s, cfg.n_head, head_dim)
        k = k.reshape(b, s, cfg.n_head, head_dim)
        v = v.reshape(b, s, cfg.n_head, head_dim)
        # causal attention (explicit mask — GPT2 semantics)
        scale = head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None], logits, -1e9)
        weights = jnp.exp(logits - logits.max(-1, keepdims=True))
        weights = weights / weights.sum(-1, keepdims=True)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(self.dtype), v)
        attn = attn.reshape(b, s, cfg.n_embd)
        x = x + nn.Dense(cfg.n_embd, dtype=self.dtype, name="c_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=jnp.float32, name="ln_2")(
            x
        ).astype(self.dtype)
        h = nn.Dense(4 * cfg.n_embd, dtype=self.dtype, name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=True)  # gelu_new
        h = nn.Dense(cfg.n_embd, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class LayoutNet(nn.Module):
    config: LayoutNetConfig = LayoutNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,  # (B, S, n_layout + n_cond)
        labels: Optional[jnp.ndarray] = None,  # (B, S, n_layout)
    ):
        cfg = self.config
        b, s, _ = inputs_embeds.shape
        x = nn.Dense(cfg.n_embd, use_bias=False, dtype=self.dtype, name="layout_in")(
            inputs_embeds.astype(self.dtype)
        )
        wpe = self.param(
            "wpe", nn.initializers.normal(0.02), (cfg.n_positions, cfg.n_embd)
        )
        x = x + wpe[None, :s].astype(self.dtype)
        for i in range(cfg.n_layer):
            x = GPT2Block(cfg, dtype=self.dtype, name=f"h_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=jnp.float32, name="ln_f")(
            x
        ).astype(self.dtype)
        pred = nn.Dense(cfg.n_layout, use_bias=False, dtype=self.dtype, name="layout_out")(x)

        loss = None
        if labels is not None:
            shift_pred = pred[:, :-1].astype(jnp.float32)
            shift_labels = labels[:, 1:].astype(jnp.float32)
            loss = jnp.mean((shift_pred - shift_labels) ** 2)
        return pred, loss
