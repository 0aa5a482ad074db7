"""LoRA adapters over attention projections (functional pytrees).

Behavioral parity: the reference's rank-4 PEFT LoRA on to_q/to_k/to_v/
to_out.0 (/root/reference/tools/train_video_diffusion.py:127-137).

TPU-native design: instead of module surgery, LoRA lives as a separate
pytree {path -> {"a": (in,r), "b": (r,out)}} merged functionally into the
base params before `apply` (W_eff = W + B@A * scale). Only the LoRA tree is
trainable; merging is a cheap fused matmul at step time.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


def _is_lora_target(path: Tuple[str, ...]) -> bool:
    return len(path) >= 2 and path[-1] == "kernel" and path[-2] in LORA_TARGETS


def lora_init(rng: jax.Array, params: Any, rank: int = 4) -> Dict:
    """Create zero-impact LoRA tree: A ~ N(0, 1/r), B = 0."""
    flat = flax.traverse_util.flatten_dict(params)
    lora = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    i = 0
    for path, kernel in flat.items():
        if _is_lora_target(path):
            d_in, d_out = kernel.shape
            lora[path] = {
                "a": jax.random.normal(keys[i], (d_in, rank), kernel.dtype) / rank,
                "b": jnp.zeros((rank, d_out), kernel.dtype),
            }
            i += 1
    return lora


def apply_lora(params: Any, lora: Dict, scale: float = 1.0) -> Any:
    """W_eff = W + (A @ B) * scale for each adapted kernel."""
    flat = dict(flax.traverse_util.flatten_dict(params))
    for path, ab in lora.items():
        flat[path] = flat[path] + (ab["a"] @ ab["b"]) * scale
    return flax.traverse_util.unflatten_dict(flat)


def merge_lora(params: Any, lora: Dict, scale: float = 1.0) -> Any:
    """Permanently bake LoRA deltas into the base params (export path)."""
    return apply_lora(params, lora, scale)
