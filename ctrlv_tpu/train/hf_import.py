"""HF (torch/safetensors) <-> flax parameter conversion.

Checkpoint compatibility is a north-star requirement (SURVEY.md §5
checkpoint row): SVD-XT weights in HF layout (`unet/`, `vae/`,
`image_encoder/` safetensors) must load into the flax modules, and trained
flax params must export back.

The flax modules were named so conversion is mechanical:
  torch "down_blocks.0.resnets.1.spatial_res_block.conv1.weight"
   -> flax ("down_blocks_0", "resnets_1", "spatial_res_block", "conv1", "kernel")
with tensor transforms:
  Linear weight (O,I)   -> kernel (I,O)
  Conv2d (O,I,kh,kw)    -> kernel (kh,kw,I,O)
  Conv3d (O,I,kt,kh,kw) -> kernel (kt,kh,kw,I,O)
  norm weight           -> scale
  embeddings (CLIP class/position) -> verbatim
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import flax
import numpy as np

# torch names copied verbatim (no transpose) into same-shaped flax params
_VERBATIM = ("class_embedding", "position_embedding")

# Literal diffusers submodule names containing _<digit> — these are NOT
# merged ModuleList indices and must NOT be split on export
# (TimestepEmbedding.linear_1/linear_2 in time_embedding, add_embedding,
# and every transformer time_pos_embed).
_LITERAL_UNDERSCORE_NAMES = frozenset({"linear_1", "linear_2"})


def torch_name_to_flax_path(name: str) -> Tuple[str, ...]:
    """Merge numeric components: a.b.0.c -> (a, b_0, c); rename leaves."""
    parts = name.split(".")
    merged = []
    for p in parts:
        if re.fullmatch(r"\d+", p) and merged:
            merged[-1] = merged[-1] + "_" + p
        else:
            merged.append(p)
    # transformers CLIP: drop the wrapper prefixes, fuse mlp.fcN.
    # Only strip `embeddings`/`encoder` inside a CLIP vision tower — the
    # VAE has its own top-level `encoder.` that must survive.
    if merged and merged[0] == "vision_model":
        merged = merged[1:]
        if merged and merged[0] in ("embeddings", "encoder"):
            merged = merged[1:]
    out = []
    for p in merged:
        if p == "mlp":
            continue
        if p in ("fc1", "fc2") and out:
            out.append("mlp_" + p)
        else:
            out.append(p)
    return tuple(out)


def _convert_tensor(path: Tuple[str, ...], arr: np.ndarray, leaf: str):
    """Returns (flax_leaf_name, converted array)."""
    if any(v in path for v in _VERBATIM):
        return None, arr  # param name == path[-1], no leaf suffix
    if leaf == "bias":
        return "bias", arr
    if leaf == "weight":
        if arr.ndim == 1:
            return "scale", arr
        if arr.ndim == 2:
            return "kernel", arr.T
        if arr.ndim == 4:
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            return "kernel", arr.transpose(2, 3, 4, 1, 0)
    return leaf, arr  # e.g. mix_factor


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    expected: Optional[Any] = None,
    strict: bool = True,
) -> Any:
    """Convert a torch state dict to a flax params tree.

    `expected`: an initialized flax params tree used to verify coverage and
    shapes (strongly recommended).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor)
        fpath = torch_name_to_flax_path(name)
        if any(v in fpath for v in _VERBATIM):
            # class_embedding / position_embedding: path already ends at the
            # param name; transformers appends ".weight" for nn.Embedding.
            if fpath[-1] == "weight":
                fpath = fpath[:-1]
            flat[fpath] = arr
            continue
        leaf = fpath[-1]
        new_leaf, conv = _convert_tensor(fpath[:-1], arr, leaf)
        flat[fpath[:-1] + (new_leaf,)] = conv

    if expected is not None:
        exp_flat = flax.traverse_util.flatten_dict(expected)
        missing = set(exp_flat) - set(flat)
        extra = set(flat) - set(exp_flat)
        shape_mismatch = {
            k: (flat[k].shape, np.shape(exp_flat[k]))
            for k in set(flat) & set(exp_flat)
            if tuple(flat[k].shape) != tuple(np.shape(exp_flat[k]))
        }
        if strict and (missing or shape_mismatch):
            raise ValueError(
                f"HF import mismatch: missing={sorted(missing)[:8]} "
                f"({len(missing)} total), extra={sorted(extra)[:8]} "
                f"({len(extra)} total), shape_mismatch={dict(list(shape_mismatch.items())[:4])}"
            )
        # fill any non-strict missing entries from expected (e.g. new heads)
        for k in missing:
            flat[k] = np.asarray(exp_flat[k])
        for k in extra:
            del flat[k]
        # cast to expected dtypes
        flat = {
            k: np.asarray(v, dtype=np.asarray(exp_flat[k]).dtype)
            for k, v in flat.items()
        }
    return flax.traverse_util.unflatten_dict(flat)


def _restore_clip_prefixes(name: str) -> str:
    """Re-add the transformers CLIPVisionModelWithProjection wrapper
    prefixes that torch_name_to_flax_path strips, so exported
    image_encoder safetensors load back into transformers."""
    head = name.split(".", 1)[0]
    if head == "visual_projection":
        return name
    if head in ("class_embedding", "patch_embedding", "position_embedding"):
        name = "embeddings." + name
        # nn.Embedding's weight suffix (stripped on import for verbatim keys)
        if name.endswith("position_embedding"):
            name += ".weight"
    elif head == "layers":
        name = "encoder." + name
    return "vision_model." + name


def flax_params_to_torch_state_dict(
    params: Any, component: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Inverse conversion for checkpoint export (HF-compatible names).

    component="image_encoder" restores the transformers CLIP
    `vision_model.{embeddings,encoder}.` wrapper prefixes.
    """
    flat = flax.traverse_util.flatten_dict(params)
    out: Dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        arr = np.asarray(arr)
        *prefix, leaf = path
        name_parts = []
        for p in prefix:
            m = re.fullmatch(r"(.+?)_(\d+)", p)
            if p in ("mlp_fc1", "mlp_fc2"):
                name_parts.extend(["mlp", p[4:]])
            elif (
                m
                and p not in _LITERAL_UNDERSCORE_NAMES
                and not m.group(1).startswith("mlp_fc")
            ):
                name_parts.extend([m.group(1), m.group(2)])
            else:
                name_parts.append(p)
        if leaf == "kernel":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 5:
                arr = arr.transpose(4, 3, 0, 1, 2)
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        elif leaf in _VERBATIM:
            name_parts.append(leaf)
            name = ".".join(name_parts)
            if component == "image_encoder":
                name = _restore_clip_prefixes(name)
            out[name] = arr
            continue
        name_parts.append(leaf)
        name = ".".join(name_parts)
        if component == "image_encoder":
            name = _restore_clip_prefixes(name)
        out[name] = arr
    return out


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            tensors[key] = f.get_tensor(key)
    return tensors


def load_hf_component(component_dir: str, expected=None, strict: bool = True):
    """Load an HF model directory (diffusers layout) into a flax tree.

    Supports `diffusion_pytorch_model.safetensors` / `model.safetensors`
    (sharded variants: all *.safetensors files merged).
    """
    files = sorted(
        f for f in os.listdir(component_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no safetensors in {component_dir}")
    state = {}
    for f in files:
        state.update(load_safetensors(os.path.join(component_dir, f)))
    return torch_state_dict_to_flax(state, expected=expected, strict=strict)
