"""Final-pipeline export in HF diffusers layout (safetensors + config).

Parity: the reference's `pipeline.save_pretrained(output_dir)` at the end
of training (/root/reference/tools/train_video_diffusion.py:596-604) —
writes `unet/`, `vae/`, `image_encoder/` (and `control_net/`) subfolders
each holding a safetensors file named like diffusers expects, so the
exported weights load back into torch/diffusers *and* into this framework
(ctrlv_tpu.train.hf_import.load_hf_component round-trips them).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from .hf_import import flax_params_to_torch_state_dict

_WEIGHT_NAMES = {
    "unet": "diffusion_pytorch_model.safetensors",
    "vae": "diffusion_pytorch_model.safetensors",
    "control_net": "diffusion_pytorch_model.safetensors",
    "controlnet": "diffusion_pytorch_model.safetensors",
    "image_encoder": "model.safetensors",
}


def save_component(
    out_dir: str,
    name: str,
    params: Any,
    config: Optional[Any] = None,
) -> str:
    """Write one model component in HF layout; returns the directory."""
    from safetensors.numpy import save_file

    comp_dir = os.path.join(out_dir, name)
    os.makedirs(comp_dir, exist_ok=True)
    tree = params["params"] if isinstance(params, dict) and "params" in params else params
    sd = flax_params_to_torch_state_dict(
        tree, component="image_encoder" if name == "image_encoder" else None
    )
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(comp_dir, _WEIGHT_NAMES.get(name, "model.safetensors")))
    if config is not None:
        cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
        with open(os.path.join(comp_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)
    return comp_dir


def save_pipeline(
    out_dir: str,
    unet_params=None,
    unet_config=None,
    vae_params=None,
    vae_config=None,
    clip_params=None,
    clip_config=None,
    controlnet_params=None,
    controlnet_config=None,
) -> str:
    """Write the full pipeline directory (HF diffusers layout)."""
    os.makedirs(out_dir, exist_ok=True)
    if unet_params is not None:
        save_component(out_dir, "unet", unet_params, unet_config)
    if vae_params is not None:
        save_component(out_dir, "vae", vae_params, vae_config)
    if clip_params is not None:
        save_component(out_dir, "image_encoder", clip_params, clip_config)
    if controlnet_params is not None:
        save_component(out_dir, "control_net", controlnet_params, controlnet_config)
    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump({"_class_name": "StableVideoControlPipeline"}, f, indent=2)
    return out_dir
