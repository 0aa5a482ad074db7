"""HF checkpoint conversion tests.

The strongest signal we can get without network access: build a *real*
transformers torch CLIPVisionModelWithProjection (random weights), convert
its state dict with torch_state_dict_to_flax, and check our flax CLIP
produces the same image_embeds. This validates LayerNorm/attention/MLP
numerics and the whole name/transpose mapping in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.models import CLIPVisionConfig, CLIPVisionModelWithProjection
from ctrlv_tpu.train import flax_params_to_torch_state_dict, torch_state_dict_to_flax


@pytest.fixture(scope="module")
def torch_clip():
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    cfg = HFConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=28,
        patch_size=14,
        projection_dim=48,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = HFModel(cfg).eval()
    return model


def test_clip_torch_parity(torch_clip):
    import torch

    cfg = CLIPVisionConfig.tiny()
    flax_model = CLIPVisionModelWithProjection(config=cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    template = jax.jit(lambda k: flax_model.init(k, x))(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = {"params": torch_state_dict_to_flax(sd, expected=template["params"])}

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = torch_clip(pixel_values=torch.from_numpy(img)).image_embeds.numpy()

    ours = np.asarray(
        jax.jit(flax_model.apply)(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_roundtrip_export(torch_clip):
    """flax -> torch names -> flax is the identity."""
    cfg = CLIPVisionConfig.tiny()
    flax_model = CLIPVisionModelWithProjection(config=cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(lambda k: flax_model.init(k, x))(jax.random.PRNGKey(0))["params"]

    sd = flax_params_to_torch_state_dict(params)
    back = torch_state_dict_to_flax(sd, expected=params)
    import flax as flax_lib

    f0 = flax_lib.traverse_util.flatten_dict(params)
    f1 = flax_lib.traverse_util.flatten_dict(back)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]))


def test_torch_name_mapping_unet_style():
    from ctrlv_tpu.train.hf_import import torch_name_to_flax_path

    assert torch_name_to_flax_path(
        "down_blocks.0.resnets.1.spatial_res_block.conv1.weight"
    ) == ("down_blocks_0", "resnets_1", "spatial_res_block", "conv1", "weight")
    assert torch_name_to_flax_path(
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_out.0.weight"
    ) == (
        "down_blocks_0", "attentions_1", "transformer_blocks_0", "attn1",
        "to_out_0", "weight",
    )
    assert torch_name_to_flax_path("mid_block.attentions.0.ff.net.0.proj.bias") == (
        "mid_block", "attentions_0", "ff", "net_0", "proj", "bias",
    )
    assert torch_name_to_flax_path(
        "vision_model.encoder.layers.3.mlp.fc1.weight"
    ) == ("layers_3", "mlp_fc1", "weight")
