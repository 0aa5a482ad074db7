"""Vendored SVD-XT state-dict manifests (keys + shapes).

These enumerate the exact torch state_dict of the models Ctrl-V loads /
saves (stabilityai/stable-video-diffusion-img2vid-xt components and the
reference's ControlNetModel), authored from the HF diffusers 0.27.2 module
layout that the reference pins (requirements.txt:3) and configures at
/root/reference/src/ctrlv/models/unet_spatio_temporal_condition.py:176-199
and /root/reference/src/ctrlv/models/controlnet.py:52-192.

They are the ground truth for checkpoint-compatibility tests: the flax
export must produce exactly these keys/shapes, and a synthetic state dict
built from them must strict-load into the flax modules. A naming bug
anywhere in the 1.5B-param tree is a test failure here, not a surprise
when real weights land.

Shapes are torch conventions: Linear (out, in); Conv2d (out, in, kh, kw);
Conv3d (out, in, kt, kh, kw); norms (C,).
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]


def _linear(d: Manifest, name: str, i: int, o: int, bias: bool = True) -> None:
    d[f"{name}.weight"] = (o, i)
    if bias:
        d[f"{name}.bias"] = (o,)


def _conv2d(d: Manifest, name: str, i: int, o: int, k: int) -> None:
    d[f"{name}.weight"] = (o, i, k, k)
    d[f"{name}.bias"] = (o,)


def _conv3d_t(d: Manifest, name: str, i: int, o: int) -> None:
    # temporal (3,1,1) conv
    d[f"{name}.weight"] = (o, i, 3, 1, 1)
    d[f"{name}.bias"] = (o,)


def _norm(d: Manifest, name: str, c: int) -> None:
    d[f"{name}.weight"] = (c,)
    d[f"{name}.bias"] = (c,)


def _timestep_embedding(d: Manifest, name: str, in_dim: int, embed_dim: int,
                        out_dim: int = 0) -> None:
    # diffusers TimestepEmbedding: linear_1 / linear_2 are LITERAL names
    # (underscore, not a ModuleList index).
    _linear(d, f"{name}.linear_1", in_dim, embed_dim)
    _linear(d, f"{name}.linear_2", embed_dim, out_dim or embed_dim)


def _attention(d: Manifest, name: str, query_dim: int, inner: int,
               cross_dim: int = 0, qkv_bias: bool = False) -> None:
    kv_in = cross_dim or query_dim
    _linear(d, f"{name}.to_q", query_dim, inner, bias=qkv_bias)
    _linear(d, f"{name}.to_k", kv_in, inner, bias=qkv_bias)
    _linear(d, f"{name}.to_v", kv_in, inner, bias=qkv_bias)
    _linear(d, f"{name}.to_out.0", inner, query_dim, bias=True)


def _feed_forward(d: Manifest, name: str, dim: int, dim_out: int = 0) -> None:
    inner = dim * 4
    _linear(d, f"{name}.net.0.proj", dim, inner * 2)  # GEGLU
    _linear(d, f"{name}.net.2", inner, dim_out or dim)


def _basic_transformer_block(d: Manifest, name: str, dim: int, cross: int) -> None:
    _norm(d, f"{name}.norm1", dim)
    _attention(d, f"{name}.attn1", dim, dim)
    _norm(d, f"{name}.norm2", dim)
    _attention(d, f"{name}.attn2", dim, dim, cross_dim=cross)
    _norm(d, f"{name}.norm3", dim)
    _feed_forward(d, f"{name}.ff", dim)


def _temporal_transformer_block(d: Manifest, name: str, dim: int, cross: int) -> None:
    _norm(d, f"{name}.norm_in", dim)
    _feed_forward(d, f"{name}.ff_in", dim, dim_out=dim)
    _norm(d, f"{name}.norm1", dim)
    _attention(d, f"{name}.attn1", dim, dim)
    _norm(d, f"{name}.norm2", dim)
    _attention(d, f"{name}.attn2", dim, dim, cross_dim=cross)
    _norm(d, f"{name}.norm3", dim)
    _feed_forward(d, f"{name}.ff", dim)


def _transformer_st(d: Manifest, name: str, channels: int, cross: int) -> None:
    """diffusers TransformerSpatioTemporalModel (num_layers=1)."""
    _norm(d, f"{name}.norm", channels)  # GroupNorm(32)
    _linear(d, f"{name}.proj_in", channels, channels)
    _basic_transformer_block(d, f"{name}.transformer_blocks.0", channels, cross)
    _temporal_transformer_block(
        d, f"{name}.temporal_transformer_blocks.0", channels, cross
    )
    _timestep_embedding(d, f"{name}.time_pos_embed", channels, channels * 4,
                        out_dim=channels)
    d[f"{name}.time_mixer.mix_factor"] = (1,)
    _linear(d, f"{name}.proj_out", channels, channels)


def _resnet2d(d: Manifest, name: str, i: int, o: int, temb: int = 0) -> None:
    _norm(d, f"{name}.norm1", i)
    _conv2d(d, f"{name}.conv1", i, o, 3)
    if temb:
        _linear(d, f"{name}.time_emb_proj", temb, o)
    _norm(d, f"{name}.norm2", o)
    _conv2d(d, f"{name}.conv2", o, o, 3)
    if i != o:
        _conv2d(d, f"{name}.conv_shortcut", i, o, 1)


def _temporal_resnet(d: Manifest, name: str, c: int, temb: int = 0) -> None:
    _norm(d, f"{name}.norm1", c)
    _conv3d_t(d, f"{name}.conv1", c, c)
    if temb:
        _linear(d, f"{name}.time_emb_proj", temb, c)
    _norm(d, f"{name}.norm2", c)
    _conv3d_t(d, f"{name}.conv2", c, c)


def _st_resblock(d: Manifest, name: str, i: int, o: int, temb: int = 0) -> None:
    """diffusers SpatioTemporalResBlock: spatial + temporal + AlphaBlender."""
    _resnet2d(d, f"{name}.spatial_res_block", i, o, temb=temb)
    _temporal_resnet(d, f"{name}.temporal_res_block", o, temb=temb)
    d[f"{name}.time_mixer.mix_factor"] = (1,)


# ---------------------------------------------------------------------------
# UNetSpatioTemporalConditionModel — SVD-XT config
# (in 8, out 4, channels (320,640,1280,1280), heads (5,10,20,20),
#  cross 1024, layers_per_block 2, addition_time_embed_dim 256,
#  projection_class_embeddings_input_dim 768)
# ---------------------------------------------------------------------------

_CH = (320, 640, 1280, 1280)
_HEADS = (5, 10, 20, 20)
_TEMB = 1280
_CROSS = 1024


def _unet_down_blocks(d: Manifest, prefix: str = "") -> None:
    in_ch = _CH[0]
    for bi, out_ch in enumerate(_CH):
        base = f"{prefix}down_blocks.{bi}"
        cross_attn = bi < 3  # last block is DownBlockSpatioTemporal
        for li in range(2):
            _st_resblock(d, f"{base}.resnets.{li}",
                         in_ch if li == 0 else out_ch, out_ch, temb=_TEMB)
            if cross_attn:
                _transformer_st(d, f"{base}.attentions.{li}", out_ch, _CROSS)
        if bi < len(_CH) - 1:
            _conv2d(d, f"{base}.downsamplers.0.conv", out_ch, out_ch, 3)
        in_ch = out_ch


def _unet_mid_block(d: Manifest, prefix: str = "") -> None:
    c = _CH[-1]
    base = f"{prefix}mid_block"
    _st_resblock(d, f"{base}.resnets.0", c, c, temb=_TEMB)
    _transformer_st(d, f"{base}.attentions.0", c, _CROSS)
    _st_resblock(d, f"{base}.resnets.1", c, c, temb=_TEMB)


def svd_xt_unet_manifest() -> Manifest:
    d: Manifest = {}
    _conv2d(d, "conv_in", 8, _CH[0], 3)
    _timestep_embedding(d, "time_embedding", _CH[0], _TEMB)
    _timestep_embedding(d, "add_embedding", 256 * 3, _TEMB)
    _unet_down_blocks(d)
    _unet_mid_block(d)

    # up path: reversed channels; 3 resnets per block; first block plain
    rev = tuple(reversed(_CH))  # (1280, 1280, 640, 320)
    prev = rev[0]
    for bi, out_ch in enumerate(rev):
        base = f"up_blocks.{bi}"
        skip_in = rev[min(bi + 1, len(rev) - 1)]
        cross_attn = bi > 0  # up_blocks.0 is UpBlockSpatioTemporal
        for li in range(3):
            res_skip = skip_in if li == 2 else out_ch
            res_in = prev if li == 0 else out_ch
            _st_resblock(d, f"{base}.resnets.{li}", res_in + res_skip, out_ch,
                         temb=_TEMB)
            if cross_attn:
                _transformer_st(d, f"{base}.attentions.{li}", out_ch, _CROSS)
        if bi < len(rev) - 1:
            _conv2d(d, f"{base}.upsamplers.0.conv", out_ch, out_ch, 3)
        prev = out_ch

    _norm(d, "conv_norm_out", _CH[0])
    _conv2d(d, "conv_out", _CH[0], 4, 3)
    return d


# ---------------------------------------------------------------------------
# Reference ControlNetModel (spatio-temporal) — from_unet(SVD-XT) config
# (/root/reference/src/ctrlv/models/controlnet.py:101-192)
# ---------------------------------------------------------------------------

def svd_xt_controlnet_manifest() -> Manifest:
    d: Manifest = {}
    _conv2d(d, "conv_in", 8, _CH[0], 3)
    _timestep_embedding(d, "time_embedding", _CH[0], _TEMB)
    _timestep_embedding(d, "add_embedding", 256 * 3, _TEMB)
    _conv2d(d, "control_conv_in", 4, _CH[0], 3)
    _unet_down_blocks(d)
    _unet_mid_block(d)
    # zero convs: conv_in + one per resnet output + one per downsampler
    res_channels = [_CH[0]]
    for bi, out_ch in enumerate(_CH):
        res_channels += [out_ch, out_ch]
        if bi < len(_CH) - 1:
            res_channels.append(out_ch)
    for i, c in enumerate(res_channels):
        _conv2d(d, f"controlnet_down_blocks.{i}", c, c, 1)
    _conv2d(d, "controlnet_mid_block", _CH[-1], _CH[-1], 1)
    return d


# ---------------------------------------------------------------------------
# AutoencoderKLTemporalDecoder — SVD config
# (in 3, latent 4, channels (128,256,512,512), layers_per_block 2)
# ---------------------------------------------------------------------------

_VCH = (128, 256, 512, 512)


def svd_xt_vae_manifest() -> Manifest:
    d: Manifest = {}
    # encoder (standard SD KL encoder, no time embedding)
    _conv2d(d, "encoder.conv_in", 3, _VCH[0], 3)
    in_ch = _VCH[0]
    for bi, out_ch in enumerate(_VCH):
        base = f"encoder.down_blocks.{bi}"
        for li in range(2):
            _resnet2d(d, f"{base}.resnets.{li}", in_ch if li == 0 else out_ch,
                      out_ch)
        if bi < len(_VCH) - 1:
            _conv2d(d, f"{base}.downsamplers.0.conv", out_ch, out_ch, 3)
        in_ch = out_ch
    c = _VCH[-1]
    _resnet2d(d, "encoder.mid_block.resnets.0", c, c)
    _norm(d, "encoder.mid_block.attentions.0.group_norm", c)
    _attention(d, "encoder.mid_block.attentions.0", c, c, qkv_bias=True)
    _resnet2d(d, "encoder.mid_block.resnets.1", c, c)
    _norm(d, "encoder.conv_norm_out", c)
    _conv2d(d, "encoder.conv_out", c, 8, 3)
    d["quant_conv.weight"] = (8, 8, 1, 1)
    d["quant_conv.bias"] = (8,)

    # TemporalDecoder
    _conv2d(d, "decoder.conv_in", 4, c, 3)
    _st_resblock(d, "decoder.mid_block.resnets.0", c, c)
    _norm(d, "decoder.mid_block.attentions.0.group_norm", c)
    _attention(d, "decoder.mid_block.attentions.0", c, c, qkv_bias=True)
    _st_resblock(d, "decoder.mid_block.resnets.1", c, c)
    rev = tuple(reversed(_VCH))  # (512, 512, 256, 128)
    prev = rev[0]
    for bi, out_ch in enumerate(rev):
        base = f"decoder.up_blocks.{bi}"
        for li in range(3):
            _st_resblock(d, f"{base}.resnets.{li}",
                         prev if li == 0 else out_ch, out_ch)
        if bi < len(rev) - 1:
            _conv2d(d, f"{base}.upsamplers.0.conv", out_ch, out_ch, 3)
        prev = out_ch
    _norm(d, "decoder.conv_norm_out", _VCH[0])
    _conv2d(d, "decoder.conv_out", _VCH[0], 3, 3)
    _conv3d_t(d, "decoder.time_conv_out", 3, 3)
    return d


# ---------------------------------------------------------------------------
# Kinetics-400 I3D (pytorch-i3d layout — the weights wrapped by the
# TorchScript graph the reference's FVD downloads, metrics/fvd.py:116-123)
# ---------------------------------------------------------------------------

_I3D_BLOCKS = (
    # (name, in_channels, (b0, b1a, b1b, b2a, b2b, b3b))
    ("Mixed_3b", 192, (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", 256, (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", 480, (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", 512, (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", 512, (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", 512, (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", 528, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", 832, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", 832, (384, 192, 384, 48, 128, 128)),
)


def _i3d_unit(d: Manifest, name: str, i: int, o: int, k: int) -> None:
    d[f"{name}.conv3d.weight"] = (o, i, k, k, k)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        d[f"{name}.bn.{leaf}"] = (o,)


def i3d_manifest() -> Manifest:
    d: Manifest = {}
    _i3d_unit(d, "Conv3d_1a_7x7", 3, 64, 7)
    _i3d_unit(d, "Conv3d_2b_1x1", 64, 64, 1)
    _i3d_unit(d, "Conv3d_2c_3x3", 64, 192, 3)
    for name, c_in, (b0, b1a, b1b, b2a, b2b, b3b) in _I3D_BLOCKS:
        _i3d_unit(d, f"{name}.b0", c_in, b0, 1)
        _i3d_unit(d, f"{name}.b1a", c_in, b1a, 1)
        _i3d_unit(d, f"{name}.b1b", b1a, b1b, 3)
        _i3d_unit(d, f"{name}.b2a", c_in, b2a, 1)
        _i3d_unit(d, f"{name}.b2b", b2a, b2b, 3)
        _i3d_unit(d, f"{name}.b3b", c_in, b3b, 1)
    d["logits.conv3d.weight"] = (400, 1024, 1, 1, 1)
    d["logits.conv3d.bias"] = (400,)
    return d


# ---------------------------------------------------------------------------
# CLIP ViT-H/14 image encoder (transformers CLIPVisionModelWithProjection).
# Generated live from the installed transformers library in tests (meta
# device, no weight materialization) — authoritative, not hand-authored.
# ---------------------------------------------------------------------------

def clip_vit_h_manifest() -> Manifest:
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=1280,
        intermediate_size=5120,
        num_hidden_layers=32,
        num_attention_heads=16,
        image_size=224,
        patch_size=14,
        projection_dim=1024,
        hidden_act="gelu",
    )
    with torch.device("meta"):
        model = CLIPVisionModelWithProjection(cfg)
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}
