"""Full-size numeric goldens for the UNet-ST / VAE converter paths
(VERDICT r4 #8): tests/test_manifest_parity.py proves names/shapes over
all ~700 keys and test_torch_parity.py proves micro-level tensor
transforms, but no real tensor had flowed through the full-size UNet/VAE
name-mapping the way the r4 goldens do for CLIP/LPIPS/I3D.

This generator builds TORCH transliterations of two real-channel-size
blocks — the SVD UNet's down_blocks.1 (CrossAttnDownBlockSpatioTemporal,
320->640, 10 heads: exercises conv_shortcut, both transformer families,
time_pos_embed, AlphaBlenders, downsampler) and the VAE TemporalDecoder's
up_blocks.2 (512->256, learned-merge ST resblocks + upsampler) — loads
deterministic synthetic weights THROUGH the manifest (strict
load_state_dict doubles as a torch-side manifest check), and freezes the
torch forward as the golden. The torch modules transliterate the
diffusers semantics the flax modules implement (reference spec:
diffusers unet_spatio_temporal_condition.py:176-199 via
/root/reference/src/ctrlv/models/controlnet.py:157-192); they are a
ground-truth path independent of the flax code.

Weights are NOT stored (~100 MB): they regenerate deterministically from
numpy seeds + the in-tree manifests. The npz holds inputs + expected
outputs only; tests/test_golden_fixtures.py replays them torch-free.

Regenerate (requires torch):
    JAX_PLATFORMS=cpu python tests/fixtures/make_unet_goldens.py
"""

import math
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(Path(__file__).resolve().parent))

OUT = Path(__file__).resolve().parent

from svd_manifests import svd_xt_unet_manifest, svd_xt_vae_manifest  # noqa: E402

# ---------------------------------------------------------------------------
# deterministic synthetic state dicts from the manifests
# ---------------------------------------------------------------------------


def block_manifest(full, prefix):
    return {
        k[len(prefix):]: v for k, v in full.items() if k.startswith(prefix)
    }


def unet_downblock1_manifest():
    return block_manifest(svd_xt_unet_manifest(), "down_blocks.1.")


def vae_upblock2_manifest():
    return block_manifest(svd_xt_vae_manifest(), "decoder.up_blocks.2.")


def synthetic_sd(manifest, seed):
    """Numpy-deterministic weights: norm scales ~N(1,.05), mix_factor
    mid-range, everything else ~N(0,.02) — GN/LN keep activations bounded."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in sorted(manifest.items()):
        if k.endswith("mix_factor"):
            sd[k] = np.asarray([0.3], np.float32)
        elif (".norm" in k or "norm_" in k) and k.endswith(".weight") and len(shape) == 1:
            sd[k] = (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
        else:
            sd[k] = (0.02 * rng.standard_normal(shape)).astype(np.float32)
    return sd


def unet_golden_inputs(seed=123):
    """B=1, F=3, 16x16 spatial, real channels (320 in)."""
    rng = np.random.default_rng(seed)
    bf = 3
    x = rng.standard_normal((bf, 16, 16, 320)).astype(np.float32)
    temb = rng.standard_normal((bf, 1280)).astype(np.float32)
    enc = rng.standard_normal((bf, 1, 1024)).astype(np.float32)
    return x, temb, enc


def vae_golden_inputs(seed=321):
    rng = np.random.default_rng(seed)
    bf = 3
    x = rng.standard_normal((bf, 8, 8, 512)).astype(np.float32)
    return (x,)


# ---------------------------------------------------------------------------
# torch transliterations (generation-time only; tests never import these)
# ---------------------------------------------------------------------------


def _build_torch_modules():
    import torch
    from torch import nn
    import torch.nn.functional as F

    class ResnetBlock2D(nn.Module):
        def __init__(self, cin, cout, temb=1280, eps=1e-5):
            super().__init__()
            self.norm1 = nn.GroupNorm(32, cin, eps=eps)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            if temb:
                self.time_emb_proj = nn.Linear(temb, cout)
            self.norm2 = nn.GroupNorm(32, cout, eps=eps)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.conv_shortcut = nn.Conv2d(cin, cout, 1)

        def forward(self, x, temb=None):
            res = x
            h = self.conv1(F.silu(self.norm1(x)))
            if temb is not None:
                h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
            h = self.conv2(F.silu(self.norm2(h)))
            if hasattr(self, "conv_shortcut"):
                res = self.conv_shortcut(res)
            return h + res

    class TemporalResnetBlock(nn.Module):
        """(3,1,1) convs over (B, C, F, H, W)."""

        def __init__(self, c, temb=1280, eps=1e-5):
            super().__init__()
            self.norm1 = nn.GroupNorm(32, c, eps=eps)
            self.conv1 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
            if temb:
                self.time_emb_proj = nn.Linear(temb, c)
            self.norm2 = nn.GroupNorm(32, c, eps=eps)
            self.conv2 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

        def forward(self, x, temb=None):
            res = x
            h = self.conv1(F.silu(self.norm1(x)))
            if temb is not None:
                # temb (B, F, T) -> (B, C, F, 1, 1)
                proj = self.time_emb_proj(F.silu(temb))
                h = h + proj.permute(0, 2, 1)[:, :, :, None, None]
            h = self.conv2(F.silu(self.norm2(h)))
            return h + res

    class AlphaBlender(nn.Module):
        def __init__(self, alpha=0.5, strategy="learned_with_images", switch=False):
            super().__init__()
            self.strategy = strategy
            self.switch = switch
            self.mix_factor = nn.Parameter(torch.tensor([alpha]))

        def forward(self, x_spatial, x_temporal, indicator=None, ndims_after=0):
            a = torch.sigmoid(self.mix_factor)[0]
            if self.strategy == "learned_with_images":
                is_img = indicator.reshape(-1).bool()
                a = torch.where(is_img, torch.ones_like(a), a)
                a = a.reshape(a.shape + (1,) * ndims_after)
            if self.switch:
                a = 1.0 - a
            return a * x_spatial + (1.0 - a) * x_temporal

    class SpatioTemporalResBlock(nn.Module):
        def __init__(self, cin, cout, temb=1280, eps=1e-5,
                     merge_factor=0.5, merge_strategy="learned_with_images"):
            super().__init__()
            self.spatial_res_block = ResnetBlock2D(cin, cout, temb, eps)
            self.temporal_res_block = TemporalResnetBlock(cout, temb, eps)
            self.time_mixer = AlphaBlender(merge_factor, merge_strategy, switch=True)

        def forward(self, x, temb, indicator):
            f = indicator.shape[-1]
            h = self.spatial_res_block(x, temb)  # (bf, C, H, W)
            bf, c, hh, ww = h.shape
            b = bf // f
            xt = h.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
            temb_f = temb.reshape(b, f, -1) if temb is not None else None
            xt = self.temporal_res_block(xt, temb_f)
            xt = xt.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)
            return self.time_mixer(h, xt, indicator, ndims_after=3)

    class Attention(nn.Module):
        def __init__(self, query_dim, heads, dim_head, cross_dim=None):
            super().__init__()
            inner = heads * dim_head
            self.heads, self.dim_head = heads, dim_head
            kv = cross_dim or query_dim
            self.to_q = nn.Linear(query_dim, inner, bias=False)
            self.to_k = nn.Linear(kv, inner, bias=False)
            self.to_v = nn.Linear(kv, inner, bias=False)
            self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

        def forward(self, x, context=None):
            ctx = x if context is None else context
            b, s, _ = x.shape
            h, d = self.heads, self.dim_head
            q = self.to_q(x).view(b, s, h, d).transpose(1, 2)
            k = self.to_k(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
            v = self.to_v(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
            w = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
            o = (w @ v).transpose(1, 2).reshape(b, s, h * d)
            return self.to_out[0](o)

    class GEGLU(nn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = nn.Linear(dim, inner * 2)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * F.gelu(gate)  # exact erf gelu (torch default)

    class FeedForward(nn.Module):
        def __init__(self, dim, dout=None):
            super().__init__()
            inner = dim * 4
            self.net = nn.ModuleList(
                [GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dout or dim)]
            )

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class BasicTransformerBlock(nn.Module):
        def __init__(self, dim, heads, dim_head, cross_dim):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.attn1 = Attention(dim, heads, dim_head)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.attn2 = Attention(dim, heads, dim_head, cross_dim)
            self.norm3 = nn.LayerNorm(dim, eps=1e-5)
            self.ff = FeedForward(dim)

        def forward(self, x, enc):
            x = self.attn1(self.norm1(x)) + x
            x = self.attn2(self.norm2(x), context=enc) + x
            return self.ff(self.norm3(x)) + x

    class TemporalBasicTransformerBlock(nn.Module):
        def __init__(self, dim, heads, dim_head, cross_dim):
            super().__init__()
            self.norm_in = nn.LayerNorm(dim, eps=1e-5)
            self.ff_in = FeedForward(dim, dim)
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.attn1 = Attention(dim, heads, dim_head)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.attn2 = Attention(dim, heads, dim_head, cross_dim)
            self.norm3 = nn.LayerNorm(dim, eps=1e-5)
            self.ff = FeedForward(dim)

        def forward(self, x, time_context):
            x = self.ff_in(self.norm_in(x)) + x
            x = self.attn1(self.norm1(x)) + x
            x = self.attn2(self.norm2(x), context=time_context) + x
            return self.ff(self.norm3(x)) + x

    def timestep_embedding(ids, dim):
        """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0.0)."""
        half = dim // 2
        exponent = -math.log(10000.0) * np.arange(half, dtype=np.float64) / half
        ang = np.asarray(ids, np.float64)[:, None] * np.exp(exponent)[None, :]
        emb = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
        return torch.from_numpy(emb.astype(np.float32))

    class TimestepEmbedding(nn.Module):
        def __init__(self, cin, embed, out):
            super().__init__()
            self.linear_1 = nn.Linear(cin, embed)
            self.linear_2 = nn.Linear(embed, out)

        def forward(self, x):
            return self.linear_2(F.silu(self.linear_1(x)))

    class TransformerSpatioTemporalModel(nn.Module):
        def __init__(self, channels, heads, cross_dim=1024):
            super().__init__()
            dim_head = channels // heads
            self.channels = channels
            self.norm = nn.GroupNorm(32, channels, eps=1e-6)
            self.proj_in = nn.Linear(channels, channels)
            self.transformer_blocks = nn.ModuleList(
                [BasicTransformerBlock(channels, heads, dim_head, cross_dim)]
            )
            self.temporal_transformer_blocks = nn.ModuleList(
                [TemporalBasicTransformerBlock(channels, heads, dim_head, cross_dim)]
            )
            self.time_pos_embed = TimestepEmbedding(channels, channels * 4, channels)
            self.time_mixer = AlphaBlender(0.5, "learned_with_images")
            self.proj_out = nn.Linear(channels, channels)

        def forward(self, x, enc, indicator):
            bf, c, hh, ww = x.shape
            f = indicator.shape[-1]
            b = bf // f
            s = hh * ww
            # first frame's token, batched to (B*S, T, D)
            t_ctx = enc.reshape(b, f, enc.shape[1], -1)[:, :1]
            time_context = t_ctx.expand(b, s, enc.shape[1], enc.shape[-1]).reshape(
                b * s, enc.shape[1], -1
            )
            residual = x
            h = self.norm(x).permute(0, 2, 3, 1).reshape(bf, s, c)
            h = self.proj_in(h)
            ids = np.tile(np.arange(f), b)
            emb = self.time_pos_embed(timestep_embedding(ids, c))[:, None, :]
            h = self.transformer_blocks[0](h, enc)
            h_mix = h + emb
            h_mix = (
                h_mix.reshape(b, f, s, c).permute(0, 2, 1, 3).reshape(b * s, f, c)
            )
            h_mix = self.temporal_transformer_blocks[0](h_mix, time_context)
            h_mix = (
                h_mix.reshape(b, s, f, c).permute(0, 2, 1, 3).reshape(bf, s, c)
            )
            h = self.time_mixer(h, h_mix, indicator, ndims_after=2)
            h = self.proj_out(h).reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
            return h + residual

    class Downsample2D(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

        def forward(self, x):
            return self.conv(x)

    class Upsample2D(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, 3, padding=1)

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))

    class CrossAttnDownBlockST(nn.Module):
        """down_blocks.1 of SVD-XT: 320->640, 10 heads, 2 layers."""

        def __init__(self, cin=320, cout=640, heads=10):
            super().__init__()
            self.resnets = nn.ModuleList(
                [
                    SpatioTemporalResBlock(cin, cout, eps=1e-5),
                    SpatioTemporalResBlock(cout, cout, eps=1e-5),
                ]
            )
            self.attentions = nn.ModuleList(
                [TransformerSpatioTemporalModel(cout, heads) for _ in range(2)]
            )
            self.downsamplers = nn.ModuleList([Downsample2D(cout)])

        def forward(self, x, temb, enc, indicator):
            outs = []
            for res, attn in zip(self.resnets, self.attentions):
                x = res(x, temb, indicator)
                x = attn(x, enc, indicator)
                outs.append(x)
            x = self.downsamplers[0](x)
            outs.append(x)
            return x, outs

    class UpBlockTemporalDecoder(nn.Module):
        """decoder.up_blocks.2 of the SVD VAE: 512->256, learned merge."""

        def __init__(self, cin=512, cout=256, layers=3):
            super().__init__()
            self.resnets = nn.ModuleList(
                [
                    SpatioTemporalResBlock(
                        cin if i == 0 else cout, cout, temb=0, eps=1e-6,
                        merge_factor=0.0, merge_strategy="learned",
                    )
                    for i in range(layers)
                ]
            )
            self.upsamplers = nn.ModuleList([Upsample2D(cout, cout)])

        def forward(self, x, indicator):
            for res in self.resnets:
                x = res(x, None, indicator)
            return self.upsamplers[0](x)

    return CrossAttnDownBlockST, UpBlockTemporalDecoder


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


def main():
    import torch

    torch.set_grad_enabled(False)
    CrossAttnDownBlockST, UpBlockTemporalDecoder = _build_torch_modules()

    # --- UNet down_blocks.1 golden -------------------------------------
    manifest = unet_downblock1_manifest()
    sd = synthetic_sd(manifest, seed=7)
    mod = CrossAttnDownBlockST()
    # strict load == torch-side manifest check (missing/unexpected raise)
    mod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    x, temb, enc = unet_golden_inputs()
    indicator = torch.zeros(1, 3)
    out, skips = mod(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(temb),
        torch.from_numpy(enc),
        indicator,
    )
    np.savez_compressed(
        OUT / "golden_unet_downblock.npz",
        expected=out.permute(0, 2, 3, 1).numpy(),
        expected_skip0=skips[0].permute(0, 2, 3, 1).numpy(),
    )
    print(
        f"unet downblock golden: out {tuple(out.shape)} "
        f"|out| {out.abs().mean():.4f} ({len(sd)} torch keys)"
    )

    # --- VAE decoder up_blocks.2 golden --------------------------------
    manifest = vae_upblock2_manifest()
    sd = synthetic_sd(manifest, seed=11)
    mod = UpBlockTemporalDecoder()
    mod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    (xv,) = vae_golden_inputs()
    out = mod(torch.from_numpy(xv).permute(0, 3, 1, 2), torch.zeros(1, 3))
    np.savez_compressed(
        OUT / "golden_vae_upblock.npz",
        expected=out.permute(0, 2, 3, 1).numpy(),
    )
    print(
        f"vae upblock golden: out {tuple(out.shape)} "
        f"|out| {out.abs().mean():.4f} ({len(sd)} torch keys)"
    )


if __name__ == "__main__":
    main()
