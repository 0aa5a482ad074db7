"""Native LPIPS (AlexNet backbone) — no dependency on the `lpips` package.

Behavioral spec: the reference computes LPIPS(net='alex') over generated/GT
video frames in its offline eval (/root/reference/src/ctrlv/metrics/
fvd.py:240-248). The `lpips` package's forward is:

    x' = (x - shift) / scale                      # ScalingLayer buffers
    f_k = relu features of torchvision AlexNet at relu1..relu5
    n_k = f_k / (||f_k||_2(channel) + 1e-10)      # normalize_tensor
    d_k = (n_k(x0) - n_k(x1))^2
    out = sum_k spatial_mean( lin_k(d_k) )        # 1x1 conv, no bias

This module re-implements that math in Flax (NHWC, TPU-native) plus a
STRICT torch-state-dict converter following the I3D recipe
(ctrlv_tpu/metrics/fvd.py): every expected key and shape is enumerated;
any drift raises immediately. Real `lpips` AlexNet+linear weights are not
bundled in this environment — load them with `load_lpips_torch_weights`
when available; random weights give a valid smoke metric only.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet feature channels at relu1..relu5
_ALEX_CHANNELS = (64, 192, 384, 256, 256)
# (out_ch, kernel, stride, pad) per conv; maxpool(3,2) before convs 2 and 3
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# lpips ScalingLayer buffers (constants in the package, converted as params)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features` trunk returning relu1..relu5 maps."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            if i in (1, 2):  # maxpool before conv2 and conv3
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class LPIPS(nn.Module):
    """LPIPS distance between two [-1,1] NHWC image batches -> (B,)."""

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        shift = self.param(
            "shift", lambda _: jnp.asarray(_SHIFT, jnp.float32)
        )
        scale = self.param(
            "scale", lambda _: jnp.asarray(_SCALE, jnp.float32)
        )
        net = AlexNetFeatures(name="net")
        f0 = net((x0 - shift) / scale)
        f1 = net((x1 - shift) / scale)
        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            w = self.param(
                f"lin{k}",
                nn.initializers.ones,
                (_ALEX_CHANNELS[k],),
                jnp.float32,
            )
            na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(na - nb)  # (B, H, W, C)
            # lin_k: 1x1 conv (C -> 1, no bias) then spatial mean
            total = total + jnp.mean(d @ w, axis=(1, 2))
        return total


def lpips_init_params(rng) -> dict:
    """Random-weight params (smoke metric only — flagged, like random FVD)."""
    model = LPIPS()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(rng, x, x)


def lpips_torch_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    """STRICT converter: `lpips.LPIPS(net='alex')` state dict -> flax params.

    Expected keys (exactly — missing, extra, or mis-shaped keys raise):
      scaling_layer.shift / .scale               (1,3,1,1)
      net.sliceS.I.weight/.bias for the 5 convs  (O,I,kh,kw) / (O,)
      linK.model.1.weight                        (1,C,1,1)
    Conv kernels transpose OIHW -> HWIO (the repo-wide torch->flax rule,
    ctrlv_tpu/train/hf_import.py conventions).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # lpips slices keep torchvision feature indices: conv at 0,3,6,8,10
    slice_ids = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    expected: Dict[str, tuple] = {
        "scaling_layer.shift": (1, 3, 1, 1),
        "scaling_layer.scale": (1, 3, 1, 1),
    }
    in_ch = 3
    for (s, i), (out_ch, k, _, _) in zip(slice_ids, _ALEX_CONVS):
        expected[f"net.slice{s}.{i}.weight"] = (out_ch, in_ch, k, k)
        expected[f"net.slice{s}.{i}.bias"] = (out_ch,)
        in_ch = out_ch
    for k, c in enumerate(_ALEX_CHANNELS):
        expected[f"lin{k}.model.1.weight"] = (1, c, 1, 1)

    missing = sorted(set(expected) - set(sd))
    extra = sorted(set(sd) - set(expected))
    if missing or extra:
        raise ValueError(
            f"lpips state-dict drift: missing={missing} extra={extra}"
        )
    bad = [
        f"{k}: got {sd[k].shape}, want {shape}"
        for k, shape in expected.items()
        if tuple(sd[k].shape) != shape
    ]
    if bad:
        raise ValueError("lpips shape drift: " + "; ".join(bad))

    params: Dict[str, object] = {
        "shift": jnp.asarray(sd["scaling_layer.shift"].reshape(3), jnp.float32),
        "scale": jnp.asarray(sd["scaling_layer.scale"].reshape(3), jnp.float32),
        "net": {},
    }
    for j, (s, i) in enumerate(slice_ids):
        params["net"][f"conv{j + 1}"] = {
            "kernel": jnp.asarray(
                sd[f"net.slice{s}.{i}.weight"].transpose(2, 3, 1, 0), jnp.float32
            ),
            "bias": jnp.asarray(sd[f"net.slice{s}.{i}.bias"], jnp.float32),
        }
    for k, c in enumerate(_ALEX_CHANNELS):
        params[f"lin{k}"] = jnp.asarray(
            sd[f"lin{k}.model.1.weight"].reshape(c), jnp.float32
        )
    return {"params": params}


def load_lpips_torch_weights(path: str) -> dict:
    """Load a torch checkpoint of `lpips.LPIPS(net='alex')` and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return lpips_torch_to_flax({k: v.numpy() for k, v in sd.items()})


_MODEL = LPIPS()


def lpips_distance(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS over (B,H,W,3) NHWC batches in [-1,1] -> (B,) distances."""
    return _MODEL.apply(params, img0, img1)
