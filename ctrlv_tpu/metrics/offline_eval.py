"""Offline video-metric harness over an export directory.

Parity: /root/reference/src/ctrlv/metrics/fvd.py:187-340 — walk a media
directory pairing generated_videos_*/gt_videos_* files, resize, optional
2x temporal downsample, compute FVD plus per-frame SSIM/PSNR (LPIPS when
the optional `lpips` package is importable). Defaults mirror the
reference script: SAMPLES=150, NUM_FRAMES=11, DOWNSAMPLE=True, 410x256.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.video_io import load_video
from .fvd import FVD
from .image import psnr, ssim


def pair_video_files(media_dir: str) -> List[Tuple[str, str]]:
    """Match generated_videos_<i> with gt_videos_<i> by shared index."""
    files = os.listdir(media_dir)

    def index_of(name):
        m = re.search(r"_(\d+)\.\w+$", name)
        return m.group(1) if m else None

    gen = {index_of(f): f for f in files if f.startswith("generated_video")}
    gt = {index_of(f): f for f in files if f.startswith("gt_video")}
    pairs = []
    for idx in sorted(set(gen) & set(gt), key=lambda s: int(s)):
        pairs.append((os.path.join(media_dir, gen[idx]), os.path.join(media_dir, gt[idx])))
    return pairs


def _prepare(video: np.ndarray, size: Tuple[int, int], num_frames: int, downsample: bool):
    import jax

    v = video.astype(np.float32) / 255.0
    if downsample:
        v = v[::2]
    v = v[:num_frames]
    f, h, w, c = v.shape
    v = np.asarray(
        jax.image.resize(jnp.asarray(v), (f, size[1], size[0], c), "bilinear")
    )
    return v


def evaluate_media_dir(
    media_dir: str,
    samples: int = 150,
    num_frames: int = 11,
    downsample: bool = True,
    size: Tuple[int, int] = (410, 256),
    fvd_params: Optional[dict] = None,
    lpips_params: Optional[dict] = None,
) -> Dict[str, float]:
    """lpips_params: flax LPIPS params (ctrlv_tpu.metrics.lpips — convert
    real `lpips` alex weights via load_lpips_torch_weights, or point the
    CTRLV_LPIPS_WEIGHTS env var at a saved torch state dict). LPIPS is
    skipped only when no weights are available anywhere."""
    pairs = pair_video_files(media_dir)[:samples]
    if not pairs:
        raise FileNotFoundError(f"no generated/gt video pairs in {media_dir}")
    fvd = FVD(params=fvd_params)
    ssims, psnrs, lpips_vals = [], [], []

    if lpips_params is None:
        weights_path = os.environ.get("CTRLV_LPIPS_WEIGHTS", "")
        if weights_path and os.path.exists(weights_path):
            from .lpips import load_lpips_torch_weights

            lpips_params = load_lpips_torch_weights(weights_path)
    if lpips_params is not None:
        from .lpips import lpips_distance

    for gen_path, gt_path in pairs:
        gen = _prepare(load_video(gen_path), size, num_frames, downsample)
        gt = _prepare(load_video(gt_path), size, num_frames, downsample)
        n = min(len(gen), len(gt))
        gen, gt = gen[:n], gt[:n]
        fvd.update(gt[None], gen[None])
        ssims.append(
            float(np.mean([float(ssim(jnp.asarray(gen[i]), jnp.asarray(gt[i])))
                           for i in range(n)]))
        )
        psnrs.append(float(psnr(jnp.asarray(gen), jnp.asarray(gt))))
        if lpips_params is not None:
            d = lpips_distance(
                lpips_params,
                jnp.asarray(gen) * 2.0 - 1.0,
                jnp.asarray(gt) * 2.0 - 1.0,
            )
            lpips_vals.append(float(jnp.mean(d)))

    out = dict(
        fvd=fvd.compute(),
        ssim=float(np.mean(ssims)),
        psnr=float(np.mean(psnrs)),
        num_pairs=len(pairs),
    )
    if lpips_vals:
        out["lpips"] = float(np.mean(lpips_vals))
    return out


if __name__ == "__main__":
    # CLI parity with the reference's offline harness
    # (/root/reference/src/ctrlv/metrics/fvd.py:291-340), whose __main__
    # hardcodes vid_dirs + SAMPLES/NUM_FRAMES/DOWNSAMPLE constants; here
    # the same knobs are proper flags.
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("media_dirs", nargs="+")
    ap.add_argument("--samples", type=int, default=150)
    ap.add_argument("--num_frames", type=int, default=11)
    ap.add_argument(
        "--downsample",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="2x temporal downsample before scoring (reference default)",
    )
    ap.add_argument("--width", type=int, default=410)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args()
    for d in args.media_dirs:
        print(f"Results for: {d} START -----------------")
        print(
            json.dumps(
                evaluate_media_dir(
                    d,
                    samples=args.samples,
                    num_frames=args.num_frames,
                    downsample=args.downsample,
                    size=(args.width, args.height),
                )
            )
        )
        print(f"Results for: {d} END   -----------------")
