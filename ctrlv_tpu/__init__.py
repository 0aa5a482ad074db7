"""ctrlv_tpu — TPU-native rebuild of Ctrl-V (controllable video generation).

A JAX/XLA/Pallas framework implementing the full capability surface of the
reference Ctrl-V system (two-stage bbox-predictor + Box2Video controllable
video diffusion, reference: oooolga/Ctrl-V), re-designed TPU-first:

- ``ctrlv_tpu.models``    — Flax modules: SVD spatio-temporal UNet, ControlNet,
  temporal VAE, CLIP ViT-H vision encoder, bbox-frame attention, legacy nets.
- ``ctrlv_tpu.diffusion`` — EDM/Euler scheduler math (continuous sigma tables,
  Karras schedule, v-prediction step) as pure jittable functions.
- ``ctrlv_tpu.ops``       — Pallas TPU kernels + XLA-native ops (fused attention,
  bbox rasterizer, antialiased resize).
- ``ctrlv_tpu.pipelines`` — lax.scan samplers: bbox-predict, box2video, overall.
- ``ctrlv_tpu.parallel``  — device mesh / sharding layer (dp x frame-sp).
- ``ctrlv_tpu.data``      — datasets (KITTI/vKITTI/mKITTI/BDD100K/DAVIS/nuScenes),
  padding + collate, device rasterization of conditioning frames.
- ``ctrlv_tpu.train``     — EDM loss, train states (full/temporal-only/LoRA/EMA/
  controlnet-only/vae-decoder), Orbax checkpoints, HF safetensors import/export.
- ``ctrlv_tpu.metrics``   — mask-IoU/AP/AR, J&F, SSIM/PSNR, FVD harness.
- ``ctrlv_tpu.baseline``  — autoregressive bbox-LM baseline (trajeglish-style).
"""

from .version import __version__

__all__ = ["__version__"]
