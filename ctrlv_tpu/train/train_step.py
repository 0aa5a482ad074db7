"""Jitted training steps for the three training workloads.

Behavioral parity:
  - SVD finetune / bbox predictor (train_video_diffusion.py:428-541 call
    stack, SURVEY.md §3.1): CLIP-encode first frame, VAE-encode clip (or
    bbox clip with `predict_bbox`), latent-substitution conditioning,
    EDM noising + loss, conditioning dropout,
  - ControlNet training (train_video_controlnet.py, §3.2): identical
    except the ControlNet produces residuals and is the only trainable
    module (the reference's 2-GPU manual split becomes a sharding no-op),
  - VAE decoder finetune (train_vae_finetuning.py:303-314): image MSE.

Each factory returns a pure (state, batch, rng) -> (state, metrics)
function meant to be wrapped in jax.jit with donated state; under a DP
mesh the batch is sharded and XLA inserts the gradient psum.
"""

from __future__ import annotations


from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion import scale_model_input, training_sigma_table
from ..models.clip_vision import clip_preprocess
from .loss import conditioning_dropout, edm_denoising_loss
from .state import TrainState


def _vae_encode_frames(vae, vae_params, flat, rng, chunk):
    """VAE-encode (N,H,W,3) frames, optionally in sequential chunks.

    At full size the encoder's full-resolution activations dominate the
    training step's HBM peak (25 frames x 320x512 x 128ch bf16 > 1 GB per
    conv output); `chunk` bounds that via a lax.map whose body is compiled
    ONCE — same per-frame encode semantics, chunk-sized peak. When chunk
    doesn't divide N it is reduced to the largest divisor of N <= chunk
    (lax.map needs equal chunks), preserving the memory bound rather than
    silently falling back to one full-batch call.
    """
    n_frames = flat.shape[0]
    if not chunk or n_frames <= chunk:
        return vae.apply(vae_params, flat, rng, True, method=vae.encode)
    while n_frames % chunk:  # largest divisor of N <= requested chunk
        chunk -= 1
    n = n_frames // chunk
    groups = flat.reshape((n, chunk) + flat.shape[1:])
    keys = jax.random.split(rng, n)

    def body(args):
        frames_c, key = args
        return vae.apply(vae_params, frames_c, key, True, method=vae.encode)

    lat = jax.lax.map(body, (groups, keys))
    return lat.reshape((n_frames,) + lat.shape[2:])


def _encode_batch(
    vae, vae_params, clip_model, clip_params, frames, rng, scaling, encode_chunk=None
):
    """frames (B,F,H,W,3) -> (latents*scale, initial-frame latent, clip emb)."""
    b, f = frames.shape[:2]
    rng_lat, rng_init = jax.random.split(rng)
    flat = frames.reshape((b * f,) + frames.shape[2:])
    latents = _vae_encode_frames(vae, vae_params, flat, rng_lat, encode_chunk)
    latents = latents.reshape((b, f) + latents.shape[1:])
    initial = frames[:, 0]
    init_latent = vae.apply(vae_params, initial, rng_init, True, method=vae.encode)
    clip_emb = clip_model.apply(
        clip_params, clip_preprocess(initial, image_size=clip_model.config.image_size)
    )[:, None, :]
    return latents * scaling, init_latent, clip_emb


def _build_conditioning(
    latents_unscaled, init_latent, predict_bbox: bool, num_cond_bbox_frames: int
):
    """Latent-substitution conditioning (train_video_diffusion.py:445-458)."""
    b, f = latents_unscaled.shape[:2]
    if not predict_bbox:
        return jnp.repeat(init_latent[:, None], f, axis=1)
    cond = latents_unscaled
    mid = jnp.repeat(init_latent[:, None], f, axis=1)
    k = num_cond_bbox_frames
    frame_idx = jnp.arange(f)[None, :, None, None, None]
    is_mid = (frame_idx >= k) & (frame_idx < f - 1)
    return jnp.where(is_mid, mid, cond)


def _make_svd_loss_grad(
    unet,
    vae,
    clip_model,
    *,
    predict_bbox: bool = False,
    num_cond_bbox_frames: int = 3,
    conditioning_dropout_prob: Optional[float] = 0.1,
    fps: int = 7,
    motion_bucket_id: int = 127,
    noise_aug_strength: float = 0.02,
    scaling_factor: float = 0.18215,
    lora: bool = False,
    partitioned: bool = False,
    encode_chunk: Optional[int] = None,
) -> Callable:
    """Shared fwd+bwd core: (trainable, vae_params, clip_params, clips,
    bbox_clips, rng[, base_params]) -> (loss, grads). Used by both the
    monolithic train step and the split grad/update pair."""
    sigma_table = jnp.asarray(training_sigma_table())

    def loss_grad(trainable_params, vae_params, clip_params, clips, bbox_clips, rng, base_params=None):
        rng_enc, rng_enc_rgb, rng_sigma, rng_noise, rng_drop = jax.random.split(rng, 5)
        frames = bbox_clips if predict_bbox else clips
        b, f = frames.shape[:2]

        latents_scaled, init_latent, clip_emb = _encode_batch(
            vae, vae_params, clip_model, clip_params, frames, rng_enc,
            scaling_factor, encode_chunk,
        )
        if predict_bbox:
            # conditioning comes from bbox latents, but the *initial RGB frame*
            # fills the middle frames; CLIP embedding from the RGB first frame.
            rgb_init = clips[:, 0]
            # fresh key: rng_enc was consumed inside _encode_batch, and
            # re-splitting it would duplicate the bbox-latent sampling key
            init_latent = vae.apply(
                vae_params, rgb_init, rng_enc_rgb, True, method=vae.encode
            )
            clip_emb = clip_model.apply(
                clip_params,
                clip_preprocess(rgb_init, image_size=clip_model.config.image_size),
            )[:, None, :]
        cond_latents = _build_conditioning(
            latents_scaled / scaling_factor, init_latent, predict_bbox, num_cond_bbox_frames
        )
        target_latents = latents_scaled

        idx = jax.random.randint(rng_sigma, (b,), 0, sigma_table.shape[0])
        sigma = sigma_table[idx]
        timesteps = 0.25 * jnp.log(sigma)
        noise = jax.random.normal(rng_noise, target_latents.shape, jnp.float32)
        sigma5 = sigma[:, None, None, None, None]
        noisy = target_latents + noise * sigma5
        inp = noisy / jnp.sqrt(sigma5**2 + 1.0)

        if conditioning_dropout_prob:
            clip_emb, cond_latents = conditioning_dropout(
                rng_drop, clip_emb, cond_latents, conditioning_dropout_prob
            )

        add_time_ids = jnp.tile(
            jnp.asarray(
                [[fps - 1, motion_bucket_id, noise_aug_strength]], jnp.float32
            ),
            (b, 1),
        )

        def loss_fn(trainable):
            if lora:
                from .lora import apply_lora

                unet_params = {"params": apply_lora(base_params["params"], trainable)}
            elif partitioned:
                from .state import merge_trainable

                unet_params = merge_trainable(base_params, trainable)
            else:
                unet_params = trainable
            model_in = jnp.concatenate([inp, cond_latents], axis=-1)
            pred = unet.apply(unet_params, model_in, timesteps, clip_emb, add_time_ids)
            return edm_denoising_loss(pred, noisy, target_latents, sigma)

        return jax.value_and_grad(loss_fn)(trainable_params)

    return loss_grad


def make_svd_train_step(
    unet,
    vae,
    clip_model,
    tx: optax.GradientTransformation,
    **kwargs,
) -> Callable:
    """Returns step(state, vae_params, clip_params, clip_frames, bbox_frames, rng).

    state.params is the UNet param tree (or the LoRA tree when lora=True,
    with the frozen base params passed via closure-free extra arg).

    partitioned=True: state.params is a trainable SUBTREE (see
    state.split_trainable) and base_params the full tree — grads and
    optimizer state then exist only for the subset, which is what lets
    temporal-only finetuning fit one 16 GB v5e at full size (a masked
    optimizer still materializes params-sized grads). Updates are
    numerically identical to the masked form (clip_by_global_norm sees
    only live grads either way — multi_transform clips inside the
    'train' branch).
    """
    loss_grad = _make_svd_loss_grad(unet, vae, clip_model, **kwargs)

    def step(state: TrainState, vae_params, clip_params, clips, bbox_clips, rng, base_params=None):
        loss, grads = loss_grad(
            state.params, vae_params, clip_params, clips, bbox_clips, rng, base_params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def make_svd_grad_step(
    unet,
    vae,
    clip_model,
    **kwargs,
) -> Callable:
    """Gradient-only half of the SVD step: (params, vae_params, clip_params,
    clips, bbox_clips, rng[, base_params]) -> (loss, grads).

    Pair with `make_update_step` to split one training micro-step into TWO
    compiled programs (fwd+bwd / optimizer update). Numerically identical
    to `make_svd_train_step` — the split exists for compile-size-limited
    environments (a monolithic full-finetune fwd+bwd+AdamW program is ~2x
    the MLIR of either half; see PERF.md round-4) and costs one extra
    dispatch plus a grads-tree round-trip through HBM per micro-step.
    """
    return _make_svd_loss_grad(unet, vae, clip_model, **kwargs)


def make_update_step(tx: optax.GradientTransformation) -> Callable:
    """Optimizer half of the split step: (state, grads) -> (state, metrics)."""

    def update(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"grad_norm": optax.global_norm(grads)}

    return update


def make_controlnet_train_step(
    unet,
    controlnet,
    vae,
    clip_model,
    tx: optax.GradientTransformation,
    *,
    generate_bbox: bool = False,
    conditioning_dropout_prob: Optional[float] = 0.1,
    fps: int = 7,
    motion_bucket_id: int = 127,
    noise_aug_strength: float = 0.02,
    scaling_factor: float = 0.18215,
    encode_chunk: Optional[int] = None,
) -> Callable:
    """ControlNet-only training. state.params = ControlNet params.

    `generate_bbox` swaps cond/target to train the video->bbox inverse
    (train_video_controlnet.py:369,386-394).
    """
    sigma_table = jnp.asarray(training_sigma_table())

    def step(state: TrainState, unet_params, vae_params, clip_params, clips, bbox_clips, rng):
        rng_enc, rng_sigma, rng_noise, rng_drop, rng_cond = jax.random.split(rng, 5)
        target_frames, cond_frames = (
            (bbox_clips, clips) if generate_bbox else (clips, bbox_clips)
        )
        b, f = target_frames.shape[:2]

        latents_scaled, init_latent, clip_emb = _encode_batch(
            vae, vae_params, clip_model, clip_params, target_frames, rng_enc,
            scaling_factor, encode_chunk,
        )
        # control conditioning: VAE-encode the conditioning clip, sampling
        # the latent distribution like the reference's training path
        # (train_video_controlnet.py:387 latent_dist.sample())
        flat_cond = cond_frames.reshape((b * f,) + cond_frames.shape[2:])
        control_cond = _vae_encode_frames(vae, vae_params, flat_cond, rng_cond, encode_chunk)
        control_cond = control_cond.reshape((b, f) + control_cond.shape[1:])
        image_latents = jnp.repeat(init_latent[:, None], f, axis=1)
        target_latents = latents_scaled

        idx = jax.random.randint(rng_sigma, (b,), 0, sigma_table.shape[0])
        sigma = sigma_table[idx]
        timesteps = 0.25 * jnp.log(sigma)
        noise = jax.random.normal(rng_noise, target_latents.shape, jnp.float32)
        sigma5 = sigma[:, None, None, None, None]
        noisy = target_latents + noise * sigma5
        inp = noisy / jnp.sqrt(sigma5**2 + 1.0)

        if conditioning_dropout_prob:
            clip_emb, image_latents = conditioning_dropout(
                rng_drop, clip_emb, image_latents, conditioning_dropout_prob
            )

        add_time_ids = jnp.tile(
            jnp.asarray(
                [[fps - 1, motion_bucket_id, noise_aug_strength]], jnp.float32
            ),
            (b, 1),
        )

        def loss_fn(ctrl_params):
            model_in = jnp.concatenate([inp, image_latents], axis=-1)
            down_res, mid_res = controlnet.apply(
                ctrl_params, model_in, timesteps, clip_emb, add_time_ids, control_cond
            )
            pred = unet.apply(
                unet_params,
                model_in,
                timesteps,
                clip_emb,
                add_time_ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residuals=mid_res,
            )
            return edm_denoising_loss(pred, noisy, target_latents, sigma)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def make_vae_decoder_train_step(vae, tx: optax.GradientTransformation) -> Callable:
    """VAE-decoder-only finetune with image MSE (train_vae_finetuning.py:303-314).

    state.params = full VAE params; the optimizer is masked to decoder/*.
    """

    def step(state: TrainState, frames, rng):
        b, f = frames.shape[:2]
        flat = frames.reshape((b * f,) + frames.shape[2:])

        def loss_fn(params):
            z = vae.apply(params, flat, rng, True, method=vae.encode)
            z = jax.lax.stop_gradient(z)  # encoder frozen
            recon = vae.apply(params, z, f, method=vae.decode)
            return jnp.mean((recon.astype(jnp.float32) - flat.astype(jnp.float32)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return step
