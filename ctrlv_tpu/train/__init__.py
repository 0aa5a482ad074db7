from .loss import edm_denoising_loss, conditioning_dropout, sample_training_sigmas
from .ema import ema_init, ema_update, EMAState
from .lora import lora_init, apply_lora, merge_lora
from .state import (TrainState, make_optimizer, trainable_mask,
                    split_trainable, merge_trainable, temporal_blocks_predicate)
from .train_step import (
    make_svd_train_step,
    make_svd_grad_step,
    make_update_step,
    make_controlnet_train_step,
    make_vae_decoder_train_step,
)
from .checkpoints import CheckpointManager
from .hf_import import (
    torch_state_dict_to_flax,
    flax_params_to_torch_state_dict,
    load_hf_component,
)

__all__ = [
    "edm_denoising_loss",
    "conditioning_dropout",
    "sample_training_sigmas",
    "ema_init",
    "ema_update",
    "EMAState",
    "lora_init",
    "apply_lora",
    "merge_lora",
    "TrainState",
    "make_optimizer",
    "trainable_mask",
    "split_trainable",
    "merge_trainable",
    "temporal_blocks_predicate",
    "make_svd_train_step",
    "make_svd_grad_step",
    "make_update_step",
    "make_controlnet_train_step",
    "make_vae_decoder_train_step",
    "CheckpointManager",
    "torch_state_dict_to_flax",
    "flax_params_to_torch_state_dict",
    "load_hf_component",
]
