from .unet_st import UNetSpatioTemporalConditionModel, UNetSTConfig
from .controlnet import ControlNetSpatioTemporal, controlnet_params_from_unet
from .vae import AutoencoderKLTemporalDecoder, VAEConfig
from .clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    clip_preprocess,
)

__all__ = [
    "UNetSpatioTemporalConditionModel",
    "UNetSTConfig",
    "ControlNetSpatioTemporal",
    "controlnet_params_from_unet",
    "AutoencoderKLTemporalDecoder",
    "VAEConfig",
    "CLIPVisionConfig",
    "CLIPVisionModelWithProjection",
    "clip_preprocess",
]
