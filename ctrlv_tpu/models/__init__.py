from .unet_st import (
    UNetSpatioTemporalConditionModel,
    UNetSpatioTemporalConditionModelWithBBoxCond,
    UNetSTConfig,
)
from .bbox_attention import BBOXFrameAttention
from .kitti_object_net import KittiObjectNet
from .layout_net import LayoutNet, LayoutNetConfig
from .unet_2d import UNet2DConditionModel, UNet2DConfig
from .controlnet import ControlNetSpatioTemporal, controlnet_params_from_unet
from .vae import AutoencoderKLTemporalDecoder, VAEConfig
from .clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    clip_preprocess,
)

__all__ = [
    "UNetSpatioTemporalConditionModel",
    "UNetSpatioTemporalConditionModelWithBBoxCond",
    "BBOXFrameAttention",
    "KittiObjectNet",
    "LayoutNet",
    "LayoutNetConfig",
    "UNet2DConditionModel",
    "UNet2DConfig",
    "UNetSTConfig",
    "ControlNetSpatioTemporal",
    "controlnet_params_from_unet",
    "AutoencoderKLTemporalDecoder",
    "VAEConfig",
    "CLIPVisionConfig",
    "CLIPVisionModelWithProjection",
    "clip_preprocess",
]
