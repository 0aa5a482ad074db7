from .video_diffusion import VideoDiffusionPipeline
from .video_control import StableVideoControlPipeline
from .overall import OverallPipeline

__all__ = [
    "VideoDiffusionPipeline",
    "StableVideoControlPipeline",
    "OverallPipeline",
]
