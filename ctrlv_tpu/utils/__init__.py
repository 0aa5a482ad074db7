from .fourier import (
    FourierEmbedder,
    get_fourier_embeds_from_boundingbox,
    rescale_bbox,
    to_binary,
)
from .config import Config, parse_args

__all__ = [
    "FourierEmbedder",
    "get_fourier_embeds_from_boundingbox",
    "rescale_bbox",
    "to_binary",
    "Config",
    "parse_args",
]
