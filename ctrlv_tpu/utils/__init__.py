from .fourier import (
    FourierEmbedder,
    get_fourier_embeds_from_boundingbox,
    rescale_bbox,
    to_binary,
)
from .config import Config, parse_args
from .samples import (
    get_first_training_sample,
    get_n_training_samples,
    eval_samples_generator,
    eval_demo_samples_generator,
)
from .misc import rand_log_normal, tokenize_captions

__all__ = [
    "FourierEmbedder",
    "get_fourier_embeds_from_boundingbox",
    "rescale_bbox",
    "to_binary",
    "Config",
    "parse_args",
    "get_first_training_sample",
    "get_n_training_samples",
    "eval_samples_generator",
    "eval_demo_samples_generator",
    "rand_log_normal",
    "tokenize_captions",
]
