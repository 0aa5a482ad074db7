from .attention import dot_product_attention, get_attention_impl, set_attention_impl
from .geglu_ff import geglu_ff, geglu_ff_supported, set_fused_geglu_ff
from .layer_norm import layer_norm, set_fused_layer_norm
from .resblock import fused_resblock2d, resblock_supported, set_fused_resblock
from .group_norm import group_norm, set_fused_group_norm
from .mha import (
    mha_attention,
    mha_supported,
    small_mha_attention,
    small_mha_attention_fm,
    small_mha_fm_supported,
    small_mha_supported,
)

__all__ = [
    "dot_product_attention",
    "set_attention_impl",
    "get_attention_impl",
    "geglu_ff",
    "geglu_ff_supported",
    "set_fused_geglu_ff",
    "layer_norm",
    "set_fused_layer_norm",
    "fused_resblock2d",
    "resblock_supported",
    "set_fused_resblock",
    "group_norm",
    "set_fused_group_norm",
    "mha_attention",
    "mha_supported",
    "small_mha_attention",
    "small_mha_attention_fm",
    "small_mha_fm_supported",
    "small_mha_supported",
]
