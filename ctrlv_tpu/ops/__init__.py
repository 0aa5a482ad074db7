from .attention import dot_product_attention, set_attention_impl, get_attention_impl

__all__ = ["dot_product_attention", "set_attention_impl", "get_attention_impl"]
