from .fused_attention import fused_attention

__all__ = ["fused_attention"]
