from .fused_attention import dual_attention_reference, fused_dual_attention

__all__ = ["fused_dual_attention", "dual_attention_reference"]
