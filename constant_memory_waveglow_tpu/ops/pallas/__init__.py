from .wn_layer import fused_wn_layer, wn_layer_xla, set_fused_wn_enabled, fused_wn_enabled

__all__ = ["fused_wn_layer", "wn_layer_xla", "set_fused_wn_enabled", "fused_wn_enabled"]
