from .conv_flat import conv3x3_flat, pack_conv_weights, supports_flat

__all__ = ["conv3x3_flat", "pack_conv_weights", "supports_flat"]
