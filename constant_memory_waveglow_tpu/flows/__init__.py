from .invconv import (
    invconv_init,
    invconv_forward,
    invconv_reverse,
    invconv_forward_efficient,
    invconv_reverse_efficient,
    InvertibleConv1x1,
)
from .coupling import make_affine_coupling, AffineCouplingBlock

__all__ = [
    "invconv_init",
    "invconv_forward",
    "invconv_reverse",
    "invconv_forward_efficient",
    "invconv_reverse_efficient",
    "InvertibleConv1x1",
    "make_affine_coupling",
    "AffineCouplingBlock",
]
