from .convs import (
    conv1d,
    conv1x1,
    conv2d_causal_h,
    conv_transpose1d,
    torch_conv_uniform_init,
    set_default_precision,
    get_default_precision,
)
from .weightnorm import wn_init, wn_weight, fuse_weight_norms
from .gate import gated_tanh
from .stft import stft_magnitude, MelSpec, mel_filterbank, hann_window
from .lowpass import LowPass, SincDecimate, STFTDecimate
from .mulaw import mu_law_encode

__all__ = [
    "conv1d",
    "conv1x1",
    "conv2d_causal_h",
    "conv_transpose1d",
    "torch_conv_uniform_init",
    "set_default_precision",
    "get_default_precision",
    "wn_init",
    "wn_weight",
    "fuse_weight_norms",
    "gated_tanh",
    "stft_magnitude",
    "MelSpec",
    "mel_filterbank",
    "hann_window",
    "LowPass",
    "STFTDecimate",
    "SincDecimate",
    "mu_law_encode",
]
