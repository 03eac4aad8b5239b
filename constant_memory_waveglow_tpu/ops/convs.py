"""Convolution primitives, laid out for the TPU MXU.

All activations use ``[B, C, T]`` (1-D) / ``[B, C, H, W]`` (2-D) layout.  XLA
lowers these convolutions onto the MXU; 1x1 convolutions are written as
``dot_general`` contractions so they map to batched GEMMs directly.

Weight layouts follow the PyTorch convention ``[C_out, C_in, K]`` so that
reference hyperparameters / initializers translate 1:1 (reference uses
``nn.Conv1d`` etc. throughout, e.g. ``model/waveglow.py:28-38``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

# Matmul/conv precision for fp32 inputs on TPU.
#   HIGHEST -> full fp32 accumulation (needed for invertibility round-trips)
#   DEFAULT -> bf16 passes (fastest, used where precision is not critical)
_DEFAULT_PRECISION = lax.Precision.HIGHEST


def set_default_precision(p):
    """Set the global conv/matmul precision ('default'|'high'|'highest')."""
    global _DEFAULT_PRECISION
    if isinstance(p, str):
        p = {
            "default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST,
        }[p.lower()]
    _DEFAULT_PRECISION = p


def get_default_precision():
    return _DEFAULT_PRECISION


def _prec(precision):
    return _DEFAULT_PRECISION if precision is None else precision


def torch_conv_uniform_init(key, shape, fan_in=None, dtype=jnp.float32):
    """PyTorch Conv default init: kaiming_uniform(a=sqrt(5)).

    For weight ``[C_out, C_in, *K]`` this is U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    with ``fan_in = C_in * prod(K)`` — the initialization every reference conv
    uses implicitly via ``nn.Conv1d``/``nn.Conv2d`` defaults.
    """
    if fan_in is None:
        fan_in = int(np.prod(shape[1:]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv1d(x, w, *, dilation=1, padding="same", groups=1, precision=None):
    """1-D convolution.  x: [B, Cin, T], w: [Cout, Cin//groups, K] -> [B, Cout, T'].

    ``padding='same'`` pads ``dilation*(K-1)//2`` on both sides (output length
    == input length for odd K), matching the reference's non-causal layers
    (``model/waveglow.py:27-30``).  Pass an explicit ``[(lo, hi)]`` otherwise.
    """
    k = w.shape[-1]
    if padding == "same":
        pad = dilation * (k - 1) // 2
        padding = [(pad, pad)]
    elif padding == "valid":
        padding = [(0, 0)]
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=_prec(precision),
    )


# Two lowerings of the pointwise conv, selected per trace (both MXU GEMMs,
# numerically identical at a given precision, very different layouts):
#
# * 'dot': dot_general over channels.  Fastest for the grad-free
#   reverse/synthesis pass (measured 3.4 MHz vs 1.1 MHz batched flagship
#   synthesis on a v5e).
# * 'conv': K=1 conv_general_dilated.  Fastest inside the TRAINING step:
#   the conv emitters' layouts agree with the surrounding dilated convs'
#   (the dot form forces {1,2,0}<->{1,0,2} relayout copies around every WN
#   layer), and its weight-gradient — a contraction over batch AND time —
#   lowers to a proper conv transpose instead of a degenerate one.
#   Measured on the flagship AMP train step (v5e): 79.9 -> 94.5 audio-s/s
#   at batch 8, 75.8 -> 87.1 at batch 24.
#
# The training step wraps its trace in ``conv1x1_impl('conv')``
# (training/experiment.py); everything else defaults to 'dot'.
_CONV1X1_IMPL = "dot"


class conv1x1_impl:
    """Context manager selecting the conv1x1 lowering for traces under it."""

    def __init__(self, impl):
        assert impl in ("dot", "conv"), impl
        self.impl = impl

    def __enter__(self):
        global _CONV1X1_IMPL
        self._prev = _CONV1X1_IMPL
        _CONV1X1_IMPL = self.impl

    def __exit__(self, *exc):
        global _CONV1X1_IMPL
        _CONV1X1_IMPL = self._prev


# Above this weight size (Cout*Cin elements) the pointwise conv uses the
# dot form even inside training traces.  The 'conv' preference was measured
# on flagship-scale projections (V: 80->4096, W_o: 256->512); at WSRGlow's
# conditioner scale (V: 3659->4096, ~15M weights x 12 flows = 719 MB of
# params) the conv emitter stores the kernel in a {1,3,2,0:T(1,128)} layout
# that every OTHER consumer (Adam update at 66 GB/s, per-flow dcond GEMMs,
# bf16 casts) must relayout-copy around — traced at 64 ms/step device time
# of which ~2/3 was V-layout fallout (round-5 trace, docs/design.md §7).
# The dot form keeps the weight in the natural (8,128)-tiled GEMM layout.
_CONV1X1_DOT_MIN_WEIGHT = 2 ** 21


def conv1x1(x, w, *, precision=None):
    """Pointwise conv.  x: [B, Cin, T], w: [Cout, Cin] -> [B, Cout, T]."""
    if w.shape[0] * w.shape[1] >= _CONV1X1_DOT_MIN_WEIGHT:
        # materialize a computed weight (weight-norm chain, bf16 cast)
        # before the GEMM: fused weight-producing chains make the emitter
        # recompute the weight per output tile — the WSRGlow V GEMMs
        # traced at ~5% MFU without this
        w = lax.optimization_barrier(w)
    if (_CONV1X1_IMPL == "conv"
            and w.shape[0] * w.shape[1] < _CONV1X1_DOT_MIN_WEIGHT):
        if w.ndim == 2:
            w = w[:, :, None]
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=_prec(precision),
        )
    if w.ndim == 3:  # accept [Cout, Cin, 1]
        w = w[..., 0]
    return lax.dot_general(
        w,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_prec(precision),
    ).transpose(1, 0, 2)


def conv2d_causal_h(x, w, *, h_dilation=1, dilation=1, precision=None):
    """2-D conv, causal along height, 'same' along width.

    x: [B, Cin, H, W], w: [Cout, Cin, Kh, Kw].  Height is padded only on the
    top by ``h_dilation*(Kh-1)`` so output row i depends on input rows <= i —
    the WaveFlow height-causal convolution (reference ``model/waveflow.py:25-26,42``).
    """
    kh, kw = w.shape[-2:]
    h_pad = h_dilation * (kh - 1)
    w_pad = dilation * (kw - 1) // 2
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(h_pad, 0), (w_pad, w_pad)],
        rhs_dilation=(h_dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_prec(precision),
    )


def conv2d(x, w, *, h_dilation=1, dilation=1, padding="valid", precision=None):
    """Plain 2-D dilated conv with explicit padding. x: [B,Cin,H,W], w: [Cout,Cin,Kh,Kw]."""
    if padding == "valid":
        padding = [(0, 0), (0, 0)]
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(h_dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_prec(precision),
    )


def conv_transpose1d(x, w, *, stride, padding, groups=1, precision=None):
    """PyTorch-semantics ConvTranspose1d, lowered as a polyphase einsum.

    x: [B, Cin, T]; w: [Cin, Cout//groups, K] (the *PyTorch ConvTranspose1d*
    weight layout, so reference upsampler weights translate directly —
    ``model/waveglow.py:126-129``).  Output length = (T-1)*stride - 2*padding + K.

    Lowering: the textbook form — insert ``stride-1`` zeros between inputs
    (``lhs_dilation``) and correlate with the flipped kernel — degrades
    badly in XLA:TPU at large stride: the hop-512 MusicNet upsampler
    (stride 64, K=129) measured ~0.3 s standalone and poisoned every flow
    group compiled with it in one graph (~15x: 3.4 s vs 0.55 s summed
    parts on a 9.7 s utterance).  Instead, split the kernel into
    ``stride`` phases of D = ceil(K/stride) taps: output sample
    ``j = q*stride + r - padding`` only sees input frames ``q-d``
    (d < D), so the whole op is one dense contraction over (in-channel,
    tap) per phase — no input dilation anywhere.  The phase weights
    W[g,i,o,d,r] = w[g,i,o,d*stride+r] (zero-padded past K) give
    ``out[b,g,o,q,r] = sum_{i,d} x[b,g,i,q-d] * W[g,i,o,d,r]``, and the
    [q, r] axes flatten into the time axis.  Equivalence with torch is
    covered by the model-level parity suite (test_reference_parity.py).
    """
    k = w.shape[-1]
    if stride == 1:
        # degenerate case: plain correlation with the flipped kernel
        if groups == 1:
            w_flip = jnp.flip(w, -1).transpose(1, 0, 2)
        else:
            cin = w.shape[0]
            cpg = cin // groups
            wg = jnp.flip(w, -1).reshape(groups, cpg, w.shape[1], k)
            w_flip = wg.transpose(0, 2, 1, 3).reshape(
                groups * w.shape[1], cpg, k)
        pad = k - 1 - padding
        return lax.conv_general_dilated(
            x, w_flip, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=groups, precision=_prec(precision))

    b, cin, t = x.shape
    cog = w.shape[1]  # Cout // groups
    cpg = cin // groups
    d_taps = (k - 1) // stride + 1
    out_len = (t - 1) * stride - 2 * padding + k
    # phase weights: [Cin, cog, D, stride] with k = d*stride + r
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, d_taps * stride - k)))
    wp = wp.reshape(groups, cpg, cog, d_taps, stride)
    # shifted input stack: X[..., d, q] = x[..., q - d], q in [0, T+D-1)
    q_len = t + d_taps - 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (d_taps - 1, d_taps - 1)))
    shifts = jnp.stack(
        [xp[..., d_taps - 1 - d : d_taps - 1 - d + q_len]
         for d in range(d_taps)], axis=2)  # [B, Cin, D, Q]
    shifts = shifts.reshape(b, groups, cpg, d_taps, q_len)
    out = jnp.einsum("bgidq,giodr->bgoqr", shifts, wp,
                     precision=_prec(precision))
    out = out.reshape(b, groups * cog, q_len * stride)
    return out[..., padding : padding + out_len]
