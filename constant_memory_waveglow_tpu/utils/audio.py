"""WAV file IO (numpy/scipy only — no torchaudio on the image).

Float32 mono in [-1, 1] everywhere, matching the reference's torchaudio.load
usage (``train.py:20-22``, ``inference.py:24-25``).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


_SCALE = {
    np.dtype(np.int16): 1.0 / 32768.0,
    np.dtype(np.int32): 1.0 / 2147483648.0,
    np.dtype(np.uint8): None,  # handled specially
}


def load_wav(path, mono=True, mmap=False):
    """Read a wav file -> (float32 array [T] or [C, T], sample_rate)."""
    sr, data = wavfile.read(path, mmap=mmap)
    return _convert(data, mono), sr


def _convert(data, mono):
    if data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype in (np.int16, np.int32):
        x = data.astype(np.float32) * _SCALE[data.dtype]
    else:
        x = np.asarray(data, dtype=np.float32)
    if x.ndim == 2:
        x = x.T  # [C, T]
        if mono:
            x = x.mean(0)
    return x


def crop_wav(path, start, length, mono=True):
    """Memory-mapped random-crop read: only the requested samples hit RAM."""
    sr, data = wavfile.read(path, mmap=True)
    seg = np.asarray(data[start : start + length])
    return _convert(seg, mono), sr


def wav_num_samples(path):
    sr, data = wavfile.read(path, mmap=True)
    return data.shape[0], sr


def save_wav(path, x, sr):
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x, -1.0, 1.0)
    wavfile.write(path, sr, (x * 32767.0).astype(np.int16))
