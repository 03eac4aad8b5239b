"""Native C++ wav loader: parity with the scipy reader, batch fill, EOF
padding.  Skipped when no toolchain could build the library."""

import numpy as np
import pytest

from constant_memory_waveglow_tpu.training import native_loader
from constant_memory_waveglow_tpu.utils.audio import load_wav, save_wav

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("nat")
    x = (np.sin(np.linspace(0, 500, 50000)) * 0.7).astype(np.float32)
    p = str(d / "t.wav")
    save_wav(p, x, 22050)
    return p


def test_info(wav):
    n, sr = native_loader.wav_info(wav)
    assert (n, sr) == (50000, 22050)


def test_batch_parity_and_padding(wav):
    ref, _ = load_wav(wav)
    out = native_loader.fill_batch([wav] * 3, [0, 123, 49000], 4096)
    assert out.shape == (3, 4096) and out.dtype == np.float32
    assert np.array_equal(out[0], ref[:4096])
    assert np.array_equal(out[1], ref[123:123 + 4096])
    assert np.array_equal(out[2][:1000], ref[49000:])
    assert np.all(out[2][1000:] == 0)


def test_dataset_uses_native(wav, tmp_path):
    import shutil

    shutil.copy(wav, tmp_path / "a.wav")
    from constant_memory_waveglow_tpu.training.data import RandomWAVDataset

    ds = RandomWAVDataset(str(tmp_path), size=8, segment=4096)
    assert ds.use_native
    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng, 4)
    assert batch.shape == (4, 4096)
    # native and scipy paths agree
    ds2 = RandomWAVDataset(str(tmp_path), size=8, segment=4096, use_native=False)
    b1 = ds.sample_batch(np.random.default_rng(7), 4)
    b2 = ds2.sample_batch(np.random.default_rng(7), 4)
    assert np.array_equal(b1, b2)


def test_unsupported_depth_rejected_not_zeroed(tmp_path):
    """Regression (round-2 review): a float64 WAV (scipy writes format=3,
    bits=64) has no native decode branch; the header parse must REJECT it so
    the dataset falls back to scipy instead of training on silent zeros."""
    from scipy.io import wavfile

    from constant_memory_waveglow_tpu.training.data import RandomWAVDataset

    x = np.sin(np.linspace(0, 100, 30000)) * 0.5  # float64
    p = str(tmp_path / "f64.wav")
    wavfile.write(p, 22050, x)

    assert native_loader.wav_info(p) is None
    assert native_loader.fill_batch([p], [0], 4096) is None

    ds = RandomWAVDataset(str(tmp_path), size=4, segment=4096)
    batch = ds.sample_batch(np.random.default_rng(0), 2)
    assert float(np.abs(batch).max()) > 0.01  # decoded via fallback, not zeros


def test_extensible_float_wav(tmp_path):
    """Regression (round-2 review): WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries
    the real format code in the SubFormat GUID; an extensible IEEE-float
    file must decode as float, not be reinterpreted as int32 PCM."""
    import struct

    x = (np.sin(np.linspace(0, 80, 20000)) * 0.6).astype(np.float32)
    data = x.tobytes()
    # fmt chunk: extensible (40 bytes), SubFormat GUID for IEEE float (3)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 22050, 22050 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4)  # cbSize, valid bits, channel mask
    fmt += struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71])
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    riff = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    p = str(tmp_path / "ext.wav")
    with open(p, "wb") as f:
        f.write(riff)

    info = native_loader.wav_info(p)
    assert info is not None and info[0] == 20000
    out = native_loader.fill_batch([p], [100], 4096)
    assert out is not None
    assert np.array_equal(out[0], x[100:4196])
