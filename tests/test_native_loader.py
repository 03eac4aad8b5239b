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
