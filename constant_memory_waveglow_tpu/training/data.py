"""Random-segment WAV dataset + threaded prefetching loader.

The reference consumes ``RandomWAVDataset(data_dir, size, segment,
deterministic)`` from a git submodule (``.gitmodules:1-3``; behavior
re-derived from the configs, see SURVEY.md §2.2 row 19): a virtual dataset of
``size`` items per epoch, each a random ``segment``-sample crop from a random
wav under ``data_dir``, fed through a DataLoader with worker processes.

TPU-native equivalent: memory-mapped crop reads (only the segment touches
RAM), a thread pool for overlap with device compute, and batches delivered as
host numpy arrays ready for ``jax.device_put`` with a batch sharding.
"""

from __future__ import annotations

import glob
import os
import queue
import threading

import numpy as np

from ..utils.config import Registry
from ..utils.audio import crop_wav, wav_num_samples
from . import native_loader

DATASET_REGISTRY = Registry("dataset")


@DATASET_REGISTRY.register("RandomWAVDataset")
class RandomWAVDataset:
    """Virtual dataset of random fixed-length crops (SURVEY §2.2 row 19).

    ``augment=True`` adds on-the-fly augmentation to stretch tiny corpora
    (this environment ships 3 LJ utterances — see samples/README.md): per
    segment a random gain (±``gain_db`` dB), random polarity, and a random
    tempo/pitch warp (resampling by a factor in [1−warp, 1+warp], which for
    speech acts as combined pitch+tempo variation).  Augmentation is applied
    identically on the native and pure-python decode paths and is
    deterministic per example index in deterministic mode.
    """

    def __init__(self, data_dir, size, segment, deterministic=False,
                 use_native=True, augment=False, gain_db=4.0, warp=0.10):
        data_dir = os.path.expanduser(data_dir)
        self.files = sorted(
            glob.glob(os.path.join(data_dir, "**", "*.wav"), recursive=True)
        )
        if not self.files:
            raise FileNotFoundError(f"no .wav files under {data_dir}")
        self.size = size
        self.segment = segment
        self.deterministic = deterministic
        self.use_native = use_native and native_loader.available()
        self.augment = bool(augment)
        self.gain_db = float(gain_db)
        self.warp = float(warp)
        # decode enough extra samples that a slowed-down (factor > 1) warp
        # still fills `segment` output samples from real audio
        self._decode_len = (int(np.ceil(segment * (1 + self.warp))) + 1
                            if self.augment else segment)
        self._lengths = {}

    def __len__(self):
        return self.size

    def _file_len(self, path):
        n = self._lengths.get(path)
        if n is None:
            if self.use_native:
                info = native_loader.wav_info(path)
                n = info[0] if info else wav_num_samples(path)[0]
            else:
                n, _ = wav_num_samples(path)
            self._lengths[path] = n
        return n

    def sample_batch(self, rng: np.random.Generator, batch_size, base_index=0):
        """Decode a whole [batch_size, segment] batch, in native threads when
        the C++ loader is available."""
        picks, rngs = [], []
        for j in range(batch_size):
            r = (np.random.default_rng(base_index + j)
                 if self.deterministic else rng)
            path = self.files[int(r.integers(len(self.files)))]
            n = self._file_len(path)
            d = self._decode_len
            start = 0 if n <= d else int(r.integers(n - d))
            picks.append((path, start))
            rngs.append(r)
        out = None
        if self.use_native:
            out = native_loader.fill_batch(
                [p for p, _ in picks], [s for _, s in picks], self._decode_len)
        if out is None:
            out = np.stack([self._crop(p, s) for p, s in picks])
        if not self.augment:
            return out
        return np.stack([self._augment_one(rngs[j], out[j])
                         for j in range(batch_size)])

    def _augment_one(self, rng, x):
        """Gain / polarity / resample-warp one decoded [decode_len] segment
        down to [segment].  In deterministic mode ``rng`` is the per-example
        generator already advanced past the crop draws, so the augmentation
        is a pure function of the example index too."""
        seg = self.segment
        factor = float(rng.uniform(1.0 - self.warp, 1.0 + self.warp))
        src_len = min(len(x), max(2, int(round(seg * factor))))
        t = np.linspace(0.0, src_len - 1.0, seg)
        y = np.interp(t, np.arange(src_len, dtype=np.float64),
                      x[:src_len].astype(np.float64))
        gain = 10.0 ** (rng.uniform(-self.gain_db, self.gain_db) / 20.0)
        sign = -1.0 if rng.uniform() < 0.5 else 1.0
        y = np.clip(y * (gain * sign), -1.0, 1.0)
        return y.astype(np.float32)

    def _crop(self, path, start):
        n = self._file_len(path)
        d = self._decode_len
        if n <= d:
            x, _ = crop_wav(path, 0, n)
            return np.pad(x, (0, d - len(x)))
        x, _ = crop_wav(path, start, d)
        return x

    def sample(self, rng: np.random.Generator, index=None):
        """One random segment [segment] float32."""
        if self.deterministic and index is not None:
            rng = np.random.default_rng(index)
        path = self.files[int(rng.integers(len(self.files)))]
        n = self._file_len(path)
        d = self._decode_len
        start = 0 if n <= d else int(rng.integers(n - d))
        x = self._crop(path, start)
        if self.augment:
            return self._augment_one(rng, x)
        return x[:self.segment]

    def __getitem__(self, index):
        return self.sample(np.random.default_rng(), index)


class DataLoader:
    """Threaded batch loader: yields [B, segment] float32 numpy arrays.

    Mirrors the reference's ``DataLoader(batch_size, shuffle, num_workers,
    prefetch_factor, pin_memory)`` config surface (``model/lightning.py:46-50``);
    ``shuffle``/``pin_memory`` are accepted for config compatibility
    (sampling is random either way; pinning is meaningless on TPU hosts).

    ``batch_size`` is always the *global* batch; with ``process_count > 1``
    each process loads its ``batch_size / process_count`` slice (the
    multi-host analog of the reference's ``batch_size //= gpus``,
    ``train.py:51-53``), to be assembled with
    ``parallel.mesh.make_global_batch``.  In deterministic mode the slices
    partition the exact example indices a single process would load, so the
    assembled global batch is world-size-invariant.
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 prefetch_factor=4, pin_memory=False, seed=None, drop_last=True,
                 process_count=1, process_id=0):
        assert batch_size % process_count == 0, (
            f"global batch {batch_size} not divisible by {process_count} processes")
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // process_count
        self.process_count = process_count
        self.process_id = process_id
        self.num_workers = max(1, num_workers)
        self.prefetch = max(2, prefetch_factor)
        self.seed = seed
        self.steps_per_epoch = len(dataset) // batch_size

    def __len__(self):
        return self.steps_per_epoch

    def epoch(self, epoch_idx=0):
        """Iterate one epoch of batches with background prefetch threads."""
        n_batches = self.steps_per_epoch
        out_q = queue.Queue(maxsize=self.prefetch)
        idx_q = queue.Queue()
        for i in range(n_batches):
            idx_q.put(i)

        base_seed = (self.seed if self.seed is not None else np.random.SeedSequence().entropy)
        stop = threading.Event()

        def worker(wid):
            rng = np.random.default_rng(
                (int(base_seed) & 0xFFFFFFFF, epoch_idx, wid, self.process_id))
            while not stop.is_set():
                try:
                    bi = idx_q.get_nowait()
                except queue.Empty:
                    return
                # this process's slice of global batch bi: example indices
                # [bi*B + pid*local_b, bi*B + (pid+1)*local_b)
                base = bi * self.batch_size + self.process_id * self.local_batch
                try:
                    if hasattr(self.dataset, "sample_batch"):
                        batch = self.dataset.sample_batch(rng, self.local_batch, base)
                    else:
                        batch = np.stack([
                            self.dataset.sample(rng, base + j)
                            for j in range(self.local_batch)
                        ])
                except BaseException as e:  # surface it; a silently-dead
                    out_q.put((bi, e))      # worker would hang the consumer
                    return
                out_q.put((bi, batch))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            # yield strictly in batch-index order: with several workers,
            # completion order is nondeterministic, and in multi-host DP every
            # process must emit slice bi at the same step for
            # make_global_batch to stitch matching slices together
            pending = {}
            for want in range(n_batches):
                while want not in pending:
                    bi, batch = out_q.get()
                    if isinstance(batch, BaseException):
                        raise RuntimeError(
                            f"data worker failed on batch {bi}") from batch
                    pending[bi] = batch
                yield pending.pop(want)
        finally:
            stop.set()
            # workers only observe ``stop`` at the loop top; one abandoned
            # mid-epoch (max_steps break) may be blocked in out_q.put() on
            # the bounded queue holding a full batch — drain until every
            # worker has exited so nothing stays pinned for the process life
            while any(t.is_alive() for t in threads):
                try:
                    out_q.get(timeout=0.05)
                except queue.Empty:
                    pass


def build_dataset(config):
    from ..utils.config import get_instance

    return get_instance(DATASET_REGISTRY, config)
