"""Audio dataset: directory scan → pfft tensors.

Rebuild of the reference's empty SST ``AudioDataset`` from its call-site
contract (SURVEY.md §2.8; reference datasets/__init__.py:22-30): constructed
with ``path, f_size, t_size, virtual_samplerate, axis="CTF", HPI`` and yields
``[2, t_size, f_size]`` float32 tensors. The factory reproduces the
reference's deterministic 90/10 train/test split — shuffle with seed **1010**
while preserving the outer numpy RNG state (datasets/__init__.py:35-47).

Host-side, numpy only (the DataLoader boundary); the on-device codec lives in
ops/stft.py.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.stft import STFTConfig, num_samples
from .codec import read_audio, wav2pfft

_AUDIO_EXTS = (".wav", ".npy")


class AudioDataset:
    """Yields (pfft [2, t_size, f_size], 0) per item.

    Clips longer than t_size·hop samples contribute multiple items (one per
    non-overlapping window); shorter clips are zero-padded. ``axis`` supports
    "CTF" (the only order the reference config uses, configs/audio.yml:5)."""

    def __init__(
        self,
        path: str,
        f_size: int = 256,
        t_size: int = 1024,
        virtual_samplerate: int = 48000,
        axis: str = "CTF",
        HPI: bool = False,
        **_ignored,
    ):
        if axis != "CTF":
            raise NotImplementedError(f"axis order {axis!r}")
        self.cfg = STFTConfig(
            f_size=f_size, virtual_samplerate=virtual_samplerate, HPI=HPI
        )
        self.t_size = t_size
        self.window = num_samples(self.cfg, t_size)

        files = []
        for root, _, names in os.walk(path):
            for name in sorted(names):
                if name.lower().endswith(_AUDIO_EXTS):
                    files.append(os.path.join(root, name))
        files.sort()
        if not files:
            raise FileNotFoundError(f"{path} contains no audio files")

        # index: (file, window_start)
        self._items: list[tuple[str, int]] = []
        self._lengths: dict[str, int] = {}
        for f in files:
            n = self._length_of(f)
            self._lengths[f] = n
            n_windows = max(1, n // self.window)
            for w in range(n_windows):
                self._items.append((f, w * self.window))

    def _length_of(self, path: str) -> int:
        wave = read_audio(path, self.cfg.virtual_samplerate)
        return len(wave)

    def __len__(self) -> int:
        return len(self._items)

    def __getitem__(self, i: int):
        path, start = self._items[i]
        wave = read_audio(path, self.cfg.virtual_samplerate)
        seg = wave[start : start + self.window]
        if len(seg) < self.window:
            seg = np.pad(seg, (0, self.window - len(seg)))
        return wav2pfft(seg, self.cfg, self.t_size), 0


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def get_dataset(args, config):
    """Dataset factory (reference datasets/__init__.py:12-49): AUDIO only;
    validates the path; deterministic 90/10 split with seed 1010 while
    preserving the ambient numpy RNG state."""
    dataset, test_dataset = None, None
    if config.data.dataset == "AUDIO":
        path = config.data.path
        if not isinstance(path, str):
            raise Exception(f"Need to provide path of data. get {path}")
        if not os.path.isdir(path):
            raise NotADirectoryError(f"{path} is not a directory")
        if not os.listdir(path):
            raise FileNotFoundError(f"{path} do not contains files")
        kwargs = vars(config.data.dataset_kwargs)
        dataset = AudioDataset(path=path, **kwargs)

    if test_dataset is None and dataset is not None:
        num_items = len(dataset)
        indices = list(range(num_items))
        random_state = np.random.get_state()
        np.random.seed(1010)
        np.random.shuffle(indices)
        np.random.set_state(random_state)
        split = int(num_items * 0.9)
        test_dataset = Subset(dataset, indices[split:])
        dataset = Subset(dataset, indices[:split])

    return dataset, test_dataset


def batch_iterator(dataset, batch_size: int, *, shuffle: bool, seed: int = 0,
                   drop_last: bool = False):
    """Minimal epoch iterator over numpy batches (the reference uses a torch
    DataLoader with num_workers=0 — single-threaded host loading,
    configs/audio.yml:23)."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        xs = np.stack([dataset[int(j)][0] for j in idx])
        ys = np.zeros((len(idx),), np.int32)
        yield xs, ys
