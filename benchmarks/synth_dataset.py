#!/usr/bin/env python
"""Generate a synthetic 48 kHz WAV dataset at the production window size.

Used by the committed end-to-end training demonstration (runs/train500/):
the reference trains on real music (README.md:12-16); for a hardware
bring-up run the DATA distribution is irrelevant — what is being proven is
the production train loop (loss ↓, snapshot/resume, sampling from the
checkpoint) at audio.yml scale. Tonal mixtures + noise give the denoiser a
learnable spectral structure so the loss curve is meaningfully decreasing.

Usage: python benchmarks/synth_dataset.py <out_dir> [n_files] [windows_per_file]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddim_audio_tpu.ops.stft import STFTConfig, num_samples  # noqa: E402


def main(out_dir, n_files=8, windows_per_file=4):
    from scipy.io import wavfile

    cfg = STFTConfig(f_size=256, virtual_samplerate=48000)
    window = num_samples(cfg, 1024)  # one [2, 1024, 256] training item
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = cfg.virtual_samplerate
    n = window * windows_per_file
    t = np.arange(n) / sr
    for i in range(n_files):
        wave = np.zeros(n, np.float64)
        for _ in range(6):  # tonal skeleton with slow AM
            f0 = float(rng.uniform(60.0, 8000.0))
            am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.1, 2.0) * t
                                    + rng.uniform(0, 2 * np.pi))
            wave += rng.uniform(0.05, 0.25) * am * np.sin(
                2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
        wave += 0.02 * rng.standard_normal(n)
        wave /= max(1.0, np.abs(wave).max() / 0.9)
        wavfile.write(os.path.join(out_dir, f"synth_{i}.wav"), sr,
                      (wave * 32767).astype(np.int16))
    print(f"wrote {n_files} files x {windows_per_file} windows "
          f"({window} samples each) to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))
