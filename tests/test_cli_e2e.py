"""End-to-end CLI integration: train → snapshot → resume → sample → test,
mirroring the reference README invocations (README.md:12-29) on the tiny
config. Runs main.main() in-process on the virtual-CPU backend."""

import os

import numpy as np
import pytest
import yaml

from ddim_audio_tpu.ops.stft import STFTConfig, num_samples


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Config + data dir + exp dir in a temp workspace."""
    ws = tmp_path_factory.mktemp("e2e")
    data_dir = ws / "downloads"
    data_dir.mkdir()
    from scipy.io import wavfile

    cfg = STFTConfig(f_size=16, virtual_samplerate=16000)
    n = num_samples(cfg, 8)
    rng = np.random.default_rng(0)
    for i in range(6):
        wave = (0.3 * rng.standard_normal(n)).astype(np.float32)
        wavfile.write(data_dir / f"c{i}.wav", 16000, (wave * 32767).astype(np.int16))

    with open("configs/audio_tiny.yml") as f:
        raw = yaml.safe_load(f)
    raw["data"]["path"] = str(data_dir)
    cfg_path = ws / "audio_tiny.yml"
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    return ws, str(cfg_path)


def _run(argv):
    import logging

    import main as cli

    code = cli.main(argv)
    # drop handlers added by the CLI so repeat invocations don't duplicate
    logging.getLogger().handlers.clear()
    return code


def test_train_sample_test_roundtrip(workspace):
    ws, cfg_path = workspace
    exp = str(ws / "exp")

    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "7"])
    assert code == 0
    log_dir = os.path.join(exp, "logs", "smoke")
    assert os.path.exists(os.path.join(log_dir, "config.yml"))
    assert os.path.exists(os.path.join(log_dir, "ckpt.npz"))
    assert os.path.exists(os.path.join(log_dir, "ckpt_1.npz"))  # step-1 snapshot
    assert os.path.exists(os.path.join(log_dir, "ckpt_4.npz"))
    assert os.path.exists(os.path.join(log_dir, "stdout.txt"))
    with open(os.path.join(log_dir, "stdout.txt")) as f:
        log = f.read()
    assert "loss:" in log

    # resume continues from the snapshot
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "7", "--resume_training"])
    assert code == 0

    # sample --sequence 3 --timesteps 10
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "7", "--sample", "--sequence", "3",
                 "--timesteps", "10", "-i", "smoke_images"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_images")
    files = sorted(os.listdir(img_dir))
    pngs = [f for f in files if f.endswith(".png")]
    wavs = [f for f in files if f.endswith(".wav")]
    assert len(pngs) == 3 and len(wavs) == 3  # num_samples=1 × 3 kept steps

    from scipy.io import wavfile

    sr, pcm = wavfile.read(os.path.join(img_dir, wavs[0]))
    assert sr == 16000 and pcm.dtype == np.int32
    assert pcm.shape[0] == num_samples(STFTConfig(f_size=16), 16)

    # test mode: validation loss
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "7", "--test"])
    assert code == 0


def test_failed_run_exits_nonzero(workspace, tmp_path):
    ws, cfg_path = workspace
    # point data path at nothing → runner raises → exit code 1 (the reference
    # swallows this into 0; we deliberately don't)
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    raw["data"]["path"] = str(tmp_path / "nope")
    bad_cfg = tmp_path / "bad.yml"
    with open(bad_cfg, "w") as f:
        yaml.dump(raw, f)
    code = _run(["--config", str(bad_cfg), "--doc", "bad", "--exp",
                 str(tmp_path / "exp"), "--ni"])
    assert code == 1


def test_interpolation_cli(workspace):
    """--interpolation for AUDIO: a capability the reference declares but
    raises NotImplementedError on (runners/diffusion.py:469-471)."""
    ws, cfg_path = workspace
    exp = str(ws / "exp")
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "11", "--sample", "--interpolation",
                 "--timesteps", "5", "-i", "smoke_interp"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_interp")
    wavs = [f for f in os.listdir(img_dir) if f.endswith(".wav")]
    assert len(wavs) == 11  # alpha grid 0.0 … 1.0 step 0.1


def test_bf16_sampling_dtype_override(workspace, tmp_path):
    """sampling.dtype=bfloat16 runs inference in bf16 without touching the
    training dtype."""
    ws, cfg_path = workspace
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    raw["sampling"]["dtype"] = "bfloat16"
    cfg2 = tmp_path / "bf16.yml"
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    exp = str(ws / "exp")
    if not os.path.exists(os.path.join(exp, "logs", "smoke", "ckpt.npz")):
        assert _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                     "--ni", "--seed", "7"]) == 0
    code = _run(["--config", str(cfg2), "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "13", "--sample", "--sequence", "2",
                 "--timesteps", "10", "-i", "smoke_bf16"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_bf16")
    assert len([f for f in os.listdir(img_dir) if f.endswith(".wav")]) == 2


def test_sequence_all_cli(workspace):
    """--sequence -1 keeps EVERY sampler step (reference runners/
    diffusion.py:388-394), including the overshoot tail: --timesteps 7
    over T=50 yields an 8-step uniform subsequence (range(0, 50, 7)), and
    all 8 x0-predictions must be written — the round-5 fix; the old
    select_index=range(timesteps) silently dropped the extra step."""
    ws, cfg_path = workspace
    exp = str(ws / "exp")
    if not os.path.exists(os.path.join(exp, "logs", "smoke", "ckpt.npz")):
        assert _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                     "--ni", "--seed", "7"]) == 0
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "7", "--sample", "--sequence", "-1",
                 "--timesteps", "7", "-i", "smoke_seqall"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_seqall")
    pngs = [f for f in os.listdir(img_dir) if f.endswith(".png")]
    assert len(pngs) == 8, sorted(pngs)  # num_samples=1 x 8 kept steps


@pytest.mark.heavy
def test_validation_freq_cli(workspace, tmp_path):
    """training.validation_freq (configs/audio.yml:74 — a dead knob in the
    reference) periodically evaluates the held-out split during training."""
    ws, cfg_path = workspace
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    raw["training"]["validation_freq"] = 2
    raw["training"]["n_iters"] = 4
    cfg2 = tmp_path / "val.yml"
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    exp = str(tmp_path / "exp")
    code = _run(["--config", str(cfg2), "--doc", "valrun", "--exp", exp,
                 "--ni", "--seed", "7"])
    assert code == 0
    with open(os.path.join(exp, "logs", "valrun", "stdout.txt")) as f:
        log = f.read()
    assert log.count("val-loss:") == 2  # steps 2 and 4


def test_last_only_sampling_cli(workspace):
    """--sample without --sequence consumes sampling.last_only: the
    buffer-free fast path writes only the final WAV/PNG per sample."""
    ws, cfg_path = workspace
    exp = str(ws / "exp")
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "21", "--sample",
                 "--timesteps", "10", "-i", "smoke_last"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_last")
    files = sorted(os.listdir(img_dir))
    assert files == ["0_final.png", "0_final.wav"]


def test_sp_mesh_sampling_cli(workspace, tmp_path):
    """Sampling under a parallel sp=2 mesh (virtual CPU devices): the runner
    routes the denoiser through the explicit shard_map SP forward
    (parallel/sp.apply_model_sp — halo-exchange convs, psum'd GroupNorm,
    gathered bottleneck) instead of dropping the mesh, and the sampler
    carries NCHW state (the flat-io carried-state contract is a
    single-device/dp layout)."""
    ws, cfg_path = workspace
    exp = str(ws / "exp")
    if not os.path.exists(os.path.join(exp, "logs", "smoke", "ckpt.npz")):
        assert _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                     "--ni", "--seed", "7"]) == 0
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    raw["parallel"] = {"dp": 1, "sp": 2}
    cfg2 = tmp_path / "sp.yml"
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    code = _run(["--config", str(cfg2), "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "17", "--sample", "--sequence", "2",
                 "--timesteps", "10", "-i", "smoke_sp"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_sp")
    wavs = [f for f in os.listdir(img_dir) if f.endswith(".wav")]
    assert len(wavs) == 2


def test_ddpm_sampling_cli(workspace):
    ws, cfg_path = workspace
    exp = str(ws / "exp")
    code = _run(["--config", cfg_path, "--doc", "smoke", "--exp", exp,
                 "--ni", "--seed", "9", "--sample", "--sequence", "2",
                 "--timesteps", "10", "--sample_type", "ddpm_noisy",
                 "-i", "smoke_ddpm"])
    assert code == 0
    img_dir = os.path.join(exp, "image_samples", "smoke_ddpm")
    assert len([f for f in os.listdir(img_dir) if f.endswith(".wav")]) == 2
