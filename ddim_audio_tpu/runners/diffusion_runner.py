"""The Diffusion runner: orchestration of train / sample / test.

Capability parity with the reference ``Diffusion`` class
(``runners/diffusion.py:90-523``) re-shaped for TPU:

- schedules precomputed once on the host (§3.4) and closed over by jitted fns
- ``train``: dataset + deterministic split, per-group optimizers, EMA, resume
  (fixed semantics), snapshot at step 1 and every snapshot_freq; the hot loop
  never syncs — metrics are fetched at ``training.log_freq`` cadence
- ``sample``: checkpoint load (EMA weights when enabled), dispatch to
  fid / interpolation / sequence; sequence writes x0-prediction PNGs + WAVs
  (reference :377-422). fid/interpolation raise NotImplementedError for the
  AUDIO dataset exactly as the reference does (:369-372, :469-471)
- ``test``: a real validation pass (the reference's test() is ``pass``,
  :522-523 — strictly more capable here): mean ε-loss over the held-out split
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..checkpoint import checkpoint_path, load_checkpoint, save_checkpoint
from ..config import production_eval_cfg
from ..data.audio_dataset import batch_iterator, get_dataset
from ..data.codec import limit_length_img, pfft2img, pfft2wav
from ..diffusion.schedules import make_schedule, make_timestep_subsequence
from ..models.unet import ModelConfig, apply_model, count_params, init_model
from ..ops.signal import denoise_2d
from ..parallel.mesh import make_mesh, shard_batch
from ..sampling.driver import ScanSampler
from ..training.losses import loss_registry
from ..training.train_step import init_train_state, make_train_step


class Diffusion:
    def __init__(self, args, config):
        self.args = args
        self.config = config
        self.model_cfg = ModelConfig.from_config(config)
        # Inference-only sampling overrides (dtype / act_store / tap_int8)
        # come from THE shared helper so the runner, bench.py and
        # benchmarks/run_all.py can never diverge (config.py).
        self.eval_cfg = production_eval_cfg(config, self.model_cfg)
        self.schedule = make_schedule(
            config.diffusion.beta_schedule,
            config.diffusion.beta_start,
            config.diffusion.beta_end,
            config.diffusion.num_diffusion_timesteps,
        )
        self.num_timesteps = self.schedule.num_timesteps
        # Every mesh shape keeps the flat Pallas kernels valid (GSPMD cannot
        # partition custom calls, so both paths are explicit shard_maps):
        # dp-only — sampling wraps the denoiser (_wrap_dp), training runs
        # per-device grads + pmean (make_train_step(mesh=)); sp>1 —
        # sampling routes through the SP forward (parallel/sp.apply_model_sp:
        # halo-exchanged kernels per time-shard, psum'd GroupNorm stats) and
        # training through the differentiable SP step (sp_local_train_forward
        # under make_train_step(mesh=), round 4 — sp>1 training used to
        # force conv_impl="xla").
        self.mesh = make_mesh(getattr(config, "parallel", None))

    # ------------------------------------------------------------------ train

    def train(self):
        args, config = self.args, self.config
        assert (config.training.n_epochs is not None) != (
            config.training.n_iters is not None
        )
        dataset, test_dataset = get_dataset(args, config)
        logging.info(
            "dataset: %d train / %d test items", len(dataset), len(test_dataset)
        )

        params = init_model(jax.random.key(args.seed), self.model_cfg)
        logging.info("model params: %d", count_params(params))
        state, tx = init_train_state(
            params, config.optimization, use_ema=bool(config.model.ema)
        )
        # The mesh-aware shard_map train step keeps the flat Pallas kernels
        # valid per device: dp-only = per-device grads + pmean; sp>1 = the
        # differentiable sharded-T forward with halo-exchange custom VJPs
        # (training/train_step.py, parallel/sp.py).
        train_step = make_train_step(
            self.model_cfg, config, self.schedule.alphas_cumprod, tx,
            mesh=self.mesh,
        )

        start_epoch, step = 0, 0
        if args.resume_training:
            state, meta = load_checkpoint(
                os.path.join(args.log_path, "ckpt.npz"), state
            )
            start_epoch, step = meta["epoch"], meta["step"]
            logging.info("resumed from step %d (epoch %d)", step, start_epoch)

        rng_root = jax.random.key(args.seed)
        tb = _tb_writer(config)
        log_freq = int(getattr(config.training, "log_freq", 1))
        snapshot_freq = config.training.snapshot_freq
        validation_freq = getattr(config.training, "validation_freq", None)
        pending = []  # (step, device-metrics) fetched lazily

        # Periodic validation on the held-out split with the CURRENT params
        # (consumes training.validation_freq, configs/audio.yml:74 — declared
        # but dead in the reference). A few batches keep it cheap.
        alphas = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)
        loss_impl = loss_registry[config.model.type]
        model_cfg = self.model_cfg

        @jax.jit
        def _val_loss(p, x0, t, e):
            def apply_fn(pp, xx, tt):
                return apply_model(pp, xx, tt, model_cfg, train=False)

            return loss_impl(apply_fn, p, x0, t, e, alphas)

        val_batches = int(
            getattr(config.training, "validation_batches", 2) or 2
        )

        def run_validation(step):
            vrng = np.random.default_rng(args.seed + step)
            losses = []
            for bi, (vx, _) in enumerate(batch_iterator(
                test_dataset, config.training.batch_size, shuffle=False
            )):
                if bi >= val_batches:  # bounded cost inside the train loop
                    break
                t = jnp.asarray(
                    vrng.integers(0, self.num_timesteps, size=(vx.shape[0],))
                )
                e = jax.random.normal(
                    jax.random.key(int(vrng.integers(1 << 31))),
                    vx.shape, jnp.float32,
                )
                losses.append(float(_val_loss(
                    state.ema if config.model.ema else state.params,
                    jnp.asarray(vx), t, e)))
            val = float(np.mean(losses)) if losses else float("nan")
            if tb is not None:
                tb.add_scalar("val_loss", val, global_step=step)
            logging.info("step: %d, val-loss: %.4f", step, val)

        def flush_metrics():
            for s, m in pending:
                host = {k: float(v) for k, v in m.items()}
                if tb is not None:
                    tb.add_scalar("loss", host["loss"], global_step=s)
                logging.info(
                    ", ".join(
                        [f"step: {s}"]
                        + [f"{k}: {v:.4f}" for k, v in host.items()]
                    )
                )
            pending.clear()

        def to_device(x):
            # [B, C, T, F]: batch over dp, time over sp (the SP train step's
            # shard_map layout; a no-op placement hint on dp-only meshes).
            # Called one batch AHEAD of the consuming step (see
            # _device_prefetch) so the host→device transfer overlaps the
            # current step's compute — on the remote-TPU tunnel the 56 MB
            # fp32 batch costs ~1-2 s at the measured ~25-40 MiB/s, several
            # times the 0.55 s step itself.
            return shard_batch(self.mesh, jnp.asarray(x), time_axis=2)

        def run_step(x, epoch, step):
            nonlocal state
            state, metrics = train_step(state, x, rng_root)
            if step % log_freq == 0:
                pending.append((step, metrics))
            if len(pending) >= 16:
                flush_metrics()
            if step % snapshot_freq == 0 or step == 1:
                flush_metrics()
                save_checkpoint(args.log_path, state, step, epoch=epoch)
            if validation_freq and step % int(validation_freq) == 0:
                flush_metrics()
                run_validation(step)

        def _device_prefetch(host_iter):
            """Yield device-placed batches one transfer ahead: batch i+1's
            host→device copy is dispatched (async) before batch i's train
            step runs, so the feed rides under the step's compute. Depth 1
            bounds extra HBM to one batch (56 MB at audio.yml scale)."""
            nxt = None
            for x, _ in host_iter:
                cur, nxt = nxt, to_device(x)
                if cur is not None:
                    yield cur
            if nxt is not None:
                yield nxt

        epoch = start_epoch
        try:
            num_workers = int(getattr(config.data, "num_workers", 0) or 0)
            if config.training.n_epochs is not None:
                for epoch in range(start_epoch, config.training.n_epochs):
                    for x in _device_prefetch(batch_iterator(
                        dataset, config.training.batch_size, shuffle=True,
                        seed=args.seed + epoch, num_workers=num_workers,
                    )):
                        step += 1
                        run_step(x, epoch, step)
            else:
                while step < config.training.n_iters:
                    for x in _device_prefetch(batch_iterator(
                        dataset, config.training.batch_size, shuffle=True,
                        seed=args.seed + epoch, num_workers=num_workers,
                    )):
                        step += 1
                        run_step(x, epoch, step)
                        if step >= config.training.n_iters:
                            break
                    epoch += 1
        except BaseException:
            # failure containment (the reference swallows exceptions and
            # loses all progress since the last snapshot, SURVEY.md §5):
            # persist an emergency snapshot, then propagate
            try:
                path = save_checkpoint(
                    args.log_path, state, step, epoch=epoch, tag="emergency"
                )
                logging.error("training interrupted; emergency snapshot: %s", path)
            except Exception:
                logging.exception("emergency snapshot failed")
            raise
        flush_metrics()
        save_checkpoint(args.log_path, state, step, epoch=epoch)

    # ----------------------------------------------------------------- sample

    def _load_eval_params(self):
        config = self.config
        params = init_model(jax.random.key(self.args.seed), self.model_cfg)
        state, _ = init_train_state(
            params, config.optimization, use_ema=bool(config.model.ema)
        )
        ckpt = checkpoint_path(
            self.args.log_path, getattr(config.sampling, "ckpt_id", None)
        )
        state, meta = load_checkpoint(ckpt, state)
        logging.info("loaded %s (step %d)", ckpt, meta["step"])
        # EMA weights for eval (reference runners/diffusion.py:309-313)
        return state.ema if config.model.ema else state.params

    @property
    def _denoise_fn(self):
        cfg = self.eval_cfg

        def fn(params, x, t):
            return apply_model(params, x, t, cfg, train=False)

        return fn

    def _wrap_dp(self, fn, batch: int):
        """Map a denoise fn's batch axis over the mesh with ``shard_map``
        (params replicated) — each device runs the full per-sample model
        locally, which keeps the Pallas flat kernels valid under data
        parallelism (GSPMD cannot auto-partition custom calls). Returns fn
        unchanged when the batch doesn't divide dp or the mesh also shards
        time (sp>1 runs the GSPMD/XLA path)."""
        mesh = self.mesh
        if (
            mesh is not None
            and mesh.shape.get("sp", 1) == 1
            and batch % mesh.shape["dp"] == 0
        ):
            from jax.sharding import PartitionSpec as P

            return jax.shard_map(
                fn, mesh=mesh, in_specs=(P(), P("dp"), P("dp")),
                out_specs=P("dp"), check_vma=False,
            )
        return fn

    def _denoise_for(self, batch: int):
        """NCHW denoise fn for a given batch size. sp>1 meshes run the
        explicit shard_map SP forward (time-sharded convs with halo
        exchanges; flat Pallas kernels per shard — parallel/sp.py); its
        ``params`` argument is the (params, packed taps) bundle built by
        ``_sampler_params`` so weight packing happens ONCE per weight set,
        not inside the sampler's scan body. dp-only meshes shard the batch
        (_wrap_dp)."""
        mesh = self.mesh
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            from ..parallel.sp import apply_model_sp

            cfg = self.eval_cfg

            def fn(bundle, x, t):
                params, packed = bundle
                return apply_model_sp(params, x, t, cfg, mesh, packed=packed)

            return fn
        return self._wrap_dp(self._denoise_fn, batch)

    def _sampler_params(self, params, t_total: int):
        """The value sample paths pass as the sampler's ``params``: on sp>1
        meshes, (params, eagerly pre-packed tap blocks) — scan-invariant
        explicit arguments, packed once (ADVICE round 3: packing inside the
        scan body re-emitted the packers' scatter chains per step)."""
        mesh = self.mesh
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            from ..parallel.sp import sp_sampling_bundle

            return (params,
                    sp_sampling_bundle(params, self.eval_cfg, mesh, t_total))
        return params

    def sample(self):
        args = self.args
        if getattr(args, "use_pretrained", False):
            # the reference's pretrained path covers CIFAR10/LSUN only and
            # raises ValueError otherwise (runners/diffusion.py:317-324)
            raise ValueError(
                "--use_pretrained supports no AUDIO checkpoints"
            )
        params = self._load_eval_params()
        if args.fid:
            self.sample_fid(params)
        elif args.interpolation:
            self.sample_interpolation(params)
        elif args.sequence is not None:
            self.sample_sequence(params)
        elif getattr(self.config.sampling, "last_only", False):
            # sampling.last_only (configs/audio.yml:71) — declared but never
            # consumed by the reference; here it dispatches the buffer-free
            # fast path and writes only the final WAV/PNG per sample.
            self.sample_last_only(params)
        else:
            raise NotImplementedError("Sample procedeure not defined")

    def sample_fid(self, params):
        if self.config.data.dataset == "AUDIO":
            raise NotImplementedError(
                "sample_fid with AUDIO dataset is not implemented"
            )
        raise NotImplementedError("only the AUDIO dataset is supported")

    def sample_interpolation(self, params):
        """Slerp interpolation in noise space → per-alpha spectrogram/WAV.

        The reference declares this path but raises NotImplementedError for
        AUDIO (runners/diffusion.py:468-471, its slerp driver :424-459 is
        image-only); implemented here as a capability extension using the
        reference's slerp and alpha grid (0.0 … 1.0 step 0.1)."""
        args, config = self.args, self.config
        shape = (
            1,
            config.model.channels,
            config.sampling.t_size,
            config.model.f_size,
        )
        k1, k2 = jax.random.split(jax.random.key(args.seed))
        z1 = jax.random.normal(k1, shape, jnp.float32)
        z2 = jax.random.normal(k2, shape, jnp.float32)

        theta = jnp.arccos(
            jnp.sum(z1 * z2) / (jnp.linalg.norm(z1) * jnp.linalg.norm(z2))
        )
        alphas = np.arange(0.0, 1.01, 0.1, dtype=np.float32)
        zs = jnp.concatenate(
            [
                jnp.sin((1 - a) * theta) / jnp.sin(theta) * z1
                + jnp.sin(a * theta) / jnp.sin(theta) * z2
                for a in alphas
            ],
            axis=0,
        )

        _, x0_preds = self.sample_image(zs, params, select_index=[-1])
        out = np.asarray(x0_preds[-1])  # [11, C, T, F] final x0 predictions
        if config.sampling.denoise:
            out = np.asarray(denoise_2d(jnp.asarray(out)))
        out = out.transpose(0, 3, 2, 1)  # → [N, F, T, C]

        from PIL import Image
        from scipy.io.wavfile import write as WAV_write

        for i, img in enumerate(out):
            path = os.path.join(args.image_folder, f"interp_{i:02d}")
            Image.fromarray(limit_length_img(pfft2img(img))).save(path + ".png")
            wav = pfft2wav(
                img,
                config.sampling.virtual_samplerate,
                dtype=np.int32,
                HPI=config.sampling.HPI,
            )
            WAV_write(
                path + ".wav",
                config.data.dataset_kwargs.virtual_samplerate,
                wav,
            )
        logging.info("wrote %d interpolation points to %s", len(out),
                     args.image_folder)

    def sample_sequence(self, params):
        args, config = self.args, self.config
        x = jax.random.normal(
            jax.random.key(args.seed),
            (
                config.sampling.num_samples,
                config.model.channels,
                config.sampling.t_size,
                config.model.f_size,
            ),
            jnp.float32,
        )
        # data-parallel batched sampling: shard samples across the mesh
        # (BASELINE.json config row 5 — no reference equivalent exists)
        if self.mesh is not None and x.shape[0] % self.mesh.shape["dp"] == 0:
            x = shard_batch(self.mesh, x)

        if args.sequence in (-1, 0):
            # keep EVERY step natively (reference runners/diffusion.py:388-394
            # appends each step of seq). select_index=range(timesteps) would
            # silently drop the tail when the uniform subsequence overshoots
            # the request (len(seq) > timesteps for non-divisor step counts).
            select_index = None
        else:
            idx = np.linspace(1, args.timesteps, args.sequence, dtype=np.int32)
            select_index = set((args.timesteps - idx).tolist())

        # NOTE: like the reference (runners/diffusion.py:396-398), the saved
        # images are the per-step predicted x0, not x_{t-1}.
        _, x0_preds = self.sample_image(x, params, select_index=select_index)

        outs = [np.asarray(p) for p in x0_preds]
        if config.sampling.denoise:
            outs = [np.asarray(denoise_2d(jnp.asarray(o))) for o in outs]
        outs = [o.transpose(0, 3, 2, 1) for o in outs]  # [N,C,T,F] → [N,F,T,C]

        from PIL import Image
        from scipy.io.wavfile import write as WAV_write

        digits = int(np.ceil(np.log10(len(outs) + 1)))
        for i, batch in enumerate(outs):
            for j, img in enumerate(batch):
                path = os.path.join(args.image_folder, f"{j}_{i:0{digits}d}")
                Image.fromarray(limit_length_img(pfft2img(img))).save(path + ".png")
                wav = pfft2wav(
                    img,
                    config.sampling.virtual_samplerate,
                    dtype=np.int32,
                    HPI=config.sampling.HPI,
                )
                WAV_write(
                    path + ".wav",
                    config.data.dataset_kwargs.virtual_samplerate,
                    wav,
                )
        logging.info("wrote %d sample steps to %s", len(outs), args.image_folder)

    def sample_last_only(self, params):
        """last_only: run the whole subsequence through the carry-only scan
        (no kept-state buffers, nothing fetched mid-run) and export only the
        final samples."""
        args, config = self.args, self.config
        x = jax.random.normal(
            jax.random.key(args.seed),
            (
                config.sampling.num_samples,
                config.model.channels,
                config.sampling.t_size,
                config.model.f_size,
            ),
            jnp.float32,
        )
        if self.mesh is not None and x.shape[0] % self.mesh.shape["dp"] == 0:
            x = shard_batch(self.mesh, x)
        seq = make_timestep_subsequence(
            self.num_timesteps, args.timesteps, args.skip_type
        )
        sampler, x_state, finalize = self._sampler_for_state(x)
        out = sampler.sample_last(
            x_state, seq, self.schedule, eta=args.eta,
            key=jax.random.key(args.seed + 1),
            params=self._sampler_params(params, x.shape[2]),
        )
        out = finalize(out)
        if config.sampling.denoise:
            out = np.asarray(denoise_2d(jnp.asarray(out)))
        out = out.transpose(0, 3, 2, 1)  # [N,C,T,F] → [N,F,T,C]

        from PIL import Image
        from scipy.io.wavfile import write as WAV_write

        for j, img in enumerate(out):
            path = os.path.join(args.image_folder, f"{j}_final")
            Image.fromarray(limit_length_img(pfft2img(img))).save(path + ".png")
            wav = pfft2wav(
                img,
                config.sampling.virtual_samplerate,
                dtype=np.int32,
                HPI=config.sampling.HPI,
            )
            WAV_write(
                path + ".wav",
                config.data.dataset_kwargs.virtual_samplerate,
                wav,
            )
        logging.info("wrote %d final samples to %s", len(out), args.image_folder)

    def _sampler_for_state(self, x):
        """(sampler, x_state, finalize) for a start noise x [B, C, T, F].

        When the eval model runs fully flat on TPU, the sampler carries the
        UNPADDED flat state [B, T, F·C] across steps
        (models.unet.apply_model_flat_io): the per-step NCHW↔NHWC
        transposes and convert/copy materializations cost ~8.6 ms/step at
        [1,2,8192,256] (profiled), and the asymmetric head/tail kernels
        (ops/pallas/conv_head_tail.py) let the state stay at the real
        channel count — 16× fewer bytes through every update op than the
        round-2 ch0-padded contract. Kept states convert back to
        [B, C, T, F] inside the chunk (state_to_saved); eta>0 noise is
        drawn channel-shaped then reshaped so trajectories match the NCHW
        path bit-for-bit."""
        from ..models.unet import (
            _supports_full_flat,
            apply_model_flat_io,
            flat_io_adapters,
        )

        config = self.config
        cfg = self.eval_cfg
        kind = self.args.sample_type
        scan_chunk = int(getattr(config.sampling, "scan_chunk", 100))
        batch = int(x.shape[0])
        # sp>1 meshes carry NCHW state through the shard_map SP forward
        # (_denoise_for) — the flat-io carried-state contract is a
        # single-device/dp layout.
        sp_mesh = (
            self.mesh is not None and self.mesh.shape.get("sp", 1) > 1
        )
        flat_ok = (
            not sp_mesh
            and (cfg.conv_impl == "pallas"
                 or (cfg.conv_impl == "auto"
                     and jax.default_backend() == "tpu"))
            and _supports_full_flat(cfg)
        )
        if not flat_ok:
            sampler = ScanSampler(
                self._denoise_for(batch), kind=kind, scan_chunk=scan_chunk)
            return sampler, x, np.asarray

        to_flat, from_flat, noise_builder = flat_io_adapters(cfg)

        def fn(params, xf, t):
            return apply_model_flat_io(params, xf, t, cfg)

        fn = self._wrap_dp(fn, batch)
        sampler = ScanSampler(
            fn, kind=kind, scan_chunk=scan_chunk,
            state_to_saved=from_flat, noise_builder=noise_builder)
        # the carry stays fp32: a bf16 carry saves only ~1 ms/step (the
        # update pass mostly hides) but costs 37 dB → measurable drift
        return sampler, to_flat(x), lambda out: np.asarray(from_flat(out))

    def sample_image(self, x, params, select_index=None):
        """Timestep subsequence + sampler dispatch
        (reference runners/diffusion.py:475-520)."""
        args = self.args
        seq = make_timestep_subsequence(
            self.num_timesteps, args.timesteps, args.skip_type
        )
        sampler, x_state, _ = self._sampler_for_state(x)
        return sampler.sample(
            x_state,
            seq,
            self.schedule,
            eta=args.eta,
            select_index=select_index,
            key=jax.random.key(args.seed + 1),
            params=self._sampler_params(params, x.shape[2]),
            # fp16 kept-state buffers (sampling.buffer_dtype, default
            # float16): halves HBM + device→host transfer — the dominant
            # cost of --sequence sampling over the remote-TPU tunnel;
            # exports are 8-bit PNG / PCM WAV, far below fp16 noise. Set
            # sampling.buffer_dtype: float32 for bit-exact kept states.
            buffer_dtype=getattr(self.config.sampling, "buffer_dtype",
                                 "float16") or "float16",
        )

    # ------------------------------------------------------------------- test

    def test(self):
        """Validation ε-loss over the held-out split (the reference's test()
        is a no-op, runners/diffusion.py:522-523)."""
        args, config = self.args, self.config
        _, test_dataset = get_dataset(args, config)
        params = self._load_eval_params()
        cfg = self.model_cfg
        alphas = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)
        loss_impl = loss_registry[config.model.type]

        def apply_fn(p, x, t):
            return apply_model(p, x, t, cfg, train=False)

        @jax.jit
        def eval_loss(p, x0, t, e):
            return loss_impl(apply_fn, p, x0, t, e, alphas)

        rng = np.random.default_rng(args.seed)
        losses = []
        t0 = time.time()
        for x, _ in batch_iterator(
            test_dataset, config.training.batch_size, shuffle=False
        ):
            t = jnp.asarray(rng.integers(0, self.num_timesteps, size=(x.shape[0],)))
            e = jax.random.normal(
                jax.random.key(int(rng.integers(1 << 31))), x.shape, jnp.float32
            )
            losses.append(float(eval_loss(params, jnp.asarray(x), t, e)))
        mean = float(np.mean(losses)) if losses else float("nan")
        logging.info(
            "test: mean eps-loss %.4f over %d batches (%.1fs)",
            mean, len(losses), time.time() - t0,
        )
        return mean


def _tb_writer(config):
    tb = getattr(config, "tb_logger", None)
    return tb
