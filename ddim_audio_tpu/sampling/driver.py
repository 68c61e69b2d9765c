"""Chunked lax.scan sampler driver.

The reference's samplers are Python loops of T sequential model calls with
per-kept-step device→host copies (``functions/denoising.py:21-50,66-91``).
Here the loop is a jitted ``jax.lax.scan`` over precomputed per-step
coefficient arrays: the only Python-level iteration is over *chunks*, between
which selected outputs are fetched to host — this bounds HBM for
``--sequence -1`` at t_size 8192 (SURVEY.md §7 hard part d: 1000 full states
cannot live on device) while keeping the hot loop fully on-device.

Selected outputs are written into preallocated ``[n_slots + 1, ...]`` carry
buffers via dynamic_update_index (scan cannot append); unselected steps write
to the trash slot ``n_slots``. Chunk boundaries are chosen so that each
chunk's buffer fits a memory budget; a last-only fast path carries just x.

select_index semantics match the reference (``functions/denoising.py:29-34``):
step index k (0-based over the reversed sequence) is kept iff
``k in select_index or k - K in select_index`` (negative indexing supported);
``None`` keeps every step.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ddim import ddim_coefficients, ddim_step
from .ddpm import ddpm_coefficients, ddpm_step

_BUFFER_BUDGET_BYTES = 4 << 30


def selected_steps(num_steps: int, select_index) -> list[int]:
    if select_index is None:
        return list(range(num_steps))
    sel = set(int(s) for s in select_index)
    return [k for k in range(num_steps) if k in sel or k - num_steps in sel]


def _chunk_plan(num_steps, selected, scan_chunk, max_slots):
    """Greedy chunking into HOMOGENEOUS runs of kept or non-kept steps,
    each ≤ scan_chunk steps and ≤ max_slots kept.

    Splitting at every kept↔non-kept transition means non-kept stretches run
    the buffer-free fast program: a buffered chunk never pays the
    state_to_saved transpose + two full-state buffer writes for steps that
    would land in the trash slot (at ``--sequence 10`` over 100 steps that
    was ~90 wasted write pairs — the trajectory row carried ~2.5× the
    last-only row's compute). Sparse selections cost a few extra chunk
    dispatches (gap lengths are near-uniform for linspace selections, so
    only ~2 distinct fast-chunk programs compile)."""
    sel = set(selected)
    chunks = []  # (start, stop, [kept indices])
    start = 0
    kept = []
    run_kept = False  # whether the current run consists of kept steps
    for k in range(num_steps):
        is_kept = k in sel
        if k > start and (
            k - start >= scan_chunk
            or len(kept) >= max_slots
            or is_kept != run_kept
        ):
            chunks.append((start, k, kept))
            start, kept = k, []
        if k == start:
            run_kept = is_kept
        if is_kept:
            kept.append(k)
    chunks.append((start, num_steps, kept))
    return [c for c in chunks if c[1] > c[0]]


class ScanSampler:
    """Runs DDIM ("generalized") or DDPM ("ddpm_noisy") sampling.

    denoise_fn(params, x [B,C,T,F], t int32 [B]) -> eps [B,C,T,F]. params is
    passed explicitly through the jitted chunk programs — closing over the
    47M-param pytree would bake it into the XLA program as constants, which
    both slows compilation dramatically and forces a recompile per weight set
    (raw vs EMA).
    """

    def __init__(self, denoise_fn, *, kind: str = "generalized",
                 scan_chunk: int = 100, state_to_saved=None,
                 noise_builder=None):
        """state_to_saved: optional fn(x) → array stored in the kept-state
        buffers instead of x itself (the flat-io sampling mode carries the
        flat [B, T, F·C] state; the converter restores the saved-state NCHW
        layout). noise_builder: optional fn(key, x) → per-step noise
        (flat-io mode draws channel-shaped noise and reshapes it, so flat
        trajectories stay bit-identical to the NCHW path)."""
        if kind not in ("generalized", "ddpm_noisy"):
            raise NotImplementedError(f"sample_type {kind}")
        self.denoise_fn = denoise_fn
        self.kind = kind
        self.scan_chunk = int(scan_chunk)
        self.state_to_saved = state_to_saved
        self.noise_builder = noise_builder
        self._cache = {}

    # ---- jitted chunk programs ------------------------------------------

    def _fast_chunk(self, with_noise, ext_noise, shape, dtype):
        """Carry = x only; no output buffers (last-only path)."""
        key_ = ("fast", with_noise, ext_noise, shape, str(dtype))
        if key_ not in self._cache:
            step = self._make_step(with_noise, ext_noise)

            def fn(params, x, coeffs, rng):
                def body(x, inp):
                    _, x_next = step(params, x, inp, rng)
                    return x_next, None

                x, _ = jax.lax.scan(body, x, coeffs)
                return x

            self._cache[key_] = jax.jit(fn)
        return self._cache[key_]

    def _buffered_chunk(self, n_slots, with_noise, ext_noise, shape, dtype,
                        buf_dtype, saved_shape):
        key_ = ("buf", n_slots, with_noise, ext_noise, shape, str(dtype),
                str(buf_dtype), saved_shape)
        if key_ not in self._cache:
            step = self._make_step(with_noise, ext_noise)
            sts = self.state_to_saved or (lambda v: v)

            def fn(params, x, coeffs, x0_slots, xt_slots, rng):
                x0_buf = jnp.zeros((n_slots + 1,) + saved_shape, buf_dtype)
                xt_buf = jnp.zeros((n_slots + 1,) + saved_shape, buf_dtype)

                def body(carry, inp):
                    x, x0_buf, xt_buf = carry
                    coeff, x0_slot, xt_slot = inp
                    x0, x_next = step(params, x, coeff, rng)
                    x0_buf = jax.lax.dynamic_update_index_in_dim(
                        x0_buf, sts(x0).astype(buf_dtype), x0_slot, 0
                    )
                    xt_buf = jax.lax.dynamic_update_index_in_dim(
                        xt_buf, sts(x_next).astype(buf_dtype), xt_slot, 0
                    )
                    return (x_next, x0_buf, xt_buf), None

                (x, x0_buf, xt_buf), _ = jax.lax.scan(
                    body, (x, x0_buf, xt_buf), (coeffs, x0_slots, xt_slots)
                )
                return x, x0_buf[:n_slots], xt_buf[:n_slots]

            self._cache[key_] = jax.jit(fn)
        return self._cache[key_]

    def _make_step(self, with_noise, ext_noise):
        denoise_fn = self.denoise_fn
        kind = self.kind

        def step(params, x, inp, rng):
            coeff = inp
            noise = None
            if ext_noise:
                coeff, noise = inp[:-1], inp[-1]
            t = coeff[0]
            tb = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.int32)
            eps = denoise_fn(params, x, tb)
            if with_noise and noise is None:
                kglobal = coeff[-1]  # appended global step index
                nkey = jax.random.fold_in(rng, kglobal)
                if self.noise_builder is not None:
                    noise = self.noise_builder(nkey, x)
                else:
                    noise = jax.random.normal(nkey, x.shape, x.dtype)
            if kind == "generalized":
                _, at, at_next, c1, c2 = coeff[:5]
                x0, x_next = ddim_step(x, eps, at, at_next, c1, c2, noise)
            else:
                _, at, coef_x0, coef_x, noise_scale = coeff[:5]
                x0, x_next = ddpm_step(x, eps, at, coef_x0, coef_x,
                                       noise_scale, noise)
            # fp32 coefficient math with a low-precision carry (the flat-io
            # bf16 state): intermediates promote to fp32, only the stored
            # carry re-quantizes
            return x0, x_next.astype(x.dtype)

        return step

    # ---- coefficient packing --------------------------------------------

    def _coeff_arrays(self, schedule, seq, eta):
        if self.kind == "generalized":
            c = ddim_coefficients(schedule.alphas_cumprod, seq, eta)
            order = ("t", "at", "at_next", "c1", "c2")
        else:
            c = ddpm_coefficients(schedule.betas, seq)
            order = ("t", "at", "coef_x0", "coef_x", "noise_scale")
        return tuple(c[k] for k in order)

    # ---- public API -------------------------------------------------------

    def sample_last(self, x, seq, schedule, *, eta=0.0, key=None, params=None):
        """Fast path: return only the final x (stays on device).
        Covers sampling.last_only (configs/audio.yml:71 — never consumed by
        the reference; first-class here)."""
        coeffs = self._coeff_arrays(schedule, seq, eta)
        K = len(coeffs[0])
        with_noise = self._needs_noise(eta)
        rng = key if key is not None else jax.random.key(0)
        for start in range(0, K, self.scan_chunk):
            stop = min(start + self.scan_chunk, K)
            packed = self._pack(coeffs, start, stop, with_noise)
            fn = self._fast_chunk(with_noise, False, x.shape, x.dtype)
            x = fn(params, x, packed, rng)
        return x

    def sample(
        self,
        x,
        seq,
        schedule,
        *,
        eta=0.0,
        select_index=None,
        key=None,
        noise_override=None,
        params=None,
        buffer_dtype=None,
        timings=None,
    ):
        """Full-parity path: returns (xs, x0_preds) as lists of host numpy
        arrays, xs[0] = the input noise (reference functions/denoising.py:17).

        noise_override: optional [K, *x.shape] array of per-step noises (used
        by parity tests to share noise with the torch reference).
        buffer_dtype: on-device dtype of the kept-state buffers; float16
        halves both HBM and the device→host transfer volume (the dominant
        cost of trajectory sampling over a remote-TPU tunnel) — host outputs
        are upcast back to float32. None keeps x.dtype (bit-exact path).

        Device→host fetches of chunk i overlap chunk i+1's compute: the next
        chunk is dispatched (async) and each buffer's transfer is started
        with ``copy_to_host_async`` before the previous chunk's results are
        materialized.

        timings: optional dict; when given, filled with ``compute_s`` (wall
        time until all chunk programs have executed, synced via a 1-element
        host fetch of the final x — the axon tunnel can return early from
        block_until_ready, so a host fetch is the only reliable sync),
        ``drain_s`` (remaining time spent materializing the final kept-state
        buffers on host), and ``mid_drains`` (buffer pairs evicted to host
        MID-RUN because pending kept states exceeded the HBM budget — the
        ``--sequence -1`` streaming path; >0 proves the eviction machinery
        executed). Benchmarks use the split so tunnel-transfer variance
        can't mask compute regressions; intermediate drains that overlap
        later chunks' compute are attributed to compute_s."""
        import time as _time

        t_start = _time.perf_counter()
        coeffs = self._coeff_arrays(schedule, seq, eta)
        K = len(coeffs[0])
        sel = selected_steps(K, select_index)
        with_noise = self._needs_noise(eta)
        ext_noise = noise_override is not None
        rng = key if key is not None else jax.random.key(0)
        buf_dtype = x.dtype if buffer_dtype is None else jnp.dtype(buffer_dtype)

        sts = self.state_to_saved or (lambda v: v)
        saved_shape = tuple(jax.eval_shape(sts, x).shape)
        saved_nbytes = (int(np.prod(saved_shape))
                        * jnp.dtype(buf_dtype).itemsize)
        max_slots = max(
            1, int(_BUFFER_BUDGET_BYTES // (2 * max(saved_nbytes, 1))) - 1)
        chunks = _chunk_plan(K, sel, self.scan_chunk, max_slots)

        xs = [np.asarray(sts(x))]
        x0_preds = []
        # Kept-state buffers stay ON DEVICE until either the end of the run
        # or the HBM budget forces a drain: a mid-loop host fetch blocks
        # Python from dispatching the next chunks, and over the remote-TPU
        # tunnel that stall (≈0.15 s per 16 MB pair) dwarfs the dispatch it
        # delays — deferring keeps the device queue saturated and accounts
        # the transfer where it belongs (drain_s). copy_to_host_async
        # starts each transfer early so the final drain mostly finds
        # already-landed buffers.
        pending = []  # [(x0_buf, xt_buf)] in chunk order, still on device
        pending_bytes = 0
        buf_pair_bytes = 2 * saved_nbytes
        mid_drains = 0

        def drain(bufs):
            nonlocal pending_bytes
            x0_buf, xt_buf = bufs
            x0_host = np.asarray(x0_buf).astype(np.float32, copy=False)
            xt_host = np.asarray(xt_buf).astype(np.float32, copy=False)
            for i in range(x0_host.shape[0]):
                x0_preds.append(x0_host[i])
                xs.append(xt_host[i])
            pending_bytes -= x0_buf.shape[0] * buf_pair_bytes

        for start, stop, kept in chunks:
            packed = self._pack(coeffs, start, stop, with_noise)
            if ext_noise:
                packed = packed + (jnp.asarray(noise_override[start:stop]),)
            n_slots = len(kept)
            if n_slots == 0:
                fn = self._fast_chunk(with_noise, ext_noise, x.shape, x.dtype)
                x = fn(params, x, packed, rng)
                continue
            slot_of = {k: i for i, k in enumerate(kept)}
            slots = np.array(
                [slot_of.get(k, n_slots) for k in range(start, stop)], np.int32
            )
            fn = self._buffered_chunk(n_slots, with_noise, ext_noise, x.shape,
                                      x.dtype, buf_dtype, saved_shape)
            x, x0_buf, xt_buf = fn(
                params, x, packed, jnp.asarray(slots), jnp.asarray(slots), rng
            )
            for buf in (x0_buf, xt_buf):
                try:
                    buf.copy_to_host_async()
                except Exception:
                    pass  # not all backends expose async copies
            pending.append((x0_buf, xt_buf))
            pending_bytes += n_slots * buf_pair_bytes
            while pending_bytes > _BUFFER_BUDGET_BYTES and len(pending) > 1:
                drain(pending.pop(0))  # bound HBM for --sequence -1 runs
                mid_drains += 1
        if timings is not None:
            float(x[(0,) * x.ndim])  # 1-element host fetch: compute done
            timings["compute_s"] = _time.perf_counter() - t_start
            timings["mid_drains"] = mid_drains
        for bufs in pending:
            drain(bufs)
        if timings is not None:
            timings["drain_s"] = (
                _time.perf_counter() - t_start - timings["compute_s"]
            )
        return xs, x0_preds

    def _needs_noise(self, eta):
        return self.kind == "ddpm_noisy" or eta != 0.0

    @staticmethod
    def _pack(coeffs, start, stop, with_noise):
        packed = tuple(jnp.asarray(c[start:stop]) for c in coeffs)
        if with_noise:
            packed = packed + (jnp.arange(start, stop, dtype=jnp.uint32),)
        return packed
