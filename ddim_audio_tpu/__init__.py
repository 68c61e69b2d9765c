"""ddim_audio_tpu — a TPU-native (JAX / XLA / Pallas / pjit) diffusion-audio framework.

A ground-up rebuild of the capabilities of klae01/ddim-audio (DDIM/DDPM audio
generation with a conv U-Net + FNet-bottleneck denoiser over 2-channel "pfft"
spectrograms), designed TPU-first:

- functional core: models are ``init``/``apply`` pairs over parameter pytrees
- samplers are ``jax.lax.scan`` loops over precomputed coefficient arrays
- training step is a single jitted function (loss, per-group optimizers,
  per-group gradient clipping, EMA) with no host sync in the hot loop
- parallelism via ``jax.sharding.Mesh`` + collectives compiled by XLA
  (data-parallel batching; sequence-parallel long clips via ``shard_map``)
- hot ops (DFT mixing, fused resblock/DDIM updates) as Pallas TPU kernels

Reference behavior is documented per-module with ``file:line`` citations into
``/root/reference`` so parity can be audited; no reference code is copied.
"""

__version__ = "0.1.0"
