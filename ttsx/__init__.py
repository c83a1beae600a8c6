"""ttsx — TPU-native five-stage voice-similarity TTS framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
TTS-Core-Remastered-1 (reference layout: reference_encoder -> prosody3 ->
acoustic4 -> sde_refiner5 -> vocoder7, see /root/repo/SURVEY.md).

Layers:
  ttsx.core      config tree, PRNG, mesh/topology, checkpointing, metrics
  ttsx.dsp       STFT/mel frontend, f0/energy features, augments (host+device)
  ttsx.nn        shared blocks: S4 SSM, conformer, FiLM, VQ, MoE, GST, pooling
  ttsx.models    the five stages as pure-function flax modules
  ttsx.ops       Pallas TPU kernels + jnp reference implementations
  ttsx.train     unified block/callback training engine (GAN dual-opt, EMA)
  ttsx.parallel  jax.sharding meshes and pjit'd step builders
  ttsx.eval      EER / MCD / RTF / CI latency gates
  ttsx.pipeline  host-side observer ingestion (diarize -> ASR -> emotion tiers)
"""

__version__ = "0.1.0"
