"""fish-speech-tpu: a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A from-scratch rebuild of the capabilities of fishaudio/fish-speech (S2/S2-Pro):
a Dual-AR text->semantic transformer plus a modded-DAC neural audio codec,
re-designed for TPU hardware: jit-compiled prefill/decode loops with static KV
caches, Pallas kernels for the hot ops, and pjit/mesh sharding for scale-out.

Layout:
  fish_speech_tpu.config     -- typed configuration (single system for model/train/serve)
  fish_speech_tpu.tokenizer  -- semantic-token-aware tokenizer wrapper
  fish_speech_tpu.sequence   -- content-sequence / conversation prompt encoding
  fish_speech_tpu.models     -- DualAR LM and DAC codec (functional JAX)
  fish_speech_tpu.ops        -- core numeric ops + Pallas kernels
  fish_speech_tpu.parallel   -- mesh + sharding policy
  fish_speech_tpu.generate   -- prefill/decode generation loops
  fish_speech_tpu.engine     -- streaming TTS inference engine
  fish_speech_tpu.server     -- HTTP API server
  fish_speech_tpu.train      -- optax training stack (loss, LoRA, schedules)
  fish_speech_tpu.data       -- protobuf-stream dataset pipeline
  fish_speech_tpu.audio      -- WAV I/O, resampling, spectrograms
  fish_speech_tpu.convert    -- PyTorch checkpoint converters
"""

__version__ = "0.1.0"
