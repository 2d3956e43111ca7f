"""fseend_tpu — a TPU-native streaming speaker-diarization framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
Audio-WestlakeU/FS-EEND reference repo (FS-EEND, LS-EEND, EEND-EDA,
FLEX-STB), built TPU-first:

  * one unified diarization model API with three compile modes — batch
    (masked parallel), chunkwise (`lax.scan` over chunks), and per-frame
    streaming (`lax.scan` carrying an explicit `StreamState` pytree);
  * functional parameters/state (no in-place caches), which makes batched
    multi-stream serving a `vmap` over states;
  * static shapes + length masks everywhere (no ragged python lists);
  * data/model parallel training via `jax.sharding.Mesh` + NamedSharding
    (the reference's DDP equivalent, §2.3 of SURVEY.md);
  * host-side feature DSP implemented natively in numpy (no librosa
    dependency), bit-matching librosa's STFT/mel conventions.

Package map:
  ops/       core numerical ops (features, attention, retention, conv, norms)
  models/    FS-EEND, LS-EEND, EEND-EDA model families
  train/     losses, label protocol, optimizer/schedule, train loop
  data/      kaldi data-dir reader, chunked datasets, deterministic sampler
  parallel/  mesh + sharding rules
  serving/   streaming runtime (StreamState, fused scan serving loop)
  utils/     rttm writer, DER scorer, checkpointing, config system
"""

__version__ = "0.1.0"
