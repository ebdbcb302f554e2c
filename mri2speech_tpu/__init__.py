"""mri2speech_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for rtMRI-to-speech.

Re-implements the full capability surface of the YamaneKoyo/mri-to-speech reference
pipeline (rtMRI video -> mel spectrogram -> waveform, plus interpretability tooling)
as an idiomatic TPU framework:

- signal ops (`ops/`): STFT + mel filterbank with bit-comparable semantics to the
  reference's librosa/torch.stft stack, MXU-friendly matmul-DFT path, Pallas fusions
- models (`models/`): EfficientNetV2-B2-style conv encoder + BiLSTM acoustic model,
  HiFi-GAN generator/discriminators — Flax modules, `lax.scan` recurrence,
  `jax.checkpoint` remat
- training (`train/`): optax-based acoustic + GAN trainers, micro-batch accumulation
  via `lax.scan`, orbax checkpointing, data-parallel `jit` over a device mesh
- inference / export / interpretability / eval (`infer/`, `interpret/`, `eval/`)

Reference layout and semantics are cited throughout as `<file>:<line>` relative to
the upstream repo.
"""

__version__ = "0.1.0"

from mri2speech_tpu.config import AttrDict, load_config, build_env  # noqa: F401
