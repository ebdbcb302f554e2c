"""Training subsystem: optax-based trainers, schedules, checkpointing."""

from mri2speech_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
