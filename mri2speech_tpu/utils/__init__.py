"""Shared utilities: plotting, profiling."""

from mri2speech_tpu.utils.plotting import plot_spectrogram  # noqa: F401
