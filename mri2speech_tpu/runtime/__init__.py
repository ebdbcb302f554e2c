"""Native runtime pieces (C++): batched gather for the host data path."""

from mri2speech_tpu.runtime.native import gather_rows, prefetch_rows, native_available  # noqa: F401
