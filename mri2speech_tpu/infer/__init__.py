"""Inference & export: the product paths (video->wav, wav->wav, mel->wav)."""

from mri2speech_tpu.infer.online import OnlineVideoToSpeech  # noqa: F401
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline  # noqa: F401
from mri2speech_tpu.infer.vocoder_io import load_generator  # noqa: F401
