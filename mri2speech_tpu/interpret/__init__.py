"""Interpretability tooling: Grad-CAM formant attribution, articulator masking."""

from mri2speech_tpu.interpret.gradcam import (  # noqa: F401
    GradCAMOutputs,
    compute_gradcam,
    parse_band_arguments,
)
