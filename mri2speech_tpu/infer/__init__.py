"""Inference & export: the product paths (video->wav, wav->wav, mel->wav).

Re-exports are lazy (PEP 562) so that loading a frozen AOT serving artifact
(`mri2speech_tpu.infer.export`) genuinely imports NO model code — the
artifact is the program, not a recipe for rebuilding it (pinned by
`tests/test_export.py::test_load_without_model_code`).
"""

_LAZY = {
    "OnlineVideoToSpeech": ("mri2speech_tpu.infer.online", "OnlineVideoToSpeech"),
    "VideoToSpeechPipeline": ("mri2speech_tpu.infer.pipeline", "VideoToSpeechPipeline"),
    "load_generator": ("mri2speech_tpu.infer.vocoder_io", "load_generator"),
    "ExportedPipeline": ("mri2speech_tpu.infer.export", "ExportedPipeline"),
    "export_pipeline": ("mri2speech_tpu.infer.export", "export_pipeline"),
    "load_exported_pipeline": ("mri2speech_tpu.infer.export", "load_exported_pipeline"),
}

__all__ = list(_LAZY)


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module_name), attr)
