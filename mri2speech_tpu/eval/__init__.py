"""Offline evaluation: masked MSE/MAE + MCD-like pseudo-MFCC distance."""

from mri2speech_tpu.eval.eval_mel import evaluate, mcd_like, simple_masked_loss  # noqa: F401
