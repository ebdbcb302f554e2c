"""int8 quantized serving mode: op-level error bounds + generator smoke.

This mode is opt-in and LOSSY (no reference analogue); these tests pin the
error characteristics so regressions in the quantization math are caught.
"""
import numpy as np

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator, fuse_mrf_params
from mri2speech_tpu.ops.quant import (
    conv1d_int8,
    quantize_per_tensor,
    quantize_weight_per_cout,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 32)) * 3.0, jnp.float32)
    q, s = quantize_per_tensor(x)
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    # symmetric int8: max error is half an LSB = scale / 2
    assert err.max() <= float(s) * 0.5 + 1e-7


def test_weight_quant_per_channel_scales():
    rng = np.random.default_rng(1)
    # channel 3 much larger than others: per-channel scales must adapt
    w = rng.standard_normal((5, 8, 4)).astype(np.float32)
    w[:, :, 3] *= 50.0
    q, s = quantize_weight_per_cout(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(deq - w).max(axis=(0, 1)) / np.abs(w).max(axis=(0, 1))
    assert rel.max() < 1.0 / 127  # half-LSB per channel, channel 3 included


def test_conv1d_int8_matches_float_conv():
    rng = np.random.default_rng(2)
    B, T, C = 2, 256, 32
    k, d = 11, 3
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1,), [(d * (k - 1), 0)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b

    out = conv1d_int8(x, w, b, dilation=d, padding=(d * (k - 1), 0))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # int8 dynamic-quant error at these shapes


def test_generator_quantized_output_close_to_float():
    h = dict(
        default_vocoder_config(upsample_initial_channel=32)
    )
    rng = np.random.default_rng(3)
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 4))
    )["params"]
    folded = fold_weight_norm(jax.device_get(params_wn))
    mel = jnp.asarray(rng.standard_normal((1, 64, 12)), jnp.float32)

    gen_f = Generator(h=h, use_weight_norm=False)
    y_f = np.asarray(gen_f.apply({"params": folded}, mel))

    gen_q = Generator(h=h, use_weight_norm=False, quantize_mrf=True)
    y_q = np.asarray(gen_q.apply({"params": folded}, mel))

    assert y_q.shape == y_f.shape
    assert np.isfinite(y_q).all()
    # random-weight generators produce near-zero audio; compare pre-tanh-scale
    # via relative L2 of the waveforms
    rel = np.linalg.norm(y_q - y_f) / (np.linalg.norm(y_f) + 1e-12)
    assert rel < 0.05, rel

    # the quantized flag composes with the fused-MRF inference transform
    mode = ("none", "none", "none", "dense")
    fused = fuse_mrf_params(folded, h, mode=list(mode))
    gen_qf = Generator(
        h=h, use_weight_norm=False, fuse_mrf=True, fuse_mode=mode,
        quantize_mrf=True,
    )
    y_qf = np.asarray(gen_qf.apply({"params": fused}, mel))
    rel2 = np.linalg.norm(y_qf - y_f) / (np.linalg.norm(y_f) + 1e-12)
    assert rel2 < 0.05, rel2
