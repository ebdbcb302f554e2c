"""int8 quantized inference ops for the vocoder conv stack (opt-in, lossy).

Why: the v5e MXU runs int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s),
and XLA's int8 conv lowering is measurably better than its bf16 one at the
generator's shapes — the dense stage-3 MRF conv stack times at 6.3 ms int8 vs
11.4 ms bf16 on-chip (docs/BENCH_NOTES.md). The reference has no analogue
(CUDA/torch fp16/fp32 only, `train.py:236-242`); this is a TPU-native serving
feature, OFF by default and clearly separated from the parity-exact path.

Scheme: symmetric int8.
* weights: per-output-channel scales, quantized from the float params on the
  fly (cheap — the conv weights are tiny next to the activations; the param
  tree stays the float one, so checkpoints/converters are untouched).
* activations: dynamic per-tensor scale (amax / 127) computed per conv input.
* accumulation in int32, dequantize to the float compute dtype.

Error characteristics are measured, not assumed: see
tests/test_quant.py (op-level bounds) and bench.py's `int8` stage report
(waveform/mel deltas + speed on the live chip).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_QMAX = 127.0


def quantize_per_tensor(x: Array) -> Tuple[Array, Array]:
    """Symmetric int8 per-tensor quantization: (q, scale) with x ~ q * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_weight_per_cout(w: Array) -> Tuple[Array, Array]:
    """Per-output-channel symmetric int8 for conv kernels (k, c_in, c_out).

    Returns (q (k, c_in, c_out) int8, scale (c_out,) fp32).
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def conv1d_int8(
    x: Array,
    w: Array,
    b: Optional[Array],
    *,
    dilation: int,
    padding: Tuple[int, int],
    out_dtype=None,
) -> Array:
    """Quantized causal 1D conv: channels-last x (B, T, C_in), w (k, C_in, C_out).

    Dynamically quantizes x per-tensor and w per-output-channel, convolves in
    int8 with int32 accumulation on the MXU, and dequantizes (+ bias) in fp32.
    Output dtype follows `out_dtype` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_per_tensor(x)
    wq, sw = quantize_weight_per_cout(w)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
