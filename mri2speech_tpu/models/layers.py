"""Conv building blocks with torch-parity semantics, laid out TPU-first.

Design notes
------------
* Internal activation layout is **(B, T, C)** (channels-last) — the fast layout on
  TPU, where XLA lowers convs onto the MXU without transposes. The reference's
  (B, C, T) layout only appears at public API boundaries.
* Kernels are stored as **(k, in, out)** (HIO). The torch-checkpoint converter
  transposes torch's (out, in, k) / (in, out, k) accordingly.
* Weight norm (`torch.nn.utils.weight_norm`, dim=0) is reproduced exactly:
  ``w = g * v / ||v||`` with the norm over all axes except torch's dim 0
  (out-channels for Conv1d, in-channels for ConvTranspose1d). Params are stored
  as ``{v, g, b}``; :func:`fold_weight_norm` folds them into plain ``{w, b}``
  for inference (the `remove_weight_norm` equivalent,
  `models.py:51-55,133-140`).
* Spectral norm (first MSD discriminator, `models.py:242`) uses one power
  iteration per step with the ``u`` vector kept in a mutable ``norm_stats``
  collection, mirroring torch's behavior.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PadT = Union[int, Tuple[int, int]]


def _as_pair(p: PadT) -> Tuple[int, int]:
    if isinstance(p, tuple):
        return p
    return (int(p), int(p))


def torch_fan_uniform_init(fan: int):
    """torch's default bounded-uniform init U(-1/sqrt(fan), 1/sqrt(fan)).

    One shared helper for the three places torch uses it: Conv
    (kaiming_uniform(a=sqrt(5)) reduces to exactly this), Linear
    weight/bias, and the LSTM parameters (fan = hidden size)."""
    bound = 1.0 / np.sqrt(fan)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch Conv default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)
torch_conv_kernel_init = torch_fan_uniform_init


def normal_init(std: float = 0.01):
    """`utils.init_weights` equivalent: N(0, 0.01) on conv weights (`utils.py:22-25`)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def _wn_norm(v: Array, preserved_axis: int) -> Array:
    """L2 norm over all axes except `preserved_axis`, keepdims (weight-norm g shape)."""
    axes = tuple(a for a in range(v.ndim) if a != preserved_axis)
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


class Conv1d(nn.Module):
    """1D conv on (B, T, C) with torch-compatible explicit padding.

    padding: (left, right) zeros applied before a VALID conv. Weight-norm params
    when ``weight_norm=True``; spectral-norm when ``spectral_norm=True``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: PadT = 0
    groups: int = 1
    weight_norm: bool = False
    spectral_norm: bool = False
    use_bias: bool = True
    kernel_init: Optional[object] = None  # None -> torch default
    quantize: bool = False  # int8 MXU path (opt-in lossy; see ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        shape = (k, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * k
        kinit = self.kernel_init or torch_conv_kernel_init(fan_in)

        if self.weight_norm:
            v = self.param("v", kinit, shape)
            g = self.param("g", lambda rng: _wn_norm(v, preserved_axis=2))
            w = g * v / _wn_norm(v, preserved_axis=2)
        elif self.spectral_norm:
            w0 = self.param("w", kinit, shape)
            w = self._spectral_normalize(w0)
        else:
            w = self.param("w", kinit, shape)

        b = (
            self.param("b", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )

        dtype = self.dtype or x.dtype
        lo, hi = _as_pair(self.padding)
        if self.quantize:
            if self.stride == 1 and self.groups == 1:
                from mri2speech_tpu.ops.quant import conv1d_int8

                return conv1d_int8(
                    x, w, b, dilation=self.dilation, padding=(lo, hi),
                    out_dtype=dtype,
                )
            import warnings

            warnings.warn(
                f"Conv1d(quantize=True) has no int8 path for stride="
                f"{self.stride}/groups={self.groups}; running unquantized.",
                stacklevel=2,
            )
        x = x.astype(dtype)
        w = w.astype(dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride,),
            padding=[(lo, hi)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(dtype)

    def _spectral_normalize(self, w: Array) -> Array:
        """One torch-style power iteration; u persisted in `norm_stats`."""
        out_ch = w.shape[-1]
        w_mat = w.reshape(-1, out_ch).T  # (out, in*k) — torch view(out, -1)
        def _init_u():
            u0 = jax.random.normal(jax.random.PRNGKey(0), (out_ch,))
            return u0 / jnp.maximum(jnp.linalg.norm(u0), 1e-12)

        u_var = self.variable("norm_stats", "u", _init_u)
        u = u_var.value
        v = w_mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w_mat @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        sigma = u_new @ (w_mat @ v)
        if not self.is_initializing() and self.is_mutable_collection("norm_stats"):
            u_var.value = jax.lax.stop_gradient(u_new)
        return w / jnp.maximum(sigma, 1e-12)


class ConvTranspose1d(nn.Module):
    """Transposed 1D conv on (B, T, C), torch ConvTranspose1d semantics.

    out_len = (T-1)*stride - 2*padding + kernel_size. Implemented as an
    lhs-dilated conv with a flipped kernel (XLA lowers this to an efficient
    strided MXU matmul). Kernel stored as (k, in, out); weight-norm preserves
    torch's dim=0 = the *input* channel axis.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    weight_norm: bool = True
    use_bias: bool = True
    polyphase: bool = False  # inference fast path: phase-decomposed dense conv
    kernel_init: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        shape = (k, in_ch, self.features)
        fan_in = in_ch * k  # torch fan_in for transposed conv uses in_ch*k as well
        kinit = self.kernel_init or torch_conv_kernel_init(fan_in)

        if self.weight_norm:
            v = self.param("v", kinit, shape)
            g = self.param("g", lambda rng: _wn_norm(v, preserved_axis=1))
            w = g * v / _wn_norm(v, preserved_axis=1)
        else:
            w = self.param("w", kinit, shape)

        b = (
            self.param("b", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.polyphase:
            return conv_transpose_polyphase(
                x, w.astype(dtype), self.stride, self.padding, bias=b
            ).astype(dtype)
        w = jnp.flip(w, axis=0).astype(dtype)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(dtype)


def conv_transpose_polyphase(
    x: Array, w: Array, stride: int, padding: int, bias: Optional[Array] = None
) -> Array:
    """torch-ConvTranspose1d-equivalent via polyphase decomposition.

    x: (B, T, in); w: (k, in, out) (the same layout ConvTranspose1d stores);
    returns (B, T*stride - 2*padding + ... ) — for the generator's configs
    (out_len == T*stride) this is exact.

    Instead of lhs-dilating the input (s-1 zeros between samples — 90% wasted
    multiplies if the backend materialises them), each output phase
    r = t mod s is one small dense conv over the UNDILATED input:
        out[s q + r, o] = sum_a x[q - a, i] W[i, o, s a + r + p]
    All s phases run as ONE conv with s*out output channels, then interleave.
    """
    k, c_in, c_out = w.shape
    s, p = stride, padding
    # global tap range over all phases
    a_lo = -(-(0 - (s - 1) - p) // s)  # ceil
    a_hi = (k - 1 - p) // s            # floor
    K = a_hi - a_lo + 1

    # packed kernel W'[m, i, (r, o)] = W[i, o, s*(a_hi - m) + r + p] or 0
    wk = jnp.swapaxes(w, 0, 2)  # (out, in, k) view -> easier gather below
    m_idx = np.arange(K)
    r_idx = np.arange(s)
    j = s * (a_hi - m_idx[:, None]) + r_idx[None, :] + p  # (K, s)
    valid = (j >= 0) & (j < k)
    j_clip = np.clip(j, 0, k - 1)
    # gather: (K, s, in, out)
    packed = jnp.transpose(wk[:, :, j_clip], (2, 3, 1, 0))
    packed = packed * jnp.asarray(valid, packed.dtype)[:, :, None, None]
    packed = packed.reshape(K, s, c_in, c_out).transpose(0, 2, 1, 3).reshape(
        K, c_in, s * c_out
    )

    y = jax.lax.conv_general_dilated(
        x,
        packed,
        window_strides=(1,),
        padding=[(a_hi, max(0, -a_lo))],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, T', s*out)
    B, Tq, _ = y.shape
    y = y.reshape(B, Tq, s, c_out).reshape(B, Tq * s, c_out)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Conv2d(nn.Module):
    """2D conv on (B, H, W, C) with explicit (padH, padW); used by the MPD."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[PadT, PadT] = (0, 0)
    weight_norm: bool = False
    spectral_norm: bool = False
    use_bias: bool = True
    kernel_init: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        kinit = self.kernel_init or torch_conv_kernel_init(fan_in)

        if self.weight_norm:
            v = self.param("v", kinit, shape)
            g = self.param("g", lambda rng: _wn_norm(v, preserved_axis=3))
            w = g * v / _wn_norm(v, preserved_axis=3)
        elif self.spectral_norm:
            w0 = self.param("w", kinit, shape)
            w = self._spectral_normalize(w0)
        else:
            w = self.param("w", kinit, shape)

        b = (
            self.param("b", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )

        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=self.strides,
            padding=[_as_pair(self.padding[0]), _as_pair(self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(dtype)

    def _spectral_normalize(self, w: Array) -> Array:
        out_ch = w.shape[-1]
        w_mat = w.reshape(-1, out_ch).T
        u_var = self.variable(
            "norm_stats", "u", lambda: jnp.ones((out_ch,)) / np.sqrt(out_ch)
        )
        u = u_var.value
        v = w_mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = w_mat @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        sigma = u_new @ (w_mat @ v)
        if not self.is_initializing() and self.is_mutable_collection("norm_stats"):
            u_var.value = jax.lax.stop_gradient(u_new)
        return w / jnp.maximum(sigma, 1e-12)


def leaky_relu(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * slope)


def avg_pool1d_torch(x: Array, kernel: int, stride: int, padding: int) -> Array:
    """torch AvgPool1d with count_include_pad=True on (B, T, C).

    Used by the MSD's meanpools (`models.py:246-249`: AvgPool1d(4, 2, padding=2)).
    """
    x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, 1), (1, stride, 1), "VALID"
    )
    return s / float(kernel)


def reflect_pad_time(x: Array, pad: Tuple[int, int]) -> Array:
    """Reflect-pad the time axis of (B, T, C)."""
    return jnp.pad(x, ((0, 0), pad, (0, 0)), mode="reflect")


def fold_weight_norm(params):
    """Fold {v, g} weight-norm params into plain {w} (remove_weight_norm).

    Works on any pytree of nested dicts; detects WN leaves by the presence of
    both 'v' and 'g' keys. ConvTranspose vs Conv is distinguished by g's shape
    (which axis is preserved).
    """
    if not isinstance(params, dict):
        return params
    if "v" in params and "g" in params:
        v, g = params["v"], params["g"]
        gshape = tuple(g.shape)
        # ConvTranspose1d preserves axis 1 (torch dim0 = in-channels); all other
        # convs preserve the last axis. Distinguish by g's keepdims shape; when
        # everything is size-1 (out=1 conv_post) any axis gives the same fold,
        # and the last axis is the correct conv convention.
        if len(gshape) == 3 and gshape[1] > 1 and gshape[2] == 1:
            preserved = 1
        else:
            preserved = v.ndim - 1
        w = g * v / _wn_norm(v, preserved_axis=preserved)
        out = {k: val for k, val in params.items() if k not in ("v", "g")}
        out["w"] = w
        return out
    return {k: fold_weight_norm(val) for k, val in params.items()}
