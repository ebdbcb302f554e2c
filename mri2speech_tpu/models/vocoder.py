"""HiFi-GAN vocoder family (generator + MPD + MSD), TPU-native.

Reproduces the *fork's* exact length semantics (reference `models.py`,
`utils.py:34-35`) — which deviate from upstream jik876/hifi-gan — but expresses
them the efficient way:

* The fork pads every ResBlock conv with ``get_padding(k,d)=k*d-d`` on both sides
  and then trims the tail back to the input length (`models.py:38-48`). That is
  mathematically identical to a **causal conv with left padding d*(k-1)** — which
  is what we compute, saving the wasted tail work.
* ``conv_pre``/``conv_post`` are preceded by ``F.pad(x,(0,6))`` with VALID kernels
  of size 7 (`models.py:114,127`) — i.e. right-padded "anticausal" convs.
* Net result: output length is exactly ``T * prod(upsample_rates) = T * 420``
  (one mel frame -> one hop of audio), same as the reference.

Layout is channels-last internally; the public API accepts the reference's
``(B, n_mels, T)`` mel layout.

Note (fork quirk, `models.py:126`): the activation before conv_post is
leaky_relu with torch's DEFAULT slope 0.01, not LRELU_SLOPE=0.1.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri2speech_tpu.models.layers import (
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    avg_pool1d_torch,
    leaky_relu,
    normal_init,
)

Array = jax.Array

LRELU_SLOPE = 0.1


class ResBlock1(nn.Module):
    """MRF residual block, kernel k, dilations (1,3,5) (`models.py:11-55`).

    Each of the 3 units: leaky -> causal dilated conv -> leaky -> causal conv(d=1)
    -> residual add. All convs weight-normed, init N(0, 0.01).
    """

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    use_weight_norm: bool = True
    quantize: bool = False  # int8 conv path (opt-in lossy; ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, k, dilation=d, padding=(d * (k - 1), 0),
                weight_norm=self.use_weight_norm, kernel_init=normal_init(0.01),
                quantize=self.quantize, dtype=self.dtype, name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, k, dilation=1, padding=(k - 1, 0),
                weight_norm=self.use_weight_norm, kernel_init=normal_init(0.01),
                quantize=self.quantize, dtype=self.dtype, name=f"convs2_{i}",
            )(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block, dilations (1,3) (`models.py:58-85`)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    use_weight_norm: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, k, dilation=d, padding=(d * (k - 1), 0),
                weight_norm=self.use_weight_norm, kernel_init=normal_init(0.01),
                quantize=self.quantize, dtype=self.dtype, name=f"convs_{i}",
            )(xt)
            x = x + xt
        return x


class FusedMRFStage(nn.Module):
    """All `num_branches` MRF ResBlock1 branches of one stage as grouped convs.

    TPU-first inference transform: the reference runs 3 parallel ResBlocks with
    kernels (3, 7, 11) per upsample stage and averages them (`models.py:119-125`).
    At the late stages their channel counts (64/32) badly under-fill the MXU's
    128 lanes. Here the branches are CONCATENATED on the channel axis and each
    unit's two convs run as ONE grouped conv with kernels zero-padded to
    k_max — bit-equivalent outputs (left-zero-padding a causal kernel is an
    identity, see `fuse_mrf_params`), 3x wider matmuls, 6 convs per stage
    instead of 18.
    """

    channels: int                  # per-branch channels
    kernel_max: int                # max branch kernel (padded size)
    dilation: Tuple[int, ...] = (1, 3, 5)
    num_branches: int = 3
    mode: str = "dense"            # "dense" (block-diagonal, fastest measured)
    #                                or "grouped" (fewest FLOPs; XLA lowers
    #                                grouped convs poorly on current TPUs)
    quantize: bool = False         # int8 conv path (opt-in lossy; ops/quant.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nb, ch, k = self.num_branches, self.channels, self.kernel_max
        groups = 1 if self.mode == "dense" else nb
        X = jnp.tile(x, (1, 1, nb))
        for u, d in enumerate(self.dilation):
            xt = leaky_relu(X, LRELU_SLOPE)
            xt = Conv1d(
                nb * ch, k, dilation=d, padding=(d * (k - 1), 0), groups=groups,
                quantize=self.quantize, dtype=self.dtype, name=f"u{u}_conv1",
            )(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(
                nb * ch, k, dilation=1, padding=(k - 1, 0), groups=groups,
                quantize=self.quantize, dtype=self.dtype, name=f"u{u}_conv2",
            )(xt)
            X = X + xt
        B, T, _ = X.shape
        return jnp.mean(X.reshape(B, T, nb, ch), axis=2)


def default_fuse_mode(h: dict):
    """Measured-best per-stage MRF layout for v5e inference.

    Probe (tools/probe_fuse_modes.py, T=512, bf16): all-dense 25.1 ms,
    stage-3-only dense 17.6 ms, all-unfused 22.1 ms. The wide stages
    (256/128/64 branch channels) already fill the MXU lanes, so the dense
    fusion's ~4.7x FLOP redundancy loses there; only the narrow final stage
    profits from packing.

    A Pallas whole-stage kernel (`ops/pallas_mrf.py`, fuse mode "pallas") was
    measured too: it wins in isolation but LOSES in the full program
    (n/n/n/pallas 20.3 ms vs n/n/n/dense 17.9 ms) — its per-tap `roll`
    materialises every shifted view (~2.6 GB of on-chip shuffles per pass)
    while XLA's native conv streams taps through the MXU for free. Kept as a
    tested mode; dense stays the default (see docs/BENCH_NOTES.md).
    """
    rates = h.get("upsample_rates", [])
    if len(rates) == 4:
        return ("none", "none", "none", "dense")
    return "dense"


def normalize_fuse_modes(mode, num_stages: int):
    """Per-stage MRF mode list from a string or sequence.

    "dense"/"grouped" apply to every stage; a sequence gives each upsample
    stage its own mode, with "none" keeping the stage's 3 separate ResBlocks
    (redundancy 1; best when the branch channel count already fills the MXU
    lanes — the dense fusion computes k_max/k_j-padded, block-diagonal kernels
    = ~4.7x the useful FLOPs, which only pays off at narrow stages).
    """
    if isinstance(mode, str):
        return [mode] * num_stages
    modes = list(mode)
    if len(modes) != num_stages:
        raise ValueError(f"fuse_mode needs {num_stages} entries, got {len(modes)}")
    return modes


def fuse_mrf_params(folded_params: dict, h: dict, mode="dense") -> dict:
    """Transform folded (plain-w) Generator params into fuse_mrf=True layout.

    Kernel embedding identity: a causal conv (left pad d*(k-1), taps w[0..k))
    equals a causal conv with kernel padded to k_max by LEADING zeros (pad
    d*(k_max-1)): output[t] still sees x[t-(k-1)d .. t] through the trailing
    taps. Branch kernels are then concatenated on the output-channel axis for
    a grouped conv (one group per branch).

    `mode` may be a per-stage list (see `normalize_fuse_modes`); "none" stages
    keep their resblocks_* params untouched.
    """
    import numpy as np

    kernels = list(h["resblock_kernel_sizes"])
    dils = [tuple(d) for d in h["resblock_dilation_sizes"]]
    if str(h["resblock"]) != "1" or any(d != dils[0] for d in dils):
        raise ValueError("fuse_mrf supports resblock '1' with uniform dilations")
    k_max = max(kernels)
    nb = len(kernels)
    num_up = len(h["upsample_rates"])
    modes = normalize_fuse_modes(mode, num_up)

    out = {k: v for k, v in folded_params.items() if not k.startswith("resblocks_")}
    for i in range(num_up):
        if modes[i] == "none":
            for j in range(nb):
                name = f"resblocks_{i * nb + j}"
                out[name] = folded_params[name]
            continue
        if modes[i] in ("pallas", "pallas2"):
            from mri2speech_tpu.ops.pallas_mrf import pack_mrf_stage_params

            out[f"mrf_{i}"] = pack_mrf_stage_params(
                [folded_params[f"resblocks_{i * nb + j}"] for j in range(nb)],
                kernels,
                dils[0],
            )
            continue
        mode_i = modes[i]
        stage: dict = {}
        for u in range(len(dils[0])):
            for conv_list, conv_name in (("convs1", "conv1"), ("convs2", "conv2")):
                ws, bs = [], []
                for j, kj in enumerate(kernels):
                    p = folded_params[f"resblocks_{i * nb + j}"][f"{conv_list}_{u}"]
                    w = np.asarray(p["w"])  # (kj, ch, ch)
                    pad = k_max - w.shape[0]
                    if pad:
                        w = np.concatenate(
                            [np.zeros((pad,) + w.shape[1:], w.dtype), w], axis=0
                        )
                    ws.append(w)
                    bs.append(np.asarray(p["b"]))
                w_grouped = np.concatenate(ws, axis=2)  # (k_max, ch, nb*ch)
                if mode_i == "dense":
                    # block-diagonal dense kernel: 3x the FLOPs of the grouped
                    # form, but one fully lane-packed matmul — measured ~15%
                    # faster end-to-end than the unfused stack on v5e, while
                    # grouped convs lower 2.7x SLOWER on current XLA
                    ch = ws[0].shape[1]
                    w_dense = np.zeros(
                        (k_max, nb * ch, nb * ch), w_grouped.dtype
                    )
                    for j in range(nb):
                        w_dense[:, j * ch : (j + 1) * ch, j * ch : (j + 1) * ch] = (
                            w_grouped[:, :, j * ch : (j + 1) * ch]
                        )
                    w_out = w_dense
                else:
                    w_out = w_grouped
                stage[f"u{u}_{conv_name}"] = {
                    "w": w_out,
                    "b": np.concatenate(bs, axis=0),
                }
        out[f"mrf_{i}"] = stage
    return out


class PallasMRFStage(nn.Module):
    """Whole-stage fused MRF via the Pallas kernel (`ops/pallas_mrf.py`).

    Inference transform like FusedMRFStage; params come from
    `fuse_mrf_params(..., mode=[..,"pallas",..])` (per-shift block-diagonal
    packing). Runs the compiled kernel on TPU, interpret mode elsewhere.
    """

    channels: int
    kernels: Tuple[int, ...]
    dilation: Tuple[int, ...] = (1, 3, 5)
    variant: str = "pallas"  # "pallas" (roll-based v1) | "pallas2" (scratch-slice v2)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from mri2speech_tpu.ops.pallas_mrf import (
            mrf_stage_pallas,
            mrf_stage_pallas_v2,
        )

        nb, C, k_max = len(self.kernels), self.channels, max(self.kernels)
        packed = {}
        for u in range(len(self.dilation)):
            for c in (1, 2):
                packed[f"u{u}_c{c}_w"] = self.param(
                    f"u{u}_c{c}_w", nn.initializers.zeros, (k_max, nb * C, nb * C)
                )
                packed[f"u{u}_c{c}_b"] = self.param(
                    f"u{u}_c{c}_b", nn.initializers.zeros, (1, nb * C)
                )
        interpret = jax.default_backend() != "tpu"
        if self.variant == "pallas2":
            return mrf_stage_pallas_v2(
                x,
                packed,
                channels=C,
                kernels=tuple(self.kernels),
                dils=tuple(self.dilation),
                interpret=interpret,
            )
        X = jnp.tile(x, (1, 1, nb))
        return mrf_stage_pallas(
            X,
            packed,
            channels=C,
            kernels=tuple(self.kernels),
            dils=tuple(self.dilation),
            interpret=interpret,
        )


class Generator(nn.Module):
    """HiFi-GAN generator (`models.py:88-140`): mel (B, n_mels, T) -> wav (B, 1, 420*T).

    conv_pre (plain, right-pad 6) -> 4x [leaky -> WN ConvTranspose (rates
    10,7,3,2) -> mean of 3 MRF ResBlocks] -> leaky(0.01) -> conv_post (WN,
    right-pad 6) -> tanh.

    fuse_mrf=True (inference): the 3 MRF branches per stage run as grouped
    convs (see FusedMRFStage); convert params with `fuse_mrf_params`.
    """

    h: dict  # AttrDict-compatible config (config_custom.json schema)
    use_weight_norm: bool = True  # False after fold_weight_norm (inference)
    fuse_mrf: bool = False
    fuse_mode: Any = "dense"  # str, or per-stage tuple with "none" opt-outs
    quantize_mrf: bool = False  # int8 MRF convs (opt-in LOSSY serving mode;
    #                             measured speed/error in docs/BENCH_NOTES.md)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = self.h
        num_kernels = len(h["resblock_kernel_sizes"])
        resblock_cls = ResBlock1 if str(h["resblock"]) == "1" else ResBlock2
        fuse_modes = (
            normalize_fuse_modes(self.fuse_mode, len(h["upsample_rates"]))
            if self.fuse_mrf
            else ["none"] * len(h["upsample_rates"])
        )

        x = jnp.swapaxes(x, 1, 2)  # (B, T, n_mels) channels-last
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # conv_pre: F.pad(x,(0,6)) + Conv1d(k=7, pad=0), NO weight norm, torch
        # default init (`models.py:94,114`).
        x = Conv1d(
            h["upsample_initial_channel"], 7, padding=(0, 6),
            dtype=self.dtype, name="conv_pre",
        )(x)

        for i, (u, k) in enumerate(zip(h["upsample_rates"], h["upsample_kernel_sizes"])):
            x = leaky_relu(x, LRELU_SLOPE)
            ch = h["upsample_initial_channel"] // (2 ** (i + 1))
            x = ConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2,
                weight_norm=self.use_weight_norm, kernel_init=normal_init(0.01),
                polyphase=self.fuse_mrf,  # inference-transformed path
                dtype=self.dtype, name=f"ups_{i}",
            )(x)
            if fuse_modes[i] in ("pallas", "pallas2"):
                x = PallasMRFStage(
                    ch,
                    tuple(h["resblock_kernel_sizes"]),
                    tuple(h["resblock_dilation_sizes"][0]),
                    variant=fuse_modes[i],
                    dtype=self.dtype,
                    name=f"mrf_{i}",
                )(x)
            elif fuse_modes[i] != "none":
                x = FusedMRFStage(
                    ch,
                    max(h["resblock_kernel_sizes"]),
                    tuple(h["resblock_dilation_sizes"][0]),
                    num_branches=num_kernels,
                    mode=fuse_modes[i],
                    quantize=self.quantize_mrf,
                    dtype=self.dtype,
                    name=f"mrf_{i}",
                )(x)
            else:
                xs = None
                for j, (rk, rd) in enumerate(
                    zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])
                ):
                    r = resblock_cls(
                        ch, rk, tuple(rd), use_weight_norm=self.use_weight_norm,
                        quantize=self.quantize_mrf,
                        dtype=self.dtype, name=f"resblocks_{i * num_kernels + j}",
                    )(x)
                    xs = r if xs is None else xs + r
                x = xs / num_kernels

        x = leaky_relu(x, 0.01)  # fork quirk: default slope here (`models.py:126`)
        x = Conv1d(
            1, 7, padding=(0, 6), weight_norm=self.use_weight_norm,
            kernel_init=normal_init(0.01), dtype=self.dtype, name="conv_post",
        )(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return jnp.swapaxes(x, 1, 2)  # (B, 1, T*420)


def generator_receptive_field(h: dict):
    """Exact dependency cone of the Generator, in mel frames.

    Returns ``(left, right)`` such that audio sample ``t`` depends ONLY on mel
    frames ``[t // hop - left, t // hop + right]`` (hop = prod(upsample_rates)).
    Computed by propagating an output-sample interval backward through every
    layer with exact integer index arithmetic:

    * causal conv (left-pad ``d*(k-1)``): ``in = [lo - d*(k-1), hi]``
    * right-pad conv_pre/conv_post (pad ``(0, k-1)``): ``in = [lo, hi + k - 1]``
    * ConvTranspose (torch semantics, stride ``u``, pad ``p``):
      ``in = [ceil((lo + p - k + 1)/u), floor((hi + p)/u)]``

    This is what makes the ONLINE windowed generator (`infer/online.py`) exact:
    any audio slice whose cone lies inside a window of real mel context is
    bit-comparable to the full-sequence run.
    """
    rb_kernels = tuple(h["resblock_kernel_sizes"])
    rb_dils = tuple(tuple(d) for d in h["resblock_dilation_sizes"])
    two_convs_per_unit = str(h["resblock"]) == "1"  # ResBlock1: dconv + conv(d=1)
    hop = 1
    for u in h["upsample_rates"]:
        hop *= u

    N = 1 << 20  # far from either edge
    lo, hi = N * hop, (N + 1) * hop - 1

    def mrf(lo, hi):
        # parallel branches (averaged): union of each branch's serial cone;
        # causal convs only extend `lo` downward, `hi` is unchanged.
        best_lo = lo
        for k, dils in zip(rb_kernels, rb_dils):
            unit_tail = (k - 1) if two_convs_per_unit else 0
            ext = sum(d * (k - 1) + unit_tail for d in dils)
            best_lo = min(best_lo, lo - ext)
        return best_lo, hi

    # walk output -> input: conv_post, then stages in reverse, then conv_pre
    hi += 6  # conv_post k=7, pad (0, 6)
    for u, k in zip(
        reversed(h["upsample_rates"]), reversed(h["upsample_kernel_sizes"])
    ):
        lo, hi = mrf(lo, hi)
        p = (k - u) // 2
        lo = -((-(lo + p - k + 1)) // u)  # ceil div
        hi = (hi + p) // u
    hi += 6  # conv_pre k=7, pad (0, 6)
    return N - lo, hi - N


class DiscriminatorP(nn.Module):
    """Period discriminator (`models.py:143-176`).

    Input (B, 1, T) audio; reflect-pad T to a multiple of `period`, fold into
    (B, T/p, p) 2D map, stack of (5,1)-kernel stride-(3,1) WN Conv2d with
    pad (4, 0) (the fork's get_padding(5,1)=4).
    """

    period: int
    use_spectral_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        fmap: List[Array] = []
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        # (B, 1, T) -> (B, T/p, p, 1) channels-last image
        x = x.reshape(b, c, t // self.period, self.period)
        x = jnp.transpose(x, (0, 2, 3, 1))

        norm = dict(spectral_norm=True) if self.use_spectral_norm else dict(weight_norm=True)
        channels = [32, 128, 512, 1024]
        for i, ch in enumerate(channels):
            # first conv stays fp32 under bf16: a bf16 tensor with the
            # degenerate C=1 channel dim trips an XLA fusion cost-model
            # CHECK ("TransformWindow: Loop will not make progress",
            # fusion_util.cc:3726) when the step is chained in a fori carry;
            # the C_in=1 conv is negligible FLOPs anyway (docs/BENCH_NOTES.md)
            layer_dtype = None if i == 0 else self.dtype
            x = Conv2d(
                ch, (5, 1), strides=(3, 1), padding=(4, 0),
                dtype=layer_dtype, name=f"convs_{i}", **norm,
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            if i == 0 and self.dtype is not None:
                x = x.astype(self.dtype)
            fmap.append(x)
        x = Conv2d(
            1024, (5, 1), strides=(1, 1), padding=(2, 0),
            dtype=self.dtype, name="convs_4", **norm,
        )(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2d(
            1, (3, 1), strides=(1, 1), padding=(1, 0),
            dtype=self.dtype, name="conv_post", **norm,
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """5 period discriminators, periods (2,3,5,7,11) (`models.py:179-207`).

    ``batch_concat=True`` feeds ``concat([y, y_hat])`` through each sub-D as
    ONE batch-2B conv chain and splits the outputs — bit-exact per sample
    (weight-norm convs are stateless and convs never mix the batch axis), and
    measurably faster on TPU where the thin (5,1) conv layers underfill the
    MXU at batch B (tools/probe_gan_step.py). Param tree is identical either
    way.
    """

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    dtype: Optional[jnp.dtype] = None
    batch_concat: bool = False

    @nn.compact
    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        min_len = min(y.shape[-1], y_hat.shape[-1])
        y = y[..., :min_len]
        y_hat = y_hat[..., :min_len]
        B = y.shape[0]
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, dtype=self.dtype, name=f"discriminators_{i}")
            if self.batch_concat:
                rg, frg = d(jnp.concatenate([y, y_hat], axis=0))
                r, g = rg[:B], rg[B:]
                fr = [f[:B] for f in frg]
                fg = [f[B:] for f in frg]
            else:
                r, fr = d(y)
                g, fg = d(y_hat)
            y_d_rs.append(r)
            fmap_rs.append(fr)
            y_d_gs.append(g)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D convs, kernel 41 (`models.py:210-235`)."""

    use_spectral_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        # x: (B, 1, T) -> channels-last
        b = x.shape[0]
        x = jnp.swapaxes(x, 1, 2)
        norm = dict(spectral_norm=True) if self.use_spectral_norm else dict(weight_norm=True)
        spec = [
            # (features, kernel, stride, groups, padding)
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        fmap: List[Array] = []
        for i, (f, k, s, g, p) in enumerate(spec):
            # first conv fp32 under bf16 — see DiscriminatorP: a degenerate
            # C=1 bf16 input tensor SIGABRTs XLA's fusion cost model when the
            # step runs inside a fori carry
            layer_dtype = None if i == 0 else self.dtype
            x = Conv1d(
                f, k, stride=s, groups=g, padding=p,
                dtype=layer_dtype, name=f"convs_{i}", **norm,
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            if i == 0 and self.dtype is not None:
                x = x.astype(self.dtype)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, dtype=self.dtype, name="conv_post", **norm)(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scale discriminators on x1/x2/x4 avg-pooled audio (`models.py:238-271`).

    First sub-discriminator uses spectral norm, the rest weight norm.

    ``batch_concat=True`` runs each sub-D once on ``concat([y, y_hat])``
    (batch 2B). Weight-norm sub-Ds are bit-exact per sample; the spectral-norm
    sub-D advances its power iteration ONCE per apply instead of twice (both
    halves see the same normalised weight) — the same immaterial-deviation
    class as the trainer's once-per-step iteration (docs/parity_notes.md).
    """

    dtype: Optional[jnp.dtype] = None
    batch_concat: bool = False
    # scale count (reference fixes 3; lower values keep the structure —
    # spectral-norm first sub-D, pooling between scales — with a smaller
    # graph, used by ablations and the multichip dryrun's tiny wiring leg)
    num_scales: int = 3

    @nn.compact
    def __call__(self, y: Array, y_hat: Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        B = y.shape[0]
        for i in range(self.num_scales):
            if i != 0:
                # AvgPool1d(4, 2, padding=2) on (B, 1, T)
                y = jnp.swapaxes(
                    avg_pool1d_torch(jnp.swapaxes(y, 1, 2), 4, 2, 2), 1, 2
                )
                y_hat = jnp.swapaxes(
                    avg_pool1d_torch(jnp.swapaxes(y_hat, 1, 2), 4, 2, 2), 1, 2
                )
            min_len = min(y.shape[-1], y_hat.shape[-1])
            y = y[..., :min_len]
            y_hat = y_hat[..., :min_len]
            d = DiscriminatorS(
                use_spectral_norm=(i == 0), dtype=self.dtype, name=f"discriminators_{i}"
            )
            if self.batch_concat:
                rg, frg = d(jnp.concatenate([y, y_hat], axis=0))
                r, g = rg[:B], rg[B:]
                fr = [f[:B] for f in frg]
                fg = [f[B:] for f in frg]
            else:
                r, fr = d(y)
                g, fg = d(y_hat)
            y_d_rs.append(r)
            fmap_rs.append(fr)
            y_d_gs.append(g)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
