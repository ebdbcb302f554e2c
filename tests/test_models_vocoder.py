"""Vocoder parity tests.

Layer-level semantics are validated against torch ops directly (Conv1d /
ConvTranspose1d / AvgPool1d with the fork's padding rules), the causal-conv
equivalence of the fork's pad-then-trim ResBlock is checked explicitly, and the
full generator is checked for its length invariant (out = 420 * T).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.models import layers as L
from mri2speech_tpu.models.vocoder import Generator, MultiPeriodDiscriminator, MultiScaleDiscriminator


def _to_jax_conv_w(tw):  # torch (out, in, k) -> ours (k, in, out)
    return jnp.asarray(tw.detach().numpy().transpose(2, 1, 0))


def _to_jax_convT_w(tw):  # torch (in, out, k) -> ours (k, in, out)
    return jnp.asarray(tw.detach().numpy().transpose(2, 0, 1))


def test_causal_conv_equals_fork_pad_then_trim(rng):
    """Our left-pad causal conv == torch conv with pad=k*d-d then tail-trim.

    This is the fork's ResBlock semantics (`models.py:38-48` with
    get_padding(k,d)=k*d-d from `utils.py:34-35`).
    """
    B, C, T, k, d = 2, 8, 50, 3, 5
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    conv = torch.nn.Conv1d(C, C, k, dilation=d, padding=k * d - d)
    with torch.no_grad():
        ref_full = conv(torch.from_numpy(x))
    ref = ref_full[:, :, :T].numpy()  # trim-to-min as the fork does

    m = L.Conv1d(C, k, dilation=d, padding=(d * (k - 1), 0))
    params = {
        "params": {
            "w": _to_jax_conv_w(conv.weight),
            "b": jnp.asarray(conv.bias.detach().numpy()),
        }
    }
    ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    ours = np.asarray(ours).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_right_pad_conv_matches_torch_conv_pre(rng):
    """conv_pre semantics: F.pad(x,(0,6)) + Conv1d(k=7, pad=0) (`models.py:94,114`)."""
    B, Cin, Cout, T = 2, 64, 16, 30
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    conv = torch.nn.Conv1d(Cin, Cout, 7, padding=0)
    with torch.no_grad():
        ref = conv(F.pad(torch.from_numpy(x), (0, 6))).numpy()

    m = L.Conv1d(Cout, 7, padding=(0, 6))
    params = {"params": {"w": _to_jax_conv_w(conv.weight), "b": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    assert ours.shape == ref.shape == (B, Cout, T)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("k,u", [(20, 10), (15, 7), (7, 3), (4, 2)])
def test_conv_transpose_matches_torch(rng, k, u):
    B, Cin, Cout, T = 2, 6, 4, 12
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    conv = torch.nn.ConvTranspose1d(Cin, Cout, k, u, padding=(k - u) // 2)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()

    m = L.ConvTranspose1d(Cout, k, stride=u, padding=(k - u) // 2, weight_norm=False)
    params = {"params": {"w": _to_jax_convT_w(conv.weight), "b": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    assert ours.shape == ref.shape == (B, Cout, T * u)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_weight_norm_matches_torch(rng):
    B, C, T, k = 2, 8, 20, 3
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(C, C, k, padding=1))
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()

    m = L.Conv1d(C, k, padding=1, weight_norm=True)
    v = _to_jax_conv_w(conv.weight_v)
    g = jnp.asarray(conv.weight_g.detach().numpy().transpose(2, 1, 0))  # (1,1,out)
    params = {"params": {"v": v, "g": g, "b": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    # fold_weight_norm gives the same result with a plain-w module
    folded = L.fold_weight_norm(params["params"])
    assert set(folded.keys()) == {"w", "b"}
    m2 = L.Conv1d(C, k, padding=1, weight_norm=False)
    ours2 = np.asarray(m2.apply({"params": folded}, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(ours2, ref, atol=2e-5, rtol=1e-4)


def test_grouped_conv_matches_torch(rng):
    B, Cin, Cout, T = 2, 16, 32, 40
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    conv = torch.nn.Conv1d(Cin, Cout, 41, stride=2, groups=4, padding=20)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    m = L.Conv1d(Cout, 41, stride=2, groups=4, padding=20)
    params = {"params": {"w": _to_jax_conv_w(conv.weight), "b": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 1, 101)).astype(np.float32)
    ref = torch.nn.AvgPool1d(4, 2, padding=2)(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        L.avg_pool1d_torch(jnp.asarray(x.transpose(0, 2, 1)), 4, 2, 2)
    ).transpose(0, 2, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Full models: shape/length invariants
# ---------------------------------------------------------------------------

def _small_config():
    return default_vocoder_config(
        upsample_initial_channel=32,
        num_mels=64,
    )


def test_generator_length_invariant():
    h = _small_config()
    g = Generator(h=dict(h))
    x = jnp.zeros((1, 64, 7))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (1, 1, 7 * 420)  # one hop of audio per mel frame
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh output


def test_generator_fold_weight_norm_inference_identical():
    h = _small_config()
    g = Generator(h=dict(h))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 5)), dtype=jnp.float32)
    params = g.init(jax.random.PRNGKey(1), x)
    y1 = np.asarray(g.apply(params, x))
    folded = {"params": L.fold_weight_norm(params["params"])}
    g_folded = Generator(h=dict(h), use_weight_norm=False)
    y2 = np.asarray(g_folded.apply(folded, x))
    np.testing.assert_allclose(y1, y2, atol=1e-5, rtol=1e-4)


def test_mpd_msd_shapes(rng):
    y = jnp.asarray(rng.standard_normal((2, 1, 8400)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 1, 8400)).astype(np.float32))

    mpd = MultiPeriodDiscriminator()
    vars_ = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, frs, fgs = mpd.apply(vars_, y, y_hat)
    assert len(rs) == len(gs) == 5
    assert all(len(f) == 6 for f in frs)

    msd = MultiScaleDiscriminator()
    vars_ = msd.init(jax.random.PRNGKey(0), y, y_hat)
    out = msd.apply(vars_, y, y_hat, mutable=["norm_stats"])
    (rs, gs, frs, fgs), new_state = out
    assert len(rs) == 3
    assert all(len(f) == 8 for f in frs)
    assert "norm_stats" in new_state  # spectral norm power-iteration state


@pytest.mark.parametrize(
    "mode",
    [
        "dense",
        "grouped",
        ("none", "dense", "none", "dense"),
        ("none",) * 4,
        ("none", "none", "none", "pallas"),  # interpret-mode kernel on CPU
    ],
)
def test_fused_mrf_matches_unfused(mode):
    """fuse_mrf transforms are output-identical to the 3-branch MRF."""
    from mri2speech_tpu.models.vocoder import fuse_mrf_params

    h = _small_config()
    g = Generator(h=dict(h))
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 64, 6)), jnp.float32)
    params = g.init(jax.random.PRNGKey(7), x)["params"]
    y_ref = np.asarray(g.apply({"params": params}, x))

    folded = L.fold_weight_norm(jax.device_get(params))
    fused = fuse_mrf_params(folded, dict(h), mode=mode)
    g_fused = Generator(h=dict(h), use_weight_norm=False, fuse_mrf=True, fuse_mode=mode)
    y_fused = np.asarray(g_fused.apply({"params": fused}, x))
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("k,u", [(20, 10), (15, 7), (7, 3), (4, 2)])
def test_polyphase_conv_transpose_matches_module(rng, k, u):
    """Polyphase decomposition == the lhs-dilated ConvTranspose (and torch)."""
    B, Cin, Cout, T = 2, 6, 4, 12
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = (rng.standard_normal((k, Cin, Cout)) * 0.3).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)

    m = L.ConvTranspose1d(Cout, k, stride=u, padding=(k - u) // 2, weight_norm=False)
    ref = np.asarray(m.apply({"params": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
                             jnp.asarray(x)))
    out = np.asarray(
        L.conv_transpose_polyphase(
            jnp.asarray(x), jnp.asarray(w), u, (k - u) // 2, bias=jnp.asarray(b)
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_default_fuse_mode_and_normalization():
    """Pin the measured-best serving layout and the mode-list contract."""
    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.models.vocoder import default_fuse_mode, normalize_fuse_modes

    h = dict(default_vocoder_config())
    assert default_fuse_mode(h) == ("none", "none", "none", "dense")

    # non-4-stage configs fall back to uniform dense
    h2 = dict(h, upsample_rates=[8, 8, 4])
    assert default_fuse_mode(h2) == "dense"

    assert normalize_fuse_modes("dense", 4) == ["dense"] * 4
    assert normalize_fuse_modes(("none", "pallas", "pallas2", "dense"), 4) == [
        "none", "pallas", "pallas2", "dense",
    ]
    with pytest.raises(ValueError):
        normalize_fuse_modes(("dense",), 4)


def test_discriminator_batch_concat_exact(rng):
    """batch_concat runs each sub-D once on concat([y, y_hat]) — outputs and
    feature maps must match the separate-application path exactly (weight-norm
    sub-Ds; the MSD's spectral-norm sub-D matches because both paths read the
    same persisted `u` within one apply)."""
    y = jnp.asarray(rng.standard_normal((2, 1, 660)).astype(np.float32) * 0.1)
    yh = jnp.asarray(rng.standard_normal((2, 1, 660)).astype(np.float32) * 0.1)

    mpd = MultiPeriodDiscriminator()
    mpd_cat = MultiPeriodDiscriminator(batch_concat=True)
    p = mpd.init(jax.random.PRNGKey(0), y, yh)["params"]
    rs0, gs0, fr0, fg0 = mpd.apply({"params": p}, y, yh)
    rs1, gs1, fr1, fg1 = mpd_cat.apply({"params": p}, y, yh)
    for a, b in zip(rs0 + gs0, rs1 + gs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for fa, fb in zip(fr0 + fg0, fr1 + fg1):
        for a, b in zip(fa, fb):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    msd = MultiScaleDiscriminator()
    msd_cat = MultiScaleDiscriminator(batch_concat=True)
    v = msd.init(jax.random.PRNGKey(1), y, yh)
    # freeze norm_stats (no mutable): both paths normalise with the same u
    rs0, gs0, fr0, fg0 = msd.apply(v, y, yh)
    rs1, gs1, fr1, fg1 = msd_cat.apply(v, y, yh)
    for a, b in zip(rs0 + gs0, rs1 + gs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
