"""Pallas LSTM recurrence kernel vs the lax.scan implementation (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.lstm import lstm_direction
from mri2speech_tpu.ops.pallas_lstm import lstm_direction_pallas


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_lstm_matches_scan(rng, reverse):
    B, T, C, H = 2, 6, 8, 16
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w_ih = (rng.standard_normal((C, 4 * H)) * 0.2).astype(np.float32)
    w_hh = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    b = (rng.standard_normal(4 * H) * 0.1).astype(np.float32)

    ref = np.asarray(lstm_direction(jnp.asarray(x), w_ih, w_hh, b, reverse=reverse))
    out = np.asarray(
        lstm_direction_pallas(
            jnp.asarray(x), w_ih, w_hh, b, reverse=reverse, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_pallas_lstm_masked_matches_scan(rng):
    B, T, C, H = 1, 8, 4, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w_ih = (rng.standard_normal((C, 4 * H)) * 0.2).astype(np.float32)
    w_hh = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    b = np.zeros(4 * H, dtype=np.float32)
    mask = np.ones((B, T), dtype=np.float32)
    mask[:, 5:] = 0.0  # trailing padding

    for reverse in (False, True):
        ref = np.asarray(
            lstm_direction(
                jnp.asarray(x), w_ih, w_hh, b, reverse=reverse, mask=jnp.asarray(mask)
            )
        )
        out = np.asarray(
            lstm_direction_pallas(
                jnp.asarray(x), w_ih, w_hh, b, reverse=reverse,
                mask=jnp.asarray(mask), interpret=True,
            )
        )
        # only REAL frames are contractually identical (the pallas path encodes
        # the mask as frozen gate pre-activations; padded outputs differ from
        # the scan's held carry and are discarded by all callers)
        np.testing.assert_allclose(out[:, :5], ref[:, :5], atol=1e-5, rtol=1e-4)


def test_fused_bilstm_matches_scan(rng):
    from mri2speech_tpu.ops.pallas_lstm import bilstm_sum_pallas

    B, T, C, H = 2, 7, 6, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    params = {}
    for d in ("fwd", "bwd"):
        params[f"w_ih_{d}"] = (rng.standard_normal((C, 4 * H)) * 0.2).astype(np.float32)
        params[f"w_hh_{d}"] = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
        params[f"b_{d}"] = (rng.standard_normal(4 * H) * 0.1).astype(np.float32)

    ref = np.asarray(
        lstm_direction(jnp.asarray(x), params["w_ih_fwd"], params["w_hh_fwd"],
                       params["b_fwd"], reverse=False)
        + lstm_direction(jnp.asarray(x), params["w_ih_bwd"], params["w_hh_bwd"],
                         params["b_bwd"], reverse=True)
    )
    out = np.asarray(
        bilstm_sum_pallas(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in params.items()},
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

    # masked: real frames identical
    mask = np.ones((B, T), np.float32)
    mask[:, 5:] = 0.0
    ref_m = np.asarray(
        lstm_direction(jnp.asarray(x), params["w_ih_fwd"], params["w_hh_fwd"],
                       params["b_fwd"], reverse=False, mask=jnp.asarray(mask))
        + lstm_direction(jnp.asarray(x), params["w_ih_bwd"], params["w_hh_bwd"],
                         params["b_bwd"], reverse=True, mask=jnp.asarray(mask))
    )
    out_m = np.asarray(
        bilstm_sum_pallas(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in params.items()},
            mask=jnp.asarray(mask), interpret=True,
        )
    )
    np.testing.assert_allclose(out_m[:, :5], ref_m[:, :5], atol=1e-5, rtol=1e-4)


def test_chunked_bilstm_matches_unchunked_multichunk(rng):
    """Chunked grid (inner fori_loop over time) == per-step grid, across
    multiple chunks with a ragged tail and a trailing-padded mask."""
    from mri2speech_tpu.ops.pallas_lstm import (
        bilstm_recurrence_pallas,
        bilstm_recurrence_pallas_chunked,
    )

    T, B, H = 70, 2, 8
    xg_f = (rng.standard_normal((T, B, 4 * H)) * 0.4).astype(np.float32)
    xg_b = (rng.standard_normal((T, B, 4 * H)) * 0.4).astype(np.float32)
    whh_f = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    whh_b = (rng.standard_normal((H, 4 * H)) * 0.2).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[60:] = 0.0

    rf, rb = bilstm_recurrence_pallas(
        jnp.asarray(xg_f), jnp.asarray(xg_b), jnp.asarray(whh_f),
        jnp.asarray(whh_b), jnp.asarray(mask), interpret=True,
    )
    cf, cb = bilstm_recurrence_pallas_chunked(
        jnp.asarray(xg_f), jnp.asarray(xg_b), jnp.asarray(whh_f),
        jnp.asarray(whh_b), jnp.asarray(mask), chunk=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(cf)[:60], np.asarray(rf)[:60], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb)[:60], np.asarray(rb)[:60], atol=1e-6)


def test_bilstm_module_pallas_auto_interprets_off_tpu(rng):
    """BiLSTMSumMerge(impl="pallas") must be loadable on ANY backend: the
    module auto-selects interpret mode off-TPU (same policy as _FusedMBConv
    and PallasMRFStage) instead of failing at Mosaic lowering — a serving
    config that pins the pallas kernel still runs on a CPU host."""
    import jax

    from mri2speech_tpu.models.lstm import BiLSTMSumMerge

    B, T, C, H = 2, 5, 6, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    scan_mod = BiLSTMSumMerge(hidden_size=H, impl="scan")
    variables = scan_mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(scan_mod.apply(variables, jnp.asarray(x)))
    out = np.asarray(
        BiLSTMSumMerge(hidden_size=H, impl="pallas").apply(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_lstm_fused_bias_init_matches_torch_variance():
    """The fused bias stores b_ih + b_hh; from-scratch init must SUM two
    independent U(-1/sqrt(H), 1/sqrt(H)) draws like torch's effective bias —
    variance 2b^2/3, not the single-draw b^2/3."""
    import jax

    from mri2speech_tpu.models.lstm import BiLSTMSumMerge

    H = 256
    mod = BiLSTMSumMerge(hidden_size=H)
    variables = mod.init(jax.random.PRNGKey(7), jnp.zeros((1, 2, 16)))
    bound = 1.0 / np.sqrt(H)
    expected = 2.0 * bound**2 / 3.0
    b = np.concatenate([
        np.asarray(variables["params"]["b_fwd"]),
        np.asarray(variables["params"]["b_bwd"]),
    ])
    assert b.size == 8 * H  # 2048 samples: var estimate within ~10%
    assert 0.75 * expected < b.var() < 1.25 * expected
    # weights keep the single-draw torch init
    w = np.asarray(variables["params"]["w_hh_fwd"])
    assert 0.85 * bound**2 / 3.0 < w.var() < 1.15 * bound**2 / 3.0
