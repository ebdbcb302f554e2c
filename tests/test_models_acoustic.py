"""Acoustic model tests: BiLSTM parity vs torch, encoder shapes, full forward."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import (
    EFFNETV2_B2_FEATURE_DIM,
    EffNetV2Features,
)
from mri2speech_tpu.models.lstm import BiLSTMSumMerge, lstm_direction


def test_lstm_direction_matches_torch(rng):
    B, T, C, H = 2, 9, 5, 7
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lstm = torch.nn.LSTM(C, H, num_layers=1, batch_first=True, bidirectional=False)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    w_ih = jnp.asarray(lstm.weight_ih_l0.detach().numpy().T)  # (C, 4H)
    w_hh = jnp.asarray(lstm.weight_hh_l0.detach().numpy().T)  # (H, 4H)
    b = jnp.asarray((lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy())
    ours = np.asarray(lstm_direction(jnp.asarray(x), w_ih, w_hh, b))
    # XLA and torch round transcendentals (sigmoid/tanh) differently; drift
    # compounds through the recurrence, so tolerance is loose but still far
    # below any structural error (wrong gate order ~ O(1e-1)).
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-3, rtol=1e-3)


def test_bilstm_sum_merge_matches_torch(rng):
    """Bidirectional + sum merge == torch BiLSTM chunk(2).sum (`mri_acoustic_model.py:67-72`)."""
    B, T, C, H = 2, 6, 4, 5
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lstm = torch.nn.LSTM(C, H, num_layers=1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        y, _ = lstm(torch.from_numpy(x))
    y_fwd, y_bwd = y.chunk(2, dim=-1)
    ref = (y_fwd + y_bwd).numpy()

    params = {
        "params": {
            "w_ih_fwd": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
            "w_hh_fwd": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
            "b_fwd": jnp.asarray((lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy()),
            "w_ih_bwd": jnp.asarray(lstm.weight_ih_l0_reverse.detach().numpy().T),
            "w_hh_bwd": jnp.asarray(lstm.weight_hh_l0_reverse.detach().numpy().T),
            "b_bwd": jnp.asarray(
                (lstm.bias_ih_l0_reverse + lstm.bias_hh_l0_reverse).detach().numpy()
            ),
        }
    }
    ours = np.asarray(BiLSTMSumMerge(H).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_effnetv2_feature_shapes():
    m = EffNetV2Features()
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == (2, 2, 2, EFFNETV2_B2_FEATURE_DIM)  # stride 32, 208 channels

    # training mode updates running batch stats
    y2, updates = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y2.shape == y.shape
    assert "batch_stats" in updates


def test_effnetv2_param_count_in_b2_range():
    """b2 features (no classifier head) should land near timm's ~8.7M params."""
    m = EffNetV2Features()
    vars_ = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vars_["params"]))
    assert 7_000_000 < n < 10_500_000, n


def test_acoustic_model_forward_shapes():
    m = AcousticModel()
    x = jnp.zeros((2, 4, 1, 64, 64))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == (2, 4, 64)
    assert y.dtype == jnp.float32

    # 4-D input auto-expands to channel dim (`mri_acoustic_model.py:116-117`)
    y2 = m.apply(vars_, jnp.zeros((2, 4, 64, 64)), train=False)
    assert y2.shape == (2, 4, 64)

    # train mode: dropout rng + mutable batch stats
    y3, _ = m.apply(
        vars_, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert y3.shape == (2, 4, 64)


def test_forward_with_features_consistency():
    m = AcousticModel()
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 3, 1, 64, 64)), dtype=jnp.float32
    )
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    pred, feats = m.apply(vars_, x, train=False, method=AcousticModel.forward_with_features)
    assert feats.shape == (3, 2, 2, EFFNETV2_B2_FEATURE_DIM)
    plain = m.apply(vars_, x, train=False)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(plain), atol=1e-5)


def test_stem_s2d_exact_parity():
    """Space-to-depth stem (skip-broadcast + folded kernel) == plain stem.

    Exact arithmetic rearrangement of `mri_acoustic_model.py:41-44` (1->3
    broadcast) + the timm-layout 3x3/s2 stem; same param tree either way.
    """
    from mri2speech_tpu.models.effnetv2 import StageSpec

    spec = (
        StageSpec("cn", 3, 1, 1, 8, 1),
        StageSpec("er", 3, 2, 2, 16, 1),
    )
    kw = dict(n_mels=8, rnn_hidden=16, dropout=0.0, cnn_spec=spec, cnn_stem=8)
    m_plain = AcousticModel(**kw)
    m_s2d = AcousticModel(stem_s2d=True, **kw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 1, 32, 32)), jnp.float32)
    variables = m_plain.init(jax.random.PRNGKey(0), x, train=False)

    y_plain = m_plain.apply(variables, x, train=False)
    y_s2d = m_s2d.apply(variables, x, train=False)  # same tree, same shapes
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_plain), rtol=1e-5, atol=1e-5
    )

    # odd H/W falls back to the plain path (broadcast + 3x3/s2) bit-for-bit
    x_odd = jnp.asarray(rng.random((1, 2, 1, 31, 31)), jnp.float32)
    v_odd = m_plain.init(jax.random.PRNGKey(1), x_odd, train=False)
    np.testing.assert_array_equal(
        np.asarray(m_s2d.apply(v_odd, x_odd, train=False)),
        np.asarray(m_plain.apply(v_odd, x_odd, train=False)),
    )
