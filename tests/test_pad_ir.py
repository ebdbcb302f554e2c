"""pad_ir (exact 128-lane zero-padding of ir stages) vs plain inference.

The transform claims OUTPUT-INVARIANCE: padded channels carry zeros
end-to-end (zero-padded kernels, folded BN with mul=0/add=0 in the pad
region, SE gates multiplying zero activations). These tests pin that claim
on a small spec, on the full B2 spec, and through the AcousticModel
(incl. the non-padded 56-channel er->ir entry and the final slice back to
the canonical 208 features). Motivating measurement: tools/probe_ir_pad.py
(128-multiple channels run the serving CNN at 63 vs 49.5 TF/s).
"""
import numpy as np

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import (
    EFFNETV2_B2_SPEC,
    EffNetV2Features,
    StageSpec,
    _pad128,
)


def _randomize_bn(rng, variables):
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.3 + 1.0, a.dtype)
        if a.ndim
        else a,
        variables.get("batch_stats", {}),
    )
    return {"params": variables["params"], "batch_stats": bs}


def test_pad128():
    assert [_pad128(n) for n in (1, 104, 120, 128, 208, 416, 624, 720, 1248)] == [
        128, 128, 128, 128, 256, 512, 640, 768, 1280,
    ]


def test_pad_ir_small_spec_parity():
    """Odd channel counts incl. a stride-2 entry and a channel-change block."""
    spec = (
        StageSpec("cn", 3, 1, 1, 8, 1),
        StageSpec("ir", 3, 2, 4, 20, 2, 0.25),   # b0: stride-2, 8 -> 20
        StageSpec("ir", 3, 1, 6, 24, 2, 0.25),   # b0: 20 -> 24 (no residual)
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)) * 0.5, jnp.float32)

    plain = EffNetV2Features(spec=spec, stem_channels=8)
    variables = _randomize_bn(rng, plain.init(jax.random.PRNGKey(0), x, train=False))
    y_plain = plain.apply(variables, x, train=False)

    padded = EffNetV2Features(spec=spec, stem_channels=8, pad_ir=True)
    y_pad = padded.apply(variables, x, train=False)  # same param tree

    assert y_pad.shape == y_plain.shape  # final slice back to canonical
    tol = 1e-5 * float(np.abs(np.asarray(y_plain)).max())
    np.testing.assert_allclose(
        np.asarray(y_pad), np.asarray(y_plain), atol=max(tol, 1e-5), rtol=0
    )


def test_pad_ir_unpadded_input_residual_parity():
    """A stride-1 channel-preserving ir block RIGHT AFTER an er stage gets an
    UNPADDED input; the residual must still be applied (the input is
    zero-padded to the padded output width). Regression for a silent
    residual drop on custom specs (B2 never hits this: every stage-first ir
    block changes channels or strides)."""
    spec = (
        StageSpec("er", 3, 2, 4, 24, 1),
        StageSpec("ir", 3, 1, 4, 24, 2, 0.25),  # b0: 24 -> 24, stride 1
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)) * 0.5, jnp.float32)

    plain = EffNetV2Features(spec=spec, stem_channels=8)
    variables = _randomize_bn(rng, plain.init(jax.random.PRNGKey(0), x, train=False))
    y_plain = plain.apply(variables, x, train=False)

    padded = EffNetV2Features(spec=spec, stem_channels=8, pad_ir=True)
    y_pad = padded.apply(variables, x, train=False)

    tol = 1e-5 * float(np.abs(np.asarray(y_plain)).max())
    np.testing.assert_allclose(
        np.asarray(y_pad), np.asarray(y_plain), atol=max(tol, 1e-5), rtol=0
    )


def test_pad_ir_full_b2_parity_through_acoustic_model():
    """Full B2 spec at a reduced frame size, through AcousticModel.__call__."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 1, 64, 64)) * 0.5, jnp.float32)

    plain = AcousticModel(n_mels=8, rnn_hidden=16)
    variables = _randomize_bn(rng, plain.init(jax.random.PRNGKey(0), x, train=False))
    y_plain = plain.apply(variables, x, train=False)

    padded = AcousticModel(n_mels=8, rnn_hidden=16, pad_ir=True)
    y_pad = padded.apply(variables, x, train=False)

    tol = 1e-4 * float(np.abs(np.asarray(y_plain)).max())
    np.testing.assert_allclose(
        np.asarray(y_pad), np.asarray(y_plain), atol=max(tol, 1e-4), rtol=0
    )


def test_pad_ir_param_tree_identical():
    """pad_ir declares the same param/batch_stats tree — checkpoints load."""
    spec = EFFNETV2_B2_SPEC
    x = jnp.zeros((1, 64, 64, 3))
    v_plain = EffNetV2Features(spec=spec).init(jax.random.PRNGKey(0), x, train=False)
    v_pad = EffNetV2Features(spec=spec, pad_ir=True).init(
        jax.random.PRNGKey(0), x, train=False
    )
    tp = jax.tree_util.tree_structure(v_plain)
    ts = jax.tree_util.tree_structure(v_pad)
    assert tp == ts
    shapes_plain = jax.tree.map(lambda a: a.shape, v_plain)
    shapes_pad = jax.tree.map(lambda a: a.shape, v_pad)
    assert shapes_plain == shapes_pad
