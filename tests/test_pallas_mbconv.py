"""Fused Pallas MBConv block vs the InvertedResidual reference (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.effnetv2 import (
    EFFNETV2_B2_SPEC,
    EffNetV2Features,
    InvertedResidual,
    StageSpec,
    _FusedMBConv,
)


@pytest.mark.parametrize("C,expand,hw,B", [(16, 4, 8, 3), (24, 6, 16, 2)])
def test_fused_mbconv_matches_inverted_residual(C, expand, hw, B):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, hw, hw, C)) * 0.5, jnp.float32)

    ref_mod = InvertedResidual(C, 3, 1, expand, 0.25)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, False)
    # non-trivial BN stats so the inference folding is actually exercised
    bs = jax.tree.map(lambda a: a, variables.get("batch_stats", {}))
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.3 + 1.0, a.dtype)
        if a.ndim
        else a,
        bs,
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    ref = ref_mod.apply(variables, x, False)

    fused = _FusedMBConv(C, expand, 0.25)
    out = fused.apply(variables, x, False)

    assert out.shape == ref.shape
    tol = 3e-3 * float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=max(tol, 2e-3), rtol=0
    )


def test_fuse_ir_full_features_parity():
    """fuse_ir=True on a small spec with an ir stage == plain inference."""
    spec = (
        StageSpec("cn", 3, 1, 1, 8, 1),
        StageSpec("ir", 3, 2, 4, 16, 2, 0.25),  # b0 stride-2 (XLA), b1 fused
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)) * 0.5, jnp.float32)

    plain = EffNetV2Features(spec=spec, stem_channels=8)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    y_plain = plain.apply(variables, x, train=False)

    fused = EffNetV2Features(spec=spec, stem_channels=8, fuse_ir=True)
    y_fused = fused.apply(variables, x, train=False)  # same param tree

    tol = 3e-3 * float(np.abs(np.asarray(y_plain)).max())
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=max(tol, 2e-3), rtol=0
    )


def test_b2_ir_blocks_eligible_count():
    """17 of the 20 B2 ir blocks are stride-1 channel-preserving (fusable).

    Not fused: the two stride-2 stage entries (s4 b0, s6 b0) and s5 b0
    (stride 1 but 104 -> 120 channels, no residual).
    """
    n_fused = 0
    ch = None
    for st in EFFNETV2_B2_SPEC:
        for bi in range(st.repeats):
            stride = st.stride if bi == 0 else 1
            if st.block == "ir" and stride == 1 and ch == st.channels:
                n_fused += 1
            ch = st.channels
    assert n_fused == 17
