"""Pallas fused-MRF stage kernel vs the ResBlock1 reference stack (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.vocoder import ResBlock1
from mri2speech_tpu.ops.pallas_mrf import (
    _tile_rows,
    mrf_stage_pallas,
    mrf_stage_pallas_v2,
    pack_mrf_stage_params,
    stage_receptive_field,
)

TILE = _tile_rows(96)  # stage-3 tile length (C=32 x 3 branches)

KERNELS = (3, 7, 11)
DILS = (1, 3, 5)


def _stage_reference(x, resblocks, channels):
    """The unfused Generator stage: mean over the 3 ResBlock branches."""
    acc = None
    for j, k in enumerate(KERNELS):
        m = ResBlock1(channels, k, DILS, use_weight_norm=False)
        y = m.apply({"params": resblocks[j]}, x)
        acc = y if acc is None else acc + y
    return acc / len(KERNELS)


def _random_resblocks(rng, channels):
    # N(0, 0.01)-scale weights like the real init (`utils.py:22-25`) so
    # activations stay bounded through the residual chain, as in trained nets
    blocks = []
    for k in KERNELS:
        blk = {}
        for u in range(len(DILS)):
            for name in (f"convs1_{u}", f"convs2_{u}"):
                blk[name] = {
                    "w": (rng.standard_normal((k, channels, channels)) * 0.05).astype(np.float32),
                    "b": (rng.standard_normal(channels) * 0.05).astype(np.float32),
                }
        blocks.append(blk)
    return blocks


def test_receptive_field_fits_halo():
    assert stage_receptive_field(KERNELS, DILS) == 120 <= 128


@pytest.mark.parametrize("T", [64, TILE + 200])  # sub-tile and multi-tile + ragged
def test_pallas_mrf_matches_resblock_stack(T):
    C = 32
    rng = np.random.default_rng(0)
    resblocks = _random_resblocks(rng, C)
    x = (rng.standard_normal((1, T, C)) * 0.5).astype(np.float32)

    ref = np.asarray(_stage_reference(jnp.asarray(x), resblocks, C))

    packed = pack_mrf_stage_params(resblocks, KERNELS, DILS)
    x_tiled = jnp.tile(jnp.asarray(x), (1, 1, len(KERNELS)))
    out = np.asarray(
        mrf_stage_pallas(
            x_tiled, packed, channels=C, kernels=KERNELS, dils=DILS, interpret=True
        )
    )
    assert out.shape == ref.shape == (1, T, C)
    # bf16 MXU operands in the kernel -> tolerance relative to the output range
    tol = 3e-3 * float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=max(tol, 1e-3), rtol=0)

    # and exact (fp32-level) agreement with fp32 MXU operands: the kernel's
    # structure (shifts, packing, halo, masking) is precision-independent
    out32 = np.asarray(
        mrf_stage_pallas(
            x_tiled, packed, channels=C, kernels=KERNELS, dils=DILS,
            interpret=True, mxu_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out32, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("T", [64, TILE + 200])  # sub-tile and multi-tile + ragged
def test_pallas_mrf_v2_matches_resblock_stack(T):
    C = 32
    rng = np.random.default_rng(1)
    resblocks = _random_resblocks(rng, C)
    x = (rng.standard_normal((1, T, C)) * 0.5).astype(np.float32)

    ref = np.asarray(_stage_reference(jnp.asarray(x), resblocks, C))

    packed = pack_mrf_stage_params(resblocks, KERNELS, DILS)
    out = np.asarray(
        mrf_stage_pallas_v2(
            jnp.asarray(x), packed, channels=C, kernels=KERNELS, dils=DILS,
            interpret=True,
        )
    )
    assert out.shape == ref.shape == (1, T, C)
    tol = 3e-3 * float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=max(tol, 1e-3), rtol=0)

    # fp32 MXU operands: structural exactness (slices, halo clamp, masking)
    out32 = np.asarray(
        mrf_stage_pallas_v2(
            jnp.asarray(x), packed, channels=C, kernels=KERNELS, dils=DILS,
            interpret=True, mxu_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out32, ref, atol=1e-4, rtol=1e-4)


def test_pallas_mrf_v2_bf16_io_and_batch2():
    C = 32
    rng = np.random.default_rng(4)
    resblocks = _random_resblocks(rng, C)
    x = (rng.standard_normal((2, 96, C)) * 0.5).astype(np.float32)
    ref = np.asarray(_stage_reference(jnp.asarray(x), resblocks, C))
    packed = pack_mrf_stage_params(resblocks, KERNELS, DILS)
    out = np.asarray(
        mrf_stage_pallas_v2(
            jnp.asarray(x, jnp.bfloat16), packed, channels=C, kernels=KERNELS,
            dils=DILS, interpret=True,
        ).astype(jnp.float32)
    )
    assert out.shape == ref.shape
    tol = 2e-2 * float(np.abs(ref).max())  # bf16 input + output rounding
    np.testing.assert_allclose(out, ref, atol=max(tol, 5e-3), rtol=0)


def test_pallas_mrf_batch2():
    C = 32
    rng = np.random.default_rng(3)
    resblocks = _random_resblocks(rng, C)
    x = (rng.standard_normal((2, 96, C)) * 0.5).astype(np.float32)
    ref = np.asarray(_stage_reference(jnp.asarray(x), resblocks, C))
    packed = pack_mrf_stage_params(resblocks, KERNELS, DILS)
    out = np.asarray(
        mrf_stage_pallas(
            jnp.tile(jnp.asarray(x), (1, 1, 3)), packed,
            channels=C, kernels=KERNELS, dils=DILS, interpret=True,
        )
    )
    tol = 3e-3 * float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=max(tol, 1e-3), rtol=0)
