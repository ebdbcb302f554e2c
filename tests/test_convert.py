"""Torch-checkpoint converter tests: structural + numeric compatibility."""
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.smoke  # cold-cache fast: tiny converter models

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_torch_checkpoint import (  # noqa: E402
    convert_acoustic,
    convert_generator,
)

from mri2speech_tpu.config import default_vocoder_config  # noqa: E402
from mri2speech_tpu.models.vocoder import Generator  # noqa: E402


def _tiny_h():
    return dict(
        default_vocoder_config(
            upsample_initial_channel=8,
            upsample_rates=[10],
            upsample_kernel_sizes=[20],
            resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]],
        )
    )


def _torch_generator_state(h):
    """Build a reference-layout generator state dict from torch modules."""
    state = {}
    conv_pre = torch.nn.Conv1d(h["num_mels"], h["upsample_initial_channel"], 7)
    state["conv_pre.weight"] = conv_pre.weight
    state["conv_pre.bias"] = conv_pre.bias

    ch_in = h["upsample_initial_channel"]
    ch = ch_in // 2
    up = weight_norm(torch.nn.ConvTranspose1d(ch_in, ch, 20, 10, padding=5))
    for k in ("weight_v", "weight_g", "bias"):
        state[f"ups.0.{k}"] = getattr(up, k if k != "bias" else "bias")

    for conv_list in ("convs1", "convs2"):
        for j in range(3):
            d = [1, 3, 5][j] if conv_list == "convs1" else 1
            c = weight_norm(torch.nn.Conv1d(ch, ch, 3, dilation=d, padding=3 * d - d))
            state[f"resblocks.0.{conv_list}.{j}.weight_v"] = c.weight_v
            state[f"resblocks.0.{conv_list}.{j}.weight_g"] = c.weight_g
            state[f"resblocks.0.{conv_list}.{j}.bias"] = c.bias

    post = weight_norm(torch.nn.Conv1d(ch, 1, 7))
    state["conv_post.weight_v"] = post.weight_v
    state["conv_post.weight_g"] = post.weight_g
    state["conv_post.bias"] = post.bias
    return state


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_generator_conversion_structure_and_apply():
    h = _tiny_h()
    state = _torch_generator_state(h)
    params = convert_generator(state)

    gen = Generator(h=h)
    ref_params = jax.device_get(gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 4)))["params"])
    assert _tree_shapes(params) == _tree_shapes(ref_params)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 5)), jnp.float32)
    y = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)
    assert y.shape == (1, 1, 5 * 10)
    assert np.all(np.isfinite(np.asarray(y)))


def test_acoustic_conversion_lstm_and_head():
    C, H, M = 6, 5, 8
    lstm = torch.nn.LSTM(C, H, batch_first=True, bidirectional=True)
    head = torch.nn.Linear(H, M)
    state = {}
    for k, v in lstm.state_dict().items():
        state[f"rnn.lstm.{k}"] = v
    state["head.weight"] = head.weight
    state["head.bias"] = head.bias

    params, batch_stats = convert_acoustic(state)
    assert params["rnn"]["w_ih_fwd"].shape == (C, 4 * H)
    assert params["rnn"]["w_hh_bwd"].shape == (H, 4 * H)
    assert params["head"]["kernel"].shape == (H, M)
    np.testing.assert_allclose(
        params["rnn"]["b_fwd"],
        (lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy(),
        atol=1e-7,
    )

    # numeric parity of the converted BiLSTM against torch
    from mri2speech_tpu.models.lstm import BiLSTMSumMerge

    x = np.random.default_rng(1).standard_normal((2, 7, C)).astype(np.float32)
    with torch.no_grad():
        y, _ = lstm(torch.from_numpy(x))
    y_fwd, y_bwd = y.chunk(2, dim=-1)
    ref = (y_fwd + y_bwd).numpy()
    ours = np.asarray(
        BiLSTMSumMerge(H).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params["rnn"])}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_acoustic_conversion_effnet_block_keys():
    """ConvBnAct / EdgeResidual / InvertedResidual timm key mapping."""
    state = {}
    # stem
    state["cnn.backbone.conv_stem.weight"] = torch.randn(8, 3, 3, 3)
    for s in ("weight", "bias", "running_mean", "running_var"):
        state[f"cnn.backbone.bn1.{s}"] = torch.randn(8)
    # stage0 block0: ConvBnAct
    state["cnn.backbone.blocks.0.0.conv.weight"] = torch.randn(8, 8, 3, 3)
    for s in ("weight", "bias", "running_mean", "running_var"):
        state[f"cnn.backbone.blocks.0.0.bn1.{s}"] = torch.randn(8)
    # stage1 block0: EdgeResidual
    state["cnn.backbone.blocks.1.0.conv_exp.weight"] = torch.randn(16, 8, 3, 3)
    state["cnn.backbone.blocks.1.0.conv_pwl.weight"] = torch.randn(8, 16, 1, 1)
    for bn in ("bn1", "bn2"):
        for s in ("weight", "bias", "running_mean", "running_var"):
            state[f"cnn.backbone.blocks.1.0.{bn}.{s}"] = torch.randn(16 if bn == "bn1" else 8)
    # stage2 block0: InvertedResidual with SE
    state["cnn.backbone.blocks.2.0.conv_pw.weight"] = torch.randn(16, 8, 1, 1)
    state["cnn.backbone.blocks.2.0.conv_dw.weight"] = torch.randn(16, 1, 3, 3)
    state["cnn.backbone.blocks.2.0.se.conv_reduce.weight"] = torch.randn(2, 16, 1, 1)
    state["cnn.backbone.blocks.2.0.se.conv_reduce.bias"] = torch.randn(2)
    state["cnn.backbone.blocks.2.0.se.conv_expand.weight"] = torch.randn(16, 2, 1, 1)
    state["cnn.backbone.blocks.2.0.se.conv_expand.bias"] = torch.randn(16)
    state["cnn.backbone.blocks.2.0.conv_pwl.weight"] = torch.randn(8, 16, 1, 1)
    for bn, n in (("bn1", 16), ("bn2", 16), ("bn3", 8)):
        for s in ("weight", "bias", "running_mean", "running_var"):
            state[f"cnn.backbone.blocks.2.0.{bn}.{s}"] = torch.randn(n)

    params, batch_stats = convert_acoustic(state)
    assert params["cnn"]["stem_conv"]["kernel"].shape == (3, 3, 3, 8)
    assert params["cnn"]["s0_b0"]["conv"]["kernel"].shape == (3, 3, 8, 8)
    assert params["cnn"]["s1_b0"]["conv_exp"]["kernel"].shape == (3, 3, 8, 16)
    assert params["cnn"]["s2_b0"]["conv_dw"]["kernel"].shape == (3, 3, 1, 16)
    assert params["cnn"]["s2_b0"]["se"]["reduce"]["kernel"].shape == (1, 1, 16, 2)
    assert batch_stats["cnn"]["s2_b0"]["bn3"]["mean"].shape == (8,)
