"""Reverse checkpoint export (JAX -> reference torch format).

Closes the migration loop: a vocoder trained HERE loads into the genuine
reference `models.py` Generator (strict state_dict) and produces the same
waveform; the acoustic mapping round-trips exactly through the forward
converter. Reference anchors: `utils.py:38-57` (g_ checkpoint layout),
`scripts/run_mri_video_inference.py:89-148` (generator load),
`train_mri_acoustic_model.py:393-462` (model_state_dict layout).
"""
import importlib.util
import json
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.vocoder import Generator

REF = "/root/reference"
_TOOLS = "/root/repo/tools"
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)

from convert_torch_checkpoint import convert_acoustic, convert_generator  # noqa: E402
from export_torch_checkpoint import acoustic_to_torch, generator_to_torch  # noqa: E402


def _load_ref_module(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    _load_ref_module("utils", f"{REF}/utils.py")
    return _load_ref_module("models", f"{REF}/models.py")


@pytest.fixture(scope="module")
def ref_config():
    with open(f"{REF}/config_custom.json", "r", encoding="utf-8") as f:
        h = json.load(f)

    class _AD(dict):
        def __getattr__(self, k):
            return self[k]

    return _AD(h)


def test_generator_reverse_loads_into_reference(ref_models, ref_config):
    """Our trained params -> torch state_dict -> the GENUINE reference
    Generator (strict load) -> same waveform as our module."""
    h = dict(ref_config)
    gen_j = Generator(h=h, use_weight_norm=True)
    params = gen_j.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 4)))["params"]
    params = jax.device_get(params)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in generator_to_torch(params).items()}
    gen_t = ref_models.Generator(ref_config)
    gen_t.load_state_dict(sd, strict=True)  # every key present and shaped
    gen_t.eval()

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 64, 5)).astype(np.float32)
    with torch.no_grad():
        y_t = gen_t(torch.from_numpy(x)).numpy()
    y_j = np.asarray(gen_j.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=0)


def test_generator_reverse_is_inverse_of_forward(ref_config):
    """convert_generator(generator_to_torch(p)) == p, leaf for leaf."""
    gen_j = Generator(h=dict(ref_config), use_weight_norm=True)
    params = jax.device_get(
        gen_j.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 4)))["params"]
    )
    back = convert_generator(generator_to_torch(params))
    flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert flat_a.keys() == flat_b.keys()
    for path, leaf in flat_a.items():
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
    StageSpec("ir", 3, 2, 2, 16, 1, 0.25),
)


def test_acoustic_reverse_is_inverse_of_forward():
    """All three block kinds + BN stats + fused LSTM bias + head round-trip
    exactly through timm-named torch keys."""
    model = AcousticModel(
        n_mels=8, rnn_hidden=16, dropout=0.0, cnn_spec=TINY_SPEC, cnn_stem=8
    )
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, 32, 32)), train=False
    ))
    params, bstats = variables["params"], variables["batch_stats"]
    sd = acoustic_to_torch(params, bstats)
    assert any(k.endswith("num_batches_tracked") for k in sd)
    p2, b2 = convert_acoustic(sd)
    for tree, tree2 in ((params, p2), (bstats, b2)):
        flat_a = dict(jax.tree_util.tree_leaves_with_path(tree))
        flat_b = dict(jax.tree_util.tree_leaves_with_path(tree2))
        assert flat_a.keys() == flat_b.keys()
        for path, leaf in flat_a.items():
            np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


def test_acoustic_lstm_bias_split_is_equivalent():
    """bias_ih = fused, bias_hh = 0: torch's LSTM adds them, so the exported
    module computes the same gates as our fused-bias scan."""
    rng = np.random.default_rng(7)
    H, I, T = 6, 5, 9
    w_ih = rng.standard_normal((I, 4 * H)).astype(np.float32)
    w_hh = rng.standard_normal((H, 4 * H)).astype(np.float32)
    b = rng.standard_normal(4 * H).astype(np.float32)

    lstm = torch.nn.LSTM(I, H, num_layers=1, batch_first=True)
    sd = lstm.state_dict()
    sd["weight_ih_l0"] = torch.from_numpy(w_ih.T.copy())
    sd["weight_hh_l0"] = torch.from_numpy(w_hh.T.copy())
    sd["bias_ih_l0"] = torch.from_numpy(b.copy())
    sd["bias_hh_l0"] = torch.zeros(4 * H)
    lstm.load_state_dict(sd)
    x = rng.standard_normal((1, T, I)).astype(np.float32)
    with torch.no_grad():
        y_t, _ = lstm(torch.from_numpy(x))

    from mri2speech_tpu.models.lstm import lstm_direction

    y_j = lstm_direction(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=1e-5, rtol=0)


def test_cli_roundtrip(tmp_path, ref_config):
    """m2s checkpoint file -> CLI -> torch .pth with the reference's layout."""
    import subprocess

    from mri2speech_tpu.train import checkpoint as ckpt_io

    gen_j = Generator(h=dict(ref_config), use_weight_norm=True)
    params = jax.device_get(
        gen_j.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 4)))["params"]
    )
    src = tmp_path / "g_00000001.msgpack"
    ckpt_io.save_checkpoint(str(src), {"generator": params})
    out = tmp_path / "g_00000001"
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/export_torch_checkpoint.py",
         "--kind", "generator", "--ckpt", str(src), "--out", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    obj = torch.load(out, map_location="cpu", weights_only=False)
    assert "generator" in obj and "conv_pre.weight" in obj["generator"]
    assert obj["generator"]["ups.0.weight_v"].shape[2] == 20  # (in,out,k)
