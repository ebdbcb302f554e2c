"""Tripwire for the timm EffNetV2-B2 pretrained-weight port.

timm is not installed in this environment, so the port is defined by a pinned
manifest of the expected `tf_efficientnetv2_b2` (features_only) state-dict keys
and shapes (`tests/fixtures/timm_tf_efficientnetv2_b2_manifest.json`, generated
by `tools/convert_torch_checkpoint.timm_b2_key_manifest`). These tests fail if
the converter's backbone mapping, the Flax spec, or the fixture drift apart —
the `cnn_pretrained` path cannot rot invisibly.

Reference anchor: `mri2speech_code/mri_acoustic_model.py:28-36`.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_TOOLS = str(Path(__file__).resolve().parents[1] / "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)

from convert_torch_checkpoint import convert_acoustic, timm_b2_key_manifest  # noqa: E402

FIXTURE = Path(__file__).parent / "fixtures" / "timm_tf_efficientnetv2_b2_manifest.json"


@pytest.fixture(scope="module")
def manifest():
    with open(FIXTURE, "r", encoding="utf-8") as f:
        return json.load(f)


def test_manifest_fixture_matches_generator(manifest):
    """The checked-in fixture IS the generator's output — any drift in the
    Flax B2 spec or the assumed timm naming/shape contract fails here."""
    gen = timm_b2_key_manifest()
    assert manifest["feature_dim"] == 208
    assert manifest["n_keys"] == len(gen) == 530
    assert manifest["keys"] == gen


def test_manifest_stage_table(manifest):
    stages = manifest["stages"]
    assert [s["channels"] for s in stages] == [16, 32, 56, 104, 120, 208]
    assert [s["repeats"] for s in stages] == [2, 3, 3, 4, 6, 10]
    assert [s["stride"] for s in stages] == [1, 2, 2, 2, 1, 2]
    assert manifest["total_downsample"] == 32


def test_convert_acoustic_accepts_manifest_state_dict(manifest):
    """A synthetic state dict with the REAL timm key names/shapes converts and
    loads into the Flax model exactly (same tree, same leaf shapes), and the
    loaded model runs.

    This exercises every branch of `convert_acoustic`'s backbone mapping
    (ConvBnAct / EdgeResidual / InvertedResidual+SE / stem) at full B2 size.
    """
    from mri2speech_tpu.models.acoustic import AcousticModel

    rng = np.random.default_rng(0)
    state = {}
    for key, shape in manifest["keys"].items():
        if key.endswith("num_batches_tracked"):
            state[f"cnn.backbone.{key}"] = np.asarray(0, dtype=np.int64)
        elif "running_var" in key:
            state[f"cnn.backbone.{key}"] = np.ones(shape, dtype=np.float32)
        else:
            state[f"cnn.backbone.{key}"] = rng.standard_normal(shape).astype(np.float32) * 0.05
    # LSTM + head with the real dims (input 208, hidden 640)
    H, C = 640, manifest["feature_dim"]
    for sfx, in_dim in (("l0", C), ("l0_reverse", C)):
        state[f"rnn.lstm.weight_ih_{sfx}"] = rng.standard_normal((4 * H, in_dim)).astype(np.float32) * 0.01
        state[f"rnn.lstm.weight_hh_{sfx}"] = rng.standard_normal((4 * H, H)).astype(np.float32) * 0.01
        state[f"rnn.lstm.bias_ih_{sfx}"] = np.zeros(4 * H, np.float32)
        state[f"rnn.lstm.bias_hh_{sfx}"] = np.zeros(4 * H, np.float32)
    state["head.weight"] = rng.standard_normal((64, H)).astype(np.float32) * 0.01
    state["head.bias"] = np.zeros(64, np.float32)

    params, batch_stats = convert_acoustic(state)

    model = AcousticModel(n_mels=64, rnn_hidden=H)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, 64, 64)), train=False)
    )

    def flat(tree):
        return {
            jax.tree_util.keystr(p): tuple(np.shape(l))
            for p, l in jax.tree_util.tree_leaves_with_path(tree)
        }

    got_p, want_p = flat(params), flat(template["params"])
    assert got_p == want_p, (
        f"converted params tree mismatch: missing={sorted(set(want_p) - set(got_p))[:5]} "
        f"extra={sorted(set(got_p) - set(want_p))[:5]}"
    )
    assert flat(batch_stats) == flat(template["batch_stats"])

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((1, 2, 1, 64, 64)),
        train=False,
    )
    assert out.shape == (1, 2, 64)
    assert np.all(np.isfinite(np.asarray(out)))
