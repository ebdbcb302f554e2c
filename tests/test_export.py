"""AOT serving-artifact tests: export -> frozen load -> exactness.

The contract under test is ours (the reference has no packaging story at
all): the serialized StableHLO program grid, loaded WITHOUT any model code,
reproduces the live pipeline bit-for-bit on every serving surface, fits
requests to the exported buckets mask-exactly, and fails loudly when no
bucket fits.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.infer.export import (
    ExportedPipeline,
    export_pipeline,
    load_exported_pipeline,
)
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.scaler import MelScaler

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
)


def _tiny_pipeline(input_norm="none"):
    acoustic = AcousticModel(n_mels=64, rnn_hidden=16, cnn_spec=TINY_SPEC, cnn_stem=8)
    variables = acoustic.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, 32, 32)), train=False
    )
    h = dict(default_vocoder_config(upsample_initial_channel=32))
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 4)))["params"]
    gen = Generator(h=h, use_weight_norm=False)
    gen_params = fold_weight_norm(jax.device_get(params_wn))
    scaler = MelScaler(
        mean=np.linspace(-40, -10, 64).astype(np.float32),
        std=np.full(64, 5.0, dtype=np.float32),
    )
    return VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler,
        frame_bucket=8, input_norm=input_norm,
    )


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    pipe = _tiny_pipeline()
    out = tmp_path_factory.mktemp("aot") / "artifact"
    export_pipeline(
        pipe, out, batch_sizes=(1, 4), frame_buckets=(8, 16),
        frame_shape=(32, 32),
    )
    return pipe, out


def test_manifest_and_program_grid(artifact):
    _, out = artifact
    manifest = json.loads((out / "manifest.json").read_text())
    grid = {(p["batch"], p["frames"]) for p in manifest["programs"]}
    assert grid == {(1, 8), (1, 16), (4, 8), (4, 16)}
    for p in manifest["programs"]:
        assert (out / "programs" / p["file"]).stat().st_size > 0
    assert manifest["symbolic_program"] == "fwd_symbolic.bin"
    assert (out / "programs" / "fwd_symbolic.bin").stat().st_size > 0
    assert manifest["hop_total"] == 420
    assert manifest["frames_dtype"] == "float32"


def test_frozen_output_bit_identical(artifact):
    """Same program, same params, same inputs -> identical bits."""
    pipe, out = artifact
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(7)
    video = rng.random((8, 32, 32)).astype(np.float32)
    a_live, m_live, l_live = pipe(video)
    a_froz, m_froz, l_froz = loaded(video)
    np.testing.assert_array_equal(a_froz, a_live)
    np.testing.assert_array_equal(m_froz, m_live)
    np.testing.assert_array_equal(l_froz, l_live)


def test_bucket_fitting_and_mask_exact_mels(artifact):
    """A T=5 request runs in the Tp=8 program; a 3-video batch in the
    batch-4 bucket. Mels at valid frames are exact vs the live pipeline."""
    pipe, out = artifact
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(11)
    videos = [
        rng.random((t, 32, 32)).astype(np.float32) for t in (5, 8, 13)
    ]
    a_ref, m_ref = pipe.infer_batch(videos)
    a_froz, m_froz = loaded.infer_batch(videos)
    assert [len(a) for a in a_froz] == [t * 420 for t in (5, 8, 13)]
    for mr, mf in zip(m_ref, m_froz):
        np.testing.assert_allclose(mf, mr, atol=1e-6)
    # audio exactness everywhere except the generator's receptive-field
    # tail (live pipeline padded the batch to Tp=16 too -> same context)
    for ar, af in zip(a_ref, a_froz):
        np.testing.assert_allclose(af, ar, atol=1e-6)
    # single-video infer_audio picks the smallest (1, 8) program
    a1 = loaded.infer_audio(videos[0])
    assert a1.shape == (5 * 420,)


def test_symbolic_fallback_covers_any_shape(artifact):
    """Requests outside the concrete grid (T=17 > max Tp=16; batch 5 >
    max 4) run through the ONE shape-polymorphic program, exactly."""
    pipe, out = artifact
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(23)
    videos = [
        rng.random((t, 32, 32)).astype(np.float32) for t in (17, 3, 9, 8, 12)
    ]
    a_ref, m_ref = pipe.infer_batch(videos)  # live: pads to Tp=24, B=5
    a_froz, m_froz = loaded.infer_batch(videos)
    for ar, af, mr, mf in zip(a_ref, a_froz, m_ref, m_froz):
        np.testing.assert_array_equal(af, ar)
        np.testing.assert_array_equal(mf, mr)
    assert ("symbolic" in loaded._calls) and len(loaded._calls) == 1


def test_no_fitting_bucket_raises(tmp_path):
    """Without the symbolic program, shapes outside the grid fail loudly."""
    pipe = _tiny_pipeline()
    out = tmp_path / "artifact_grid_only"
    export_pipeline(pipe, out, batch_sizes=(1,), frame_buckets=(8,),
                    frame_shape=(32, 32), symbolic=False)
    loaded = load_exported_pipeline(out)
    assert json.loads((out / "manifest.json").read_text())["symbolic_program"] is None
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="no exported program fits"):
        loaded.infer_batch(
            [rng.random((17, 32, 32)).astype(np.float32)]  # > max Tp=8
        )
    with pytest.raises(ValueError, match="no exported program fits"):
        loaded.infer_batch(
            [rng.random((8, 32, 32)).astype(np.float32) for _ in range(5)]
        )
    with pytest.raises(ValueError, match="frame size"):
        loaded.infer_audio(rng.random((8, 16, 16)).astype(np.float32))


def test_uint8_input_contract(tmp_path):
    """input_norm="zscore_minmax" freezes the uint8 + on-device-norm path."""
    pipe = _tiny_pipeline(input_norm="zscore_minmax")
    out = tmp_path / "artifact_u8"
    export_pipeline(pipe, out, batch_sizes=(1,), frame_buckets=(8,),
                    frame_shape=(32, 32), sampling_rate=22050)
    loaded = load_exported_pipeline(out)
    assert loaded.frames_dtype == np.uint8
    assert loaded.sampling_rate == 22050  # daemon tags WAVs from the manifest
    rng = np.random.default_rng(5)
    video = (rng.random((8, 32, 32)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        loaded.infer_audio(video), pipe.infer_audio(video)
    )


def test_multiplatform_export_runs_on_cpu(tmp_path):
    """platforms=("cpu", "tpu") lowers BOTH targets on this CPU-only host
    (build-once-deploy-anywhere) and still executes here bit-exactly."""
    pipe = _tiny_pipeline()
    out = tmp_path / "artifact_mp"
    export_pipeline(pipe, out, batch_sizes=(1,), frame_buckets=(8,),
                    frame_shape=(32, 32), platforms=("cpu", "tpu"),
                    symbolic=False)
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["platforms"] == ["cpu", "tpu"]
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(29)
    video = rng.random((8, 32, 32)).astype(np.float32)
    np.testing.assert_array_equal(
        loaded.infer_audio(video), pipe.infer_audio(video)
    )


def test_serving_daemon_over_frozen_artifact(artifact):
    """BatchingInferenceServer accepts an ExportedPipeline as its backend."""
    from mri2speech_tpu.infer.server import BatchingInferenceServer

    pipe, out = artifact
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(13)
    videos = [rng.random((8, 32, 32)).astype(np.float32) for _ in range(2)]
    loaded.infer_batch(videos)  # warm the (4, 8) program
    server = BatchingInferenceServer(loaded, max_batch=4, batch_window_ms=0.0)
    try:
        a_ref, _ = pipe.infer_batch([videos[0]])
        audio, mel, _n = server.synthesize(videos[0], timeout=120)
        np.testing.assert_allclose(audio, a_ref[0], atol=1e-6)
        assert mel.shape == (8, 64)
    finally:
        server.shutdown()


LOADER_ONLY_SCRIPT = r"""
import json, sys
import numpy as np

# The point of the artifact: serving needs NO model code. Poison the model
# packages so any accidental import fails loudly (infer/__init__ re-exports
# are lazy, so these must never be touched on this path).
for mod in ("mri2speech_tpu.models", "mri2speech_tpu.models.acoustic",
            "mri2speech_tpu.models.vocoder", "mri2speech_tpu.models.layers",
            "mri2speech_tpu.infer.pipeline", "mri2speech_tpu.infer.online",
            "mri2speech_tpu.infer.vocoder_io"):
    sys.modules[mod] = None  # import -> ImportError

import jax
jax.config.update("jax_platforms", "cpu")
from mri2speech_tpu.infer.export import load_exported_pipeline

artifact, video_npy, expected_npy = sys.argv[1:4]
loaded = load_exported_pipeline(artifact)
audio = loaded.infer_audio(np.load(video_npy))
np.testing.assert_array_equal(audio, np.load(expected_npy))
print("LOADER_ONLY_OK")
"""


def test_load_without_model_code(artifact, tmp_path):
    """Fresh process, model/ops modules poisoned: the artifact still serves
    and matches the live pipeline's output byte-for-byte."""
    pipe, out = artifact
    rng = np.random.default_rng(17)
    video = rng.random((8, 32, 32)).astype(np.float32)
    expected = pipe.infer_audio(video)
    np.save(tmp_path / "video.npy", video)
    np.save(tmp_path / "expected.npy", expected)
    script = tmp_path / "loader_only.py"
    script.write_text(LOADER_ONLY_SCRIPT)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), str(out), str(tmp_path / "video.npy"),
         str(tmp_path / "expected.npy")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "LOADER_ONLY_OK" in proc.stdout


def test_unsupported_format_version_rejected(artifact, tmp_path):
    """A loader must refuse artifacts from a future format, loudly."""
    import shutil

    _, out = artifact
    bad = tmp_path / "artifact_v999"
    shutil.copytree(out, bad)
    manifest = json.loads((bad / "manifest.json").read_text())
    manifest["format_version"] = 999
    (bad / "manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="format_version"):
        load_exported_pipeline(bad)


def test_mel_to_audio_program(artifact):
    """The artifact's vocoder-only program (the frozen `m2s-infer-mels`
    path) matches the live generator exactly, for 2D and batched mels."""
    pipe, out = artifact
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(37)
    mel = rng.standard_normal((64, 6)).astype(np.float32)
    got = loaded.mel_to_audio(mel)
    ref = np.asarray(
        pipe.generator.apply({"params": pipe.generator_params},
                             jnp.asarray(mel[None]))
    )[0, 0]
    # shape-refined codegen may fuse differently than a fresh concrete jit:
    # same math, last-bit fp differences
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)
    assert got.shape == (6 * 420,)

    batch = rng.standard_normal((2, 64, 9)).astype(np.float32)
    got_b = loaded.mel_to_audio(batch)
    assert got_b.shape == (2, 9 * 420)
    np.testing.assert_allclose(
        got_b[0], loaded.mel_to_audio(batch[0]), atol=1e-6, rtol=0
    )

    with pytest.raises(ValueError, match="bins"):
        loaded.mel_to_audio(rng.standard_normal((32, 6)).astype(np.float32))


def test_uint8_artifact_rejects_float_frames(tmp_path):
    """Float frames into a uint8 artifact would silently truncate to zeros;
    the loader must refuse instead."""
    pipe = _tiny_pipeline(input_norm="zscore_minmax")
    out = tmp_path / "artifact_u8_guard"
    export_pipeline(pipe, out, batch_sizes=(1,), frame_buckets=(8,),
                    frame_shape=(32, 32), symbolic=False)
    loaded = load_exported_pipeline(out)
    rng = np.random.default_rng(43)
    with pytest.raises(ValueError, match="uint8"):
        loaded.infer_audio(rng.random((8, 32, 32)).astype(np.float32))
