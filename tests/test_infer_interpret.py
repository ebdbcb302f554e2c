"""Inference pipeline, exporters, Grad-CAM, masking, and eval tests (tiny models)."""
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.scaler import MelScaler

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
    StageSpec("ir", 3, 2, 2, 16, 1, 0.25),
)


@pytest.fixture(scope="module")
def tiny_setup():
    acoustic = AcousticModel(n_mels=64, rnn_hidden=16, cnn_spec=TINY_SPEC, cnn_stem=8)
    variables = acoustic.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, 64, 64)), train=False
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
    return acoustic, variables, gen, gen_params, scaler, h


def test_pipeline_shapes_and_padding_exactness(tiny_setup):
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(0)
    frames = rng.random((10, 64, 64)).astype(np.float32)

    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )
    audio, mel_db, mel_log = pipe(frames)
    assert audio.shape == (10 * 420,)
    assert mel_db.shape == (10, 64)
    assert mel_log.shape == (10, 64)
    assert np.all(np.abs(audio) <= 1.0)

    # mask-exact BiLSTM: acoustic mels identical with exact (bucket=1) run
    pipe_exact = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=1
    )
    _, mel_db_exact, _ = pipe_exact(frames)
    np.testing.assert_allclose(mel_db, mel_db_exact, atol=2e-4, rtol=1e-4)


def test_pipeline_batched_inference(tiny_setup):
    """infer_batch: mel mask-exactness per video + exact audio when the
    batch padding equals the solo padding."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(7)
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )

    # equal, bucket-multiple lengths: batch == solo EXACTLY (same padding)
    v1 = rng.random((8, 64, 64)).astype(np.float32)
    v2 = rng.random((8, 64, 64)).astype(np.float32)
    audios, mels = pipe.infer_batch([v1, v2])
    for v, a, m in zip((v1, v2), audios, mels):
        a_solo, m_solo, _ = pipe(v)
        np.testing.assert_allclose(a, a_solo, atol=1e-6)
        np.testing.assert_allclose(m, m_solo, atol=1e-6)

    # mixed lengths: mel predictions at valid frames stay mask-exact vs the
    # solo runs; audio is per-video length-trimmed (tail context differs
    # within the generator's receptive field — parity_notes)
    v3 = rng.random((5, 64, 64)).astype(np.float32)
    audios, mels = pipe.infer_batch([v1, v3])
    assert [len(a) for a in audios] == [8 * 420, 5 * 420]
    for v, m in zip((v1, v3), mels):
        _, m_solo, _ = pipe(v)
        np.testing.assert_allclose(m, m_solo, atol=2e-4, rtol=1e-4)
    assert all(np.all(np.isfinite(a)) for a in audios)

    # batch of one equals the solo run bit-for-bit (same shapes end-to-end)
    audios, mels = pipe.infer_batch([v3])
    a_solo, m_solo, _ = pipe(v3)
    np.testing.assert_allclose(audios[0], a_solo, atol=1e-6)

    assert pipe.infer_batch([]) == ([], [])
    with pytest.raises(ValueError):
        pipe.infer_batch([v1, rng.random((4, 32, 32)).astype(np.float32)])


def test_pipeline_mesh_sharded_batch(tiny_setup):
    """Mesh-sharded batched serving: outputs exact vs the single-device
    pipeline, including when the batch must be padded to a data-axis
    multiple and on the single-video (replicated-input) paths."""
    from mri2speech_tpu.parallel.mesh import make_mesh

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(11)
    mesh = make_mesh(n_data=4)
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )
    pipe_mesh = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8, mesh=mesh
    )

    videos = [rng.random((8, 64, 64)).astype(np.float32) for _ in range(4)]
    a_ref, m_ref = pipe.infer_batch(videos)
    a_mesh, m_mesh = pipe_mesh.infer_batch(videos)
    for ar, am, mr, mm in zip(a_ref, a_mesh, m_ref, m_mesh):
        np.testing.assert_allclose(am, ar, atol=1e-6)
        np.testing.assert_allclose(mm, mr, atol=1e-6)

    # batch of 2 on a 4-way data axis: padded rows are masked dummies and
    # must not perturb the real rows
    a_mesh2, m_mesh2 = pipe_mesh.infer_batch(videos[:2])
    for ar, am, mr, mm in zip(a_ref[:2], a_mesh2, m_ref[:2], m_mesh2):
        np.testing.assert_allclose(am, ar, atol=1e-6)
        np.testing.assert_allclose(mm, mr, atol=1e-6)

    # single-video paths on a mesh pipeline: inputs replicate, outputs exact
    a_solo, m_solo, _ = pipe(videos[0])
    a_solo_mesh, m_solo_mesh, _ = pipe_mesh(videos[0])
    np.testing.assert_allclose(a_solo_mesh, a_solo, atol=1e-6)
    np.testing.assert_allclose(m_solo_mesh, m_solo, atol=1e-6)
    np.testing.assert_allclose(
        pipe_mesh.infer_audio(videos[0]), a_solo, atol=1e-6
    )


def test_pipeline_sequence_parallel(tiny_setup):
    """Sequence-parallel serving (frame/time axis sharded over the mesh's
    "model" axis; CNN frame-sharded, generator spatially partitioned with
    GSPMD halo exchange, BiLSTM on the gathered features) is exact vs the
    single-device pipeline — single-video, uint8-normalised, and composed
    with the batch "data" axis on a 2D mesh."""
    from mri2speech_tpu.parallel.mesh import make_mesh

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(23)
    mesh = make_mesh(2, 4)
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )
    pipe_sp = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8,
        mesh=mesh, sequence_parallel=True,
    )

    frames = rng.random((16, 64, 64)).astype(np.float32)
    a_ref, m_ref, _ = pipe(frames)
    a_sp, m_sp, _ = pipe_sp(frames)
    np.testing.assert_allclose(a_sp, a_ref, atol=1e-6)
    np.testing.assert_allclose(m_sp, m_ref, atol=1e-6)

    # non-bucket length: Tp=16 > T=10, so zero-masked replicate-pad frames
    # land mid-shard on the model=4 time axis (the common production case —
    # pad boundary splitting a shard, masked BiLSTM under uneven validity)
    frames10 = rng.random((10, 64, 64)).astype(np.float32)
    a_ref10, m_ref10, _ = pipe(frames10)
    a_sp10, m_sp10, _ = pipe_sp(frames10)
    np.testing.assert_allclose(a_sp10, a_ref10, atol=1e-6)
    np.testing.assert_allclose(m_sp10, m_ref10, atol=1e-6)

    # 2D: batch over "data" AND time over "model" in one program
    videos = [rng.random((8, 64, 64)).astype(np.float32) for _ in range(4)]
    a_refs, m_refs = pipe.infer_batch(videos)
    a_sps, m_sps = pipe_sp.infer_batch(videos)
    for ar, am, mr, mm in zip(a_refs, a_sps, m_refs, m_sps):
        np.testing.assert_allclose(am, ar, atol=1e-6)
        np.testing.assert_allclose(mm, mr, atol=1e-6)

    # the on-device uint8 z-score->minmax normalisation runs frame-sharded
    u8 = (rng.random((16, 64, 64)) * 255).astype(np.uint8)
    pipe_u8 = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8,
        input_norm="zscore_minmax",
    )
    pipe_u8_sp = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8,
        input_norm="zscore_minmax", mesh=mesh, sequence_parallel=True,
    )
    np.testing.assert_allclose(
        pipe_u8_sp.infer_audio(u8), pipe_u8.infer_audio(u8), atol=1e-6
    )

    # contract errors
    with pytest.raises(ValueError, match="requires a mesh"):
        VideoToSpeechPipeline(
            acoustic, variables, gen, gen_params, scaler,
            sequence_parallel=True,
        )
    with pytest.raises(ValueError, match="monolithic"):
        VideoToSpeechPipeline(
            acoustic, variables, gen, gen_params, scaler,
            mesh=mesh, sequence_parallel=True, streaming=True,
        )
    with pytest.raises(ValueError, match="mesh"):
        from jax.sharding import Mesh

        VideoToSpeechPipeline(
            acoustic, variables, gen, gen_params, scaler,
            mesh=Mesh(np.array(jax.devices()), ("data",)),
            sequence_parallel=True,
        )


def test_pipeline_sequence_parallel_indivisible_bucket(tiny_setup):
    """frame_bucket not divisible by the model axis: time pads up to
    lcm(bucket, M) so the frame upload still SHARDS over "model" instead of
    silently replicating M x the bytes over the link (the regression mode
    `_put_input`'s divisibility fallback would otherwise hit on every
    request), and outputs stay exact vs single-device."""
    from mri2speech_tpu.parallel.mesh import make_mesh

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(31)
    mesh = make_mesh(2, 4)
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=6
    )
    pipe_sp = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=6,
        mesh=mesh, sequence_parallel=True,
    )
    assert pipe_sp._time_multiple == 12  # lcm(6, 4)

    frames = rng.random((10, 64, 64)).astype(np.float32)
    f, mask = pipe_sp.prepare_inputs(frames)
    assert f.shape[1] % 4 == 0
    put = pipe_sp._put_input(f, time_axis=1)
    assert put.sharding.spec[1] == "model"  # genuinely time-sharded upload

    # both pipelines pad T=10 -> 12 here, so audio is comparable end-to-end
    a_ref, m_ref, _ = pipe(frames)
    a_sp, m_sp, _ = pipe_sp(frames)
    np.testing.assert_allclose(m_sp, m_ref, atol=1e-6)
    np.testing.assert_allclose(a_sp, a_ref, atol=1e-6)

    # exact per-length mode (bucket=1): seq-parallel pads 10 -> 12 while the
    # single-device run stays at 10 — mels at valid frames are mask-exact
    pipe1 = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=1
    )
    pipe1_sp = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=1,
        mesh=mesh, sequence_parallel=True,
    )
    assert pipe1_sp._time_multiple == 4
    a1, m1, _ = pipe1(frames)
    a1_sp, m1_sp, _ = pipe1_sp(frames)
    np.testing.assert_allclose(m1_sp, m1, atol=1e-6)
    assert a1_sp.shape == a1.shape  # trimmed to T*hop despite the pad

    # bypassing the product paths with a non-divisible time dim warns
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        pipe1_sp._put_input(np.zeros((1, 10, 1, 64, 64), np.float32), time_axis=1)
    assert any("not divisible" in str(w.message) for w in rec)


def test_infer_batch_mixed_dtype_promotes(tiny_setup):
    """uint8 and float32 frames co-batched under "zscore_minmax" promote the
    batch buffer to float32 — exact, since the per-frame z-score is
    affine-invariant — instead of truncating the float frames into a uint8
    buffer (garbage audio behind an HTTP 200 through the daemon)."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(37)
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8,
        input_norm="zscore_minmax",
    )
    v8 = (rng.random((8, 64, 64)) * 255).astype(np.uint8)
    vf = rng.random((8, 64, 64)).astype(np.float32)

    a_mixed, m_mixed = pipe.infer_batch([v8, vf])
    (a8,), (m8,) = pipe.infer_batch([v8])
    (af,), (mf,) = pipe.infer_batch([vf])
    np.testing.assert_allclose(m_mixed[0], m8, atol=1e-6)
    np.testing.assert_allclose(m_mixed[1], mf, atol=1e-6)
    np.testing.assert_allclose(a_mixed[0], a8, atol=1e-6)
    np.testing.assert_allclose(a_mixed[1], af, atol=1e-6)


def test_pipeline_streaming_matches_monolithic(tiny_setup):
    """Chunked-upload streaming mode is bit-identical to the fused dispatch
    (the CNN is frame-wise, so per-block evaluation is exact), and the
    audio-only serving fetch returns the same waveform."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(4)
    frames = (rng.random((13, 64, 64)) * 255).astype(np.uint8)

    mono = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler,
        frame_bucket=4, input_norm="zscore_minmax",
    )
    stream = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler,
        frame_bucket=4, input_norm="zscore_minmax", streaming=True,
    )
    a1, m1, l1 = mono(frames)
    a2, m2, l2 = stream(frames)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(stream.infer_audio(frames), a2)


def test_pipeline_timed_run(tiny_setup):
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    pipe = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )
    frames = np.random.default_rng(1).random((8, 64, 64)).astype(np.float32)
    audio, stats = pipe.timed_run(frames)
    assert stats["rtf"] > 0 and np.isfinite(stats["rtf"])
    assert stats["frames"] == 8


def test_predicted_mel_exporter_bridge(tiny_setup):
    from mri2speech_tpu.infer.export_mels import PredictedMelExporter

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    exporter = PredictedMelExporter(acoustic, variables, scaler)
    mri = np.random.default_rng(2).random((6, 64, 64)).astype(np.float32)
    mel_log = exporter.export(mri)
    assert mel_log.shape == (64, 6)

    # must equal acoustic forward -> denorm -> dB->ln-power bridge
    pred = np.asarray(
        acoustic.apply(variables, jnp.asarray(mri[None, :, None]), train=False)
    )[0]
    mel_db = pred * scaler.std + scaler.mean
    expected = np.log(np.maximum(np.power(10.0, mel_db / 10.0), 1e-5)).T
    np.testing.assert_allclose(mel_log, expected, atol=2e-4, rtol=1e-4)


def test_groundtruth_mel_bridge_matches_numpy():
    from mri2speech_tpu.infer.export_mels import convert_mel_db_to_log_power

    mel_db = np.random.default_rng(0).uniform(-80, 10, (12, 64)).astype(np.float32)
    out = convert_mel_db_to_log_power(mel_db)
    expected = np.log(np.maximum(np.power(10.0, mel_db / 10.0), 1e-5)).T
    assert out.shape == (64, 12)
    np.testing.assert_allclose(out, expected, atol=1e-5)
    with pytest.raises(ValueError):
        convert_mel_db_to_log_power(mel_db[None])


def test_copy_synthesis_and_mel_inference_cli(tmp_path, tiny_setup):
    from mri2speech_tpu.data.audio_io import write_wav
    from mri2speech_tpu.infer.copy_synthesis import run_copy_synthesis
    from mri2speech_tpu.infer.mel_inference import run_mel_inference
    from mri2speech_tpu.train import checkpoint as ckpt_io

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    # save an UNFOLDED generator checkpoint (training format)
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 4)))["params"]
    ckpt_dir = tmp_path / "cp"
    ckpt_dir.mkdir()
    ckpt_io.save_checkpoint(str(ckpt_dir / "g_00000001"), {"generator": jax.device_get(params_wn)})
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(h, f)

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sr = h["sampling_rate"]
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    write_wav(str(wav_dir / "tone.wav"), sr, wav)

    out_dir = tmp_path / "gen"
    run_copy_synthesis(str(wav_dir), str(out_dir), str(ckpt_dir / "g_00000001"))
    assert (out_dir / "tone_generated.wav").is_file()

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    np.save(mel_dir / "m1.npy", np.random.default_rng(0).standard_normal((64, 9)).astype(np.float32))
    out2 = tmp_path / "gen2"
    run_mel_inference(str(mel_dir), str(out2), str(ckpt_dir / "g_00000001"))
    produced = out2 / "m1_generated_e2e.wav"
    assert produced.is_file()
    from mri2speech_tpu.data.audio_io import load_wav

    data, rate = load_wav(str(produced))
    assert rate == sr and len(data) == 9 * 420


def test_gradcam_bands_and_heatmaps(tiny_setup):
    from mri2speech_tpu.interpret.gradcam import compute_gradcam, parse_band_arguments

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    bands = parse_band_arguments(None, 64, 11413, 0.0, 8000.0)
    assert set(bands) == {"F1", "F2"}
    assert bands["F1"].min() >= 0 and bands["F2"].max() < 64
    custom = parse_band_arguments(["X:100-500"], 64, 11413, 0.0, 8000.0)
    assert "X" in custom
    with pytest.raises(ValueError):
        parse_band_arguments(["bad"], 64, 11413, 0.0, 8000.0)
    with pytest.raises(ValueError):
        parse_band_arguments(["Y:900-300"], 64, 11413, 0.0, 8000.0)

    frames = np.random.default_rng(3).random((5, 64, 64)).astype(np.float32)
    out = compute_gradcam(
        acoustic, variables, frames, scaler.mean, scaler.std, bands["F1"],
        frame_indices=[0, 3],
    )
    assert out.heatmaps.shape == (5, 64, 64)
    assert out.heatmaps.min() >= 0.0 and out.heatmaps.max() <= 1.0 + 1e-6
    assert set(out.per_frame) == {0, 3}
    assert out.per_frame[3].shape == (64, 64)

    # the vmapped multi-frame program must match per-index runs exactly, and
    # a precomputed shared feature map must not change any output
    from mri2speech_tpu.interpret.gradcam import compute_cnn_features

    feats = compute_cnn_features(acoustic, variables, frames)
    out_shared = compute_gradcam(
        acoustic, variables, frames, scaler.mean, scaler.std, bands["F1"],
        frame_indices=[0, 3], feats=feats,
    )
    np.testing.assert_allclose(out_shared.heatmaps, out.heatmaps, atol=1e-6)
    for idx in (0, 3):
        single = compute_gradcam(
            acoustic, variables, frames, scaler.mean, scaler.std, bands["F1"],
            frame_indices=[idx], feats=feats,
        )
        np.testing.assert_allclose(
            single.per_frame[idx], out.per_frame[idx], atol=1e-6
        )

    # the jitted CAM programs must be cached across calls and across BANDS
    # (fixed-shape band mask; per-call jit closures retraced the full model
    # every invocation — the 22 s/band regression fixed in round 3)
    from mri2speech_tpu.interpret.gradcam import _cam_programs

    p1 = _cam_programs(acoustic, "mean", 1, 5, (64, 64))
    p2 = _cam_programs(acoustic, "mean", 1, 5, (64, 64))
    assert p1[0] is p2[0] and p1[1] is p2[1]
    out_f2 = compute_gradcam(
        acoustic, variables, frames, scaler.mean, scaler.std, bands["F2"],
        frame_indices=[0], feats=feats,
    )  # different band, same programs — must not error or retrace
    assert out_f2.heatmaps.shape == (5, 64, 64)


def test_masking_presets_and_custom(tmp_path):
    from mri2speech_tpu.interpret.masking import (
        LIP_MASK,
        TONGUE_MASK,
        apply_mask_to_frames,
        build_mask,
        parse_custom_points,
    )

    poly = LIP_MASK.scaled((256, 256))
    mask = build_mask((256, 256), poly, alpha=0.1, blur_kernel=11)
    assert mask.shape == (256, 256)
    assert mask.min() >= 0.1 - 1e-6 and mask.max() <= 1.0
    # interior attenuated, far corner untouched
    assert mask[120, 25] < 0.2
    assert mask[250, 250] == 1.0

    # scaling to another size
    poly_small = TONGUE_MASK.scaled((128, 128))
    assert poly_small.max() <= 128.0

    frames = np.ones((3, 256, 256), dtype=np.float32)
    masked = apply_mask_to_frames(frames, mask)
    assert masked.shape == frames.shape
    assert masked[0, 120, 25] < 0.2

    pts = parse_custom_points(["10,10", "50,10", "30,40"])
    assert len(pts) == 3
    with pytest.raises(ValueError):
        parse_custom_points(["10,10", "50,10"])
    with pytest.raises(ValueError):
        parse_custom_points(["10"])


def test_eval_mel_metrics(tiny_setup):
    from mri2speech_tpu.eval.eval_mel import evaluate, mcd_like, simple_masked_loss

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 6, 64)).astype(np.float32)
    tgt = rng.standard_normal((2, 6, 64)).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.float32)
    loss, mse, mae = simple_masked_loss(pred, tgt, mask)
    # reference semantics: denominator is the VALID FRAME count (mask.sum()),
    # not the element count (`eval_mel.py:24-32`)
    ref_mse = ((pred - tgt) ** 2).sum() / mask.sum()
    np.testing.assert_allclose(mse, ref_mse, rtol=1e-5)
    np.testing.assert_allclose(loss, 0.8 * mse + 0.2 * mae, rtol=1e-6)

    mean = np.full((1, 64), -30.0, dtype=np.float32)
    std = np.full((1, 64), 4.0, dtype=np.float32)
    val = mcd_like(pred[0], tgt[0], mean, std)
    assert val is not None and np.isfinite(val) and val > 0
    assert mcd_like(pred[0], pred[0], mean, std) == pytest.approx(0.0, abs=1e-4)
    assert mcd_like(pred[0], tgt[0], None, None) is None

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    loader = [
        {
            "mri": rng.random((2, 4, 1, 64, 64)).astype(np.float32),
            "mel": rng.standard_normal((2, 4, 64)).astype(np.float32),
            "mask": np.ones((2, 4), dtype=np.float32),
        }
    ]
    res = evaluate(acoustic, variables, loader, stats={"mean": scaler.mean, "std": scaler.std})
    assert {"loss", "mse", "mae", "mcd_like"} <= set(res)


def test_eval_mel_masks_model_forward(tiny_setup):
    """evaluate() must feed the mask into the MODEL, not only the loss: the
    BiLSTM's backward direction otherwise propagates padded-frame CNN
    features into every real frame, corrupting the metrics on padded
    batches. Metrics over a padded batch must equal the unpadded run."""
    from mri2speech_tpu.eval.eval_mel import evaluate

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(3)
    mri = rng.random((2, 4, 1, 64, 64)).astype(np.float32)
    mel = rng.standard_normal((2, 4, 64)).astype(np.float32)
    base = evaluate(
        acoustic, variables,
        [{"mri": mri, "mel": mel, "mask": np.ones((2, 4), np.float32)}],
    )
    # pad 3 junk frames; mask marks them invalid
    mri_p = np.concatenate([mri, 7 * np.ones((2, 3, 1, 64, 64), np.float32)], axis=1)
    mel_p = np.concatenate([mel, np.zeros((2, 3, 64), np.float32)], axis=1)
    mask_p = np.concatenate(
        [np.ones((2, 4), np.float32), np.zeros((2, 3), np.float32)], axis=1
    )
    padded = evaluate(acoustic, variables, [{"mri": mri_p, "mel": mel_p, "mask": mask_p}])
    for k in ("loss", "mse", "mae"):
        np.testing.assert_allclose(padded[k], base[k], rtol=1e-4)


def test_vardataset(tmp_path):
    from mri2speech_tpu.data.vardataset import MRIMelDataset, collate_pad

    rng = np.random.default_rng(0)
    for stem, T in (("a", 10), ("b", 7)):
        np.save(tmp_path / f"{stem}_video.npy", rng.random((T, 16, 16)).astype(np.float32))
        np.save(tmp_path / f"{stem}_audio.npy", rng.random((T + 1, 64)).astype(np.float32))
    ds = MRIMelDataset(str(tmp_path))
    assert len(ds) == 2
    item = ds[0]
    assert item["mri"].shape == (10, 1, 16, 16)  # trimmed to common T
    assert item["mel"].shape == (10, 64)

    batch = collate_pad([ds[0], ds[1]])
    assert batch["mri"].shape == (2, 10, 1, 16, 16)
    assert batch["mask"][1, 7:].sum() == 0  # padded region masked out
    # replication padding: padded frames equal the last real frame
    np.testing.assert_array_equal(batch["mri"][1, 9], batch["mri"][1, 6])

    ds_fixed = MRIMelDataset(str(tmp_path), sequence_length=8)
    item = ds_fixed[0]
    assert item["mri"].shape == (8, 1, 16, 16)
    item_b = ds_fixed[1]
    assert item_b["mask"].sum() == 7  # 7 valid + 1 padded


def test_build_pipeline_from_checkpoints_roundtrip(tmp_path, tiny_setup):
    """The CLI path: checkpoint files on disk -> pipeline -> audio."""
    import json as _json

    from mri2speech_tpu.infer.pipeline import build_pipeline_from_checkpoints
    from mri2speech_tpu.train import checkpoint as ckpt_io

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    ckpt_io.save_checkpoint(
        str(tmp_path / "acoustic.ckpt"),
        {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        },
    )
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 4)))["params"]
    ckpt_io.save_checkpoint(
        str(tmp_path / "g_00000001"), {"generator": jax.device_get(params_wn)}
    )
    scaler.save(tmp_path / "scaler.json")
    (tmp_path / "config.json").write_text(_json.dumps(h))

    pipe = build_pipeline_from_checkpoints(
        str(tmp_path / "acoustic.ckpt"), str(tmp_path / "scaler.json"),
        str(tmp_path / "config.json"), str(tmp_path / "g_00000001"),
        rnn_hidden=16, frame_bucket=8, cnn_spec=TINY_SPEC, cnn_stem=8,
    )
    frames = np.random.default_rng(9).random((6, 64, 64)).astype(np.float32)
    audio, mel_db, _ = pipe(frames)
    assert audio.shape == (6 * 420,)
    assert np.all(np.isfinite(audio))


def test_build_pipeline_quantized_close_to_exact(tmp_path, tiny_setup):
    """--int8 serving mode: same pipeline surface, bounded waveform delta."""
    import json as _json

    from mri2speech_tpu.infer.pipeline import build_pipeline_from_checkpoints
    from mri2speech_tpu.train import checkpoint as ckpt_io

    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    ckpt_io.save_checkpoint(
        str(tmp_path / "acoustic.ckpt"),
        {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        },
    )
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 4)))["params"]
    ckpt_io.save_checkpoint(
        str(tmp_path / "g_00000001"), {"generator": jax.device_get(params_wn)}
    )
    scaler.save(tmp_path / "scaler.json")
    (tmp_path / "config.json").write_text(_json.dumps(h))

    kw = dict(
        rnn_hidden=16, frame_bucket=8, cnn_spec=TINY_SPEC, cnn_stem=8,
    )
    paths = (
        str(tmp_path / "acoustic.ckpt"), str(tmp_path / "scaler.json"),
        str(tmp_path / "config.json"), str(tmp_path / "g_00000001"),
    )
    pipe_f = build_pipeline_from_checkpoints(*paths, **kw)
    pipe_q = build_pipeline_from_checkpoints(*paths, quantize=True, **kw)
    frames = np.random.default_rng(9).random((6, 64, 64)).astype(np.float32)
    audio_f, _, _ = pipe_f(frames)
    audio_q, _, _ = pipe_q(frames)
    assert audio_q.shape == audio_f.shape
    assert np.all(np.isfinite(audio_q))
    rel = np.linalg.norm(audio_q - audio_f) / (np.linalg.norm(audio_f) + 1e-12)
    assert rel < 0.05, rel
