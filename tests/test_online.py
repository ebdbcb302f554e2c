"""Online streaming inference: receptive-field cone + exactness vs offline.

The contract under test (see `infer/online.py` module doc):
* `generator_receptive_field` bounds the TRUE dependency cone of the network;
* with lookahead >= stream length, online == offline exactly (except the
  final <=6 audio samples, conv_post's right-pad boundary);
* incremental pushes == one big push, bit-for-bit;
* finite lookahead degrades gracefully and the stream tail stays exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.infer.online import OnlineVideoToSpeech
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator, generator_receptive_field
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
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, 32, 32)), train=False
    )
    h = dict(default_vocoder_config(upsample_initial_channel=16))
    gen_wn = Generator(h=h)
    params_wn = gen_wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 4)))["params"]
    gen = Generator(h=h, use_weight_norm=False)
    gen_params = fold_weight_norm(jax.device_get(params_wn))
    scaler = MelScaler(
        mean=np.linspace(-40, -10, 64).astype(np.float32),
        std=np.full(64, 5.0, dtype=np.float32),
    )
    return acoustic, variables, gen, gen_params, scaler, h


def test_receptive_field_bounds_true_cone(tiny_setup):
    """Perturb one mel frame; every changed audio sample's frame index must
    lie within [t0 - right, t0 + left] — i.e. the computed cone is a valid
    upper bound on the architecture's actual dependencies."""
    _, _, gen, gen_params, _, h = tiny_setup
    left, right = generator_receptive_field(h)
    hop = int(np.prod(h["upsample_rates"]))
    T = left + right + 12
    t0 = left + 5
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 64, T)).astype(np.float32)
    base = np.asarray(gen.apply({"params": gen_params}, jnp.asarray(mel)))
    mel2 = mel.copy()
    mel2[:, :, t0] += 100.0  # large: the N(0,0.01)-init stack attenuates hard
    pert = np.asarray(gen.apply({"params": gen_params}, jnp.asarray(mel2)))
    changed = np.nonzero((base != pert)[0, 0])[0]  # ANY bitwise change counts
    assert changed.size > 0
    frames = changed // hop
    assert frames.min() >= t0 - right
    assert frames.max() <= t0 + left


@pytest.mark.parametrize("T", [40, 37])
def test_online_exact_with_full_lookahead(tiny_setup, T):
    """lookahead >= stream length: every backward window reaches the drain's
    masked tail, so online output == offline output exactly (forward carry,
    masked backward, and windowed generator are all exact); only the final
    <=6 audio samples (conv_post right-pad boundary) may differ."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(3)
    frames = rng.random((T, 32, 32)).astype(np.float32)

    offline = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=1
    )
    audio_ref, mel_ref, _ = offline(frames)

    online = OnlineVideoToSpeech(
        acoustic, variables, gen, gen_params, scaler, chunk=8, lookahead=T + 8
    )
    a1, m1 = online.push(frames)
    a2, m2 = online.flush()
    audio = np.concatenate([a1, a2])
    mel = np.concatenate([m1, m2], axis=0)

    assert mel.shape == mel_ref.shape
    assert audio.shape == audio_ref.shape
    np.testing.assert_allclose(mel, mel_ref, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(audio[:-6], audio_ref[:-6], atol=1e-5)


def test_online_incremental_equals_bulk(tiny_setup):
    """Frame-by-frame pushes produce bit-identical output to one big push."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(5)
    # long enough that audio must arrive mid-stream: the first emission waits
    # for K + r chunks = (l + 1 + g + r) * W = 40 frames at these settings
    frames = rng.random((60, 32, 32)).astype(np.float32)

    kw = dict(chunk=8, lookahead=8)
    bulk = OnlineVideoToSpeech(acoustic, variables, gen, gen_params, scaler, **kw)
    ab, mb = bulk.push(frames)
    ab2, mb2 = bulk.flush()
    audio_bulk = np.concatenate([ab, ab2])
    mel_bulk = np.concatenate([mb, mb2], axis=0)

    inc = OnlineVideoToSpeech(acoustic, variables, gen, gen_params, scaler, **kw)
    pieces_a, pieces_m = [], []
    for i in range(frames.shape[0]):
        a, m = inc.push(frames[i : i + 1])
        pieces_a.append(a)
        pieces_m.append(m)
    a, m = inc.flush()
    pieces_a.append(a)
    pieces_m.append(m)
    audio_inc = np.concatenate(pieces_a)
    mel_inc = np.concatenate([p for p in pieces_m if p.size], axis=0)

    np.testing.assert_array_equal(audio_inc, audio_bulk)
    np.testing.assert_array_equal(mel_inc, mel_bulk)

    # outputs stream with bounded latency: something must arrive mid-stream
    assert any(p.size for p in pieces_a[:-1])


def test_online_bounded_inflight_equals_unbounded(tiny_setup):
    """max_inflight_chunks (device-memory bound on bulk pushes) is purely a
    scheduling knob: a whole-video push with a tiny in-flight window is
    bit-identical to the unbounded default."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(7)
    frames = rng.random((80, 32, 32)).astype(np.float32)

    kw = dict(chunk=8, lookahead=8)
    ref = OnlineVideoToSpeech(acoustic, variables, gen, gen_params, scaler, **kw)
    a1, m1 = ref.push(frames)
    a2, m2 = ref.flush()

    # window of 2 chunks: the 80-frame push (10 chunks) crosses 4 group
    # boundaries, exercising the materialise-and-release path
    bounded = OnlineVideoToSpeech(
        acoustic, variables, gen, gen_params, scaler,
        max_inflight_chunks=2, **kw,
    )
    b1, n1 = bounded.push(frames)
    b2, n2 = bounded.flush()

    np.testing.assert_array_equal(np.concatenate([b1, b2]), np.concatenate([a1, a2]))
    np.testing.assert_array_equal(
        np.concatenate([n1, n2], axis=0), np.concatenate([m1, m2], axis=0)
    )


def test_online_finite_lookahead_tail_exact(tiny_setup):
    """With a finite lookahead the backward-LSTM is approximate mid-stream
    but EXACT for the final chunks (drain masks = the offline boundary), and
    more lookahead never increases the error."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(7)
    T, W = 56, 8
    frames = rng.random((T, 32, 32)).astype(np.float32)

    offline = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=1
    )
    _, mel_ref, _ = offline(frames)

    errs = {}
    for lk in (8, 32):
        online = OnlineVideoToSpeech(
            acoustic, variables, gen, gen_params, scaler, chunk=W, lookahead=lk
        )
        a1, m1 = online.push(frames)
        a2, m2 = online.flush()
        mel = np.concatenate([m1, m2], axis=0)
        assert mel.shape == mel_ref.shape
        assert np.all(np.isfinite(mel))
        errs[lk] = np.max(np.abs(mel - mel_ref))
        # chunks whose backward window reached the stream end are exact:
        # emission of chunk j uses frames through (j + r + 1) * W
        r = online.r
        exact_from = (T // W - r) * W
        np.testing.assert_allclose(
            mel[exact_from:], mel_ref[exact_from:], atol=1e-4, rtol=1e-5
        )
    assert errs[32] <= errs[8] + 1e-6


def test_online_uint8_zscore_matches_offline(tiny_setup):
    """from_pipeline inherits the pipeline's on-device input normalisation:
    raw uint8 frames through the online path == the offline uint8 pipeline
    (full lookahead)."""
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    rng = np.random.default_rng(11)
    T = 24
    frames = (rng.random((T, 32, 32)) * 255).astype(np.uint8)

    offline = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler,
        frame_bucket=1, input_norm="zscore_minmax",
    )
    audio_ref, mel_ref, _ = offline(frames)

    online = OnlineVideoToSpeech.from_pipeline(
        offline, chunk=8, lookahead=T + 8
    )
    assert online.input_norm == "zscore_minmax"
    a1, m1 = online.push(frames)
    a2, m2 = online.flush()
    audio = np.concatenate([a1, a2])
    mel = np.concatenate([m1, m2], axis=0)
    np.testing.assert_allclose(mel, mel_ref, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(audio[:-6], audio_ref[:-6], atol=1e-5)


def test_online_rejects_bad_inputs(tiny_setup):
    acoustic, variables, gen, gen_params, scaler, h = tiny_setup
    online = OnlineVideoToSpeech(
        acoustic, variables, gen, gen_params, scaler, chunk=8, lookahead=8
    )
    with pytest.raises(ValueError):
        online.push(np.zeros((4, 32)))
    online.push(np.zeros((4, 32, 32), np.float32))
    with pytest.raises(ValueError):
        online.push(np.zeros((4, 16, 16), np.float32))
    online.flush()
    with pytest.raises(RuntimeError):
        online.push(np.zeros((4, 32, 32), np.float32))
    # empty stream flush
    online2 = OnlineVideoToSpeech(
        acoustic, variables, gen, gen_params, scaler, chunk=8
    )
    a, m = online2.flush()
    assert a.size == 0 and m.size == 0
    assert online2.latency_frames == (online2.r + online2.g + 1) * 8
