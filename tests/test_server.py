"""Serving daemon tests: dynamic batching semantics + the HTTP protocol.

Runs the real ThreadingHTTPServer on an ephemeral port with the tiny model
stack (CPU). A serving surface the reference lacks entirely — the contract
under test is ours: batched dispatches are exact per request, errors come
back as HTTP 400 without killing the worker, and `batch_multiple` keeps
the compiled-program count at one per length bucket.
"""
import http.client
import io
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.infer.server import BatchingInferenceServer, serve, wav_bytes
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.scaler import MelScaler

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
)


def _tiny_stack():
    """One construction site for the tiny model stack every daemon test
    builds pipelines from (fixture + the mesh/sequence-parallel variants)."""
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
    return acoustic, variables, gen, gen_params, scaler


@pytest.fixture(scope="module")
def tiny_pipeline():
    acoustic, variables, gen, gen_params, scaler = _tiny_stack()
    return VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )


def test_infer_batch_batch_multiple(tiny_pipeline):
    """Dummy-row padding to a batch multiple leaves real outputs exact."""
    rng = np.random.default_rng(3)
    videos = [rng.random((8, 32, 32)).astype(np.float32) for _ in range(3)]
    a_ref, m_ref = tiny_pipeline.infer_batch(videos)
    a_pad, m_pad = tiny_pipeline.infer_batch(videos, batch_multiple=4)
    assert len(a_pad) == len(a_ref) == 3
    for ar, ap, mr, mp in zip(a_ref, a_pad, m_ref, m_pad):
        np.testing.assert_allclose(ap, ar, atol=1e-6)
        np.testing.assert_allclose(mp, mr, atol=1e-6)


def test_batching_server_exactness_and_fusion(tiny_pipeline):
    """Concurrent requests share a dispatch and return per-request-exact
    audio; the stats confirm the fusion actually happened."""
    rng = np.random.default_rng(5)
    videos = [rng.random((8, 32, 32)).astype(np.float32) for _ in range(4)]
    # warm the (batch_multiple, Tp) program so the window isn't consumed
    # by a multi-second CPU compile before companions can arrive
    tiny_pipeline.infer_batch(videos, batch_multiple=4)

    server = BatchingInferenceServer(
        tiny_pipeline, max_batch=4, batch_window_ms=2000.0, batch_multiple=4
    )
    try:
        results = [None] * 4

        def call(i):
            results[i] = server.synthesize(videos[i], timeout=120)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        a_ref, m_ref = tiny_pipeline.infer_batch(videos, batch_multiple=4)
        batched_with = set()
        for i, (audio, mel, n_batched) in enumerate(results):
            np.testing.assert_allclose(audio, a_ref[i], atol=1e-6)
            np.testing.assert_allclose(mel, m_ref[i], atol=1e-6)
            batched_with.add(n_batched)
        stats = server.stats()
        assert stats["requests_served"] == 4
        # the 2 s window must have fused at least some of the 4 requests
        assert stats["batches_dispatched"] < 4
        assert max(batched_with) > 1

        with pytest.raises(ValueError):
            server.synthesize(rng.random((8, 32)).astype(np.float32))
    finally:
        server.shutdown()


def test_http_server_end_to_end(tiny_pipeline):
    rng = np.random.default_rng(9)
    frames = rng.random((8, 32, 32)).astype(np.float32)
    httpd = serve(tiny_pipeline, sr=11413, port=0, max_batch=2,
                  batch_window_ms=1.0, batch_multiple=2)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        np.save(buf, frames)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/synthesize", body=buf.getvalue())
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        assert resp.getheader("X-Frames") == "8"
        assert int(resp.getheader("X-Audio-Samples")) == 8 * 420

        a_ref, _ = tiny_pipeline.infer_batch([frames], batch_multiple=2)
        assert body == wav_bytes(a_ref[0], 11413)

        # health endpoint reflects the served request
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["requests_served"] == 1

        # malformed body -> 400, worker survives
        conn.request("POST", "/synthesize", body=b"not an npy")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        # wrong rank -> 400 with the ValueError message
        bad = io.BytesIO()
        np.save(bad, frames[0])
        conn.request("POST", "/synthesize", body=bad.getvalue())
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"ValueError" in resp.read()

        # server still serves after the errors
        conn.request("POST", "/synthesize", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        conn.close()
    finally:
        httpd.shutdown()
        httpd.inference.shutdown()
        httpd.server_close()


# -- online streaming sessions (/stream protocol) ---------------------------

@pytest.fixture(scope="module")
def tiny_online(tiny_pipeline):
    from mri2speech_tpu.infer.online import OnlineVideoToSpeech

    return OnlineVideoToSpeech.from_pipeline(
        tiny_pipeline, chunk=4, lookahead=4
    )


def test_fork_sessions_isolated_and_exact(tiny_online):
    """Interleaved forked sessions emit exactly what two solo runs emit —
    shared compiled programs, independent stream state."""
    rng = np.random.default_rng(21)
    va = rng.random((12, 32, 32)).astype(np.float32)
    vb = rng.random((12, 32, 32)).astype(np.float32)

    def solo(video):
        e = tiny_online.fork()
        parts = [e.push(video[i : i + 4])[0] for i in range(0, 12, 4)]
        parts.append(e.flush()[0])
        return np.concatenate(parts)

    ref_a, ref_b = solo(va), solo(vb)

    ea, eb = tiny_online.fork(), tiny_online.fork()
    out_a, out_b = [], []
    for i in range(0, 12, 4):  # interleave pushes between the two streams
        out_a.append(ea.push(va[i : i + 4])[0])
        out_b.append(eb.push(vb[i : i + 4])[0])
    out_a.append(ea.flush()[0])
    out_b.append(eb.flush()[0])
    np.testing.assert_array_equal(np.concatenate(out_a), ref_a)
    np.testing.assert_array_equal(np.concatenate(out_b), ref_b)


def test_stream_http_protocol(tiny_pipeline, tiny_online):
    """start -> push xN -> finish over real HTTP: concatenated PCM equals a
    direct engine run; bad sessions 404; the session limit returns 429."""
    httpd = serve(tiny_pipeline, sr=11413, port=0, max_batch=2,
                  batch_window_ms=1.0, online=tiny_online, max_sessions=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(31)
        video = rng.random((10, 32, 32)).astype(np.float32)

        e = tiny_online.fork()
        ref = [e.push(video[:4])[0], e.push(video[4:])[0], e.flush()[0]]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/stream/start")
        resp = conn.getresponse()
        info = json.loads(resp.read())
        assert resp.status == 200
        assert info["chunk"] == 4 and info["sampling_rate"] == 11413
        sid = info["session"]

        got = []
        for chunk in (video[:4], video[4:]):
            buf = io.BytesIO()
            np.save(buf, chunk)
            conn.request("POST", f"/stream/{sid}/push", body=buf.getvalue())
            resp = conn.getresponse()
            body = resp.read()
            assert resp.status == 200
            assert len(body) == 4 * int(resp.getheader("X-Audio-Samples"))
            got.append(np.frombuffer(body, dtype="<f4"))
        conn.request("POST", f"/stream/{sid}/finish")
        resp = conn.getresponse()
        got.append(np.frombuffer(resp.read(), dtype="<f4"))
        assert resp.status == 200
        np.testing.assert_array_equal(
            np.concatenate(got), np.concatenate(ref)
        )
        assert np.concatenate(got).shape == (10 * 420,)

        def roundtrip(method, path, body=None):
            conn.request(method, path, body=body)
            resp = conn.getresponse()
            return resp.status, resp.read()

        # finished session is gone (valid body: the 404 is the session)
        buf = io.BytesIO()
        np.save(buf, video[:4])
        assert roundtrip("POST", f"/stream/{sid}/push", buf.getvalue())[0] == 404
        # malformed body -> 400
        assert roundtrip("POST", f"/stream/{sid}/push", b"junk")[0] == 400

        # healthz shows the stream gauge
        assert json.loads(roundtrip("GET", "/healthz")[1])["active_streams"] == 0

        # session limit -> 429; abort frees a slot
        sids = [
            json.loads(roundtrip("POST", "/stream/start")[1])["session"]
            for _ in range(2)
        ]
        assert roundtrip("POST", "/stream/start")[0] == 429
        assert roundtrip("DELETE", f"/stream/{sids[0]}")[0] == 200
        assert roundtrip("POST", "/stream/start")[0] == 200
        # offline /synthesize still works alongside open sessions
        buf = io.BytesIO()
        np.save(buf, video[:8])
        assert roundtrip("POST", "/synthesize", buf.getvalue())[0] == 200
        conn.close()
    finally:
        httpd.shutdown()
        httpd.inference.shutdown()
        httpd.server_close()


def test_daemon_over_mesh_pipeline():
    """The batching daemon composes with a mesh-sharded pipeline: concurrent
    requests batch, shard over the 8-device data axis, and stay per-request
    exact vs the single-device pipeline."""
    from mri2speech_tpu.parallel.mesh import make_mesh

    # rebuild the tiny stack on a mesh (params replicated, batch sharded)
    acoustic, variables, gen, gen_params, scaler = _tiny_stack()
    mesh = make_mesh(n_data=8)
    pipe_mesh = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8, mesh=mesh
    )
    pipe_solo = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )

    rng = np.random.default_rng(41)
    videos = [rng.random((8, 32, 32)).astype(np.float32) for _ in range(4)]
    pipe_mesh.infer_batch(videos, batch_multiple=4)  # warm before the window

    server = BatchingInferenceServer(
        pipe_mesh, max_batch=4, batch_window_ms=2000.0, batch_multiple=4
    )
    try:
        results = [None] * 4

        def call(i):
            results[i] = server.synthesize(videos[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        a_ref, m_ref = pipe_solo.infer_batch(videos, batch_multiple=4)
        for i, (audio, mel, _n) in enumerate(results):
            np.testing.assert_allclose(audio, a_ref[i], atol=1e-5)
            np.testing.assert_allclose(mel, m_ref[i], atol=1e-5)
        assert server.stats()["batches_dispatched"] < 4
    finally:
        server.shutdown()


def test_daemon_over_sequence_parallel_pipeline():
    """The batching daemon composes with sequence-parallel serving (time axis
    over "model", batch over "data" on a 2x4 mesh): the two requests coalesce
    into ONE B=2 sequence-parallel dispatch and stay per-request exact."""
    from mri2speech_tpu.parallel.mesh import make_mesh

    acoustic, variables, gen, gen_params, scaler = _tiny_stack()
    pipe_sp = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8,
        mesh=make_mesh(2, 4), sequence_parallel=True,
    )
    pipe_solo = VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )

    rng = np.random.default_rng(43)
    videos = [rng.random((8, 32, 32)).astype(np.float32) for _ in range(2)]
    # warm the (2, Tp) program so the batching window isn't consumed by a
    # multi-second CPU compile before the second request can arrive
    pipe_sp.infer_batch(videos, batch_multiple=2)
    server = BatchingInferenceServer(
        pipe_sp, max_batch=2, batch_window_ms=2000.0, batch_multiple=2
    )
    try:
        results = [None] * 2

        def call(i):
            results[i] = server.synthesize(videos[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        a_ref, m_ref = pipe_solo.infer_batch(videos, batch_multiple=2)
        for i, (audio, mel, _n) in enumerate(results):
            np.testing.assert_allclose(audio, a_ref[i], atol=1e-5)
            np.testing.assert_allclose(mel, m_ref[i], atol=1e-5)
        # prove the composition actually happened: both requests in one
        # sequence-parallel batch, not two padded batch-of-1 dispatches
        assert server.stats()["batches_dispatched"] == 1
    finally:
        server.shutdown()


def test_metrics_endpoint(tiny_pipeline):
    """GET /metrics: Prometheus text format with consistent counters and a
    cumulative latency histogram that accounts for every request."""
    rng = np.random.default_rng(51)
    frames = rng.random((8, 32, 32)).astype(np.float32)
    httpd = serve(tiny_pipeline, sr=11413, port=0, max_batch=2,
                  batch_window_ms=1.0, batch_multiple=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        buf = io.BytesIO()
        np.save(buf, frames)
        for _ in range(3):
            conn.request("POST", "/synthesize", body=buf.getvalue())
            r = conn.getresponse()
            r.read()
            assert r.status == 200
        # one failure (bad rank) must count as failed, not served
        bad = io.BytesIO()
        np.save(bad, frames[0])
        conn.request("POST", "/synthesize", body=bad.getvalue())
        conn.getresponse().read()

        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        text = resp.read().decode()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/plain")
        metrics = {}
        for line in text.splitlines():
            if line.startswith("#") or not line:
                continue
            key, val = line.rsplit(" ", 1)
            metrics[key] = float(val)
        assert metrics["m2s_requests_served_total"] == 3
        assert metrics["m2s_requests_failed_total"] == 1
        assert metrics["m2s_request_latency_seconds_count"] == 3
        assert metrics['m2s_request_latency_seconds_bucket{le="+Inf"}'] == 3
        assert metrics["m2s_request_latency_seconds_sum"] > 0
        # histogram buckets are cumulative (monotone nondecreasing)
        cums = [v for k, v in metrics.items()
                if k.startswith("m2s_request_latency_seconds_bucket")]
        assert cums == sorted(cums)
        conn.close()
    finally:
        httpd.shutdown()
        httpd.inference.shutdown()
        httpd.server_close()
