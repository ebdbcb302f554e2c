"""Probe: can jax.export shape-polymorphism cover the fused serving program?

Question: instead of a (batch, frames) program GRID, can one exported
program with a symbolic time dimension serve every video length (and a
symbolic batch dim every request count)? The fused program contains a
lax.scan over time (BiLSTM), conv-transposes with length-dependent output
shapes (generator), and reductions over the padded axis — all of which
shape polymorphism must trace with symbolic dimension arithmetic.

Verdict is printed per variant; failures print the exporter's error. Run on
CPU (tiny models) — polymorphism support is a tracing property, not a
backend property.
"""
from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

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
)


def tiny_pipeline():
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
        mean=np.zeros(64, dtype=np.float32), std=np.ones(64, dtype=np.float32)
    )
    return VideoToSpeechPipeline(
        acoustic, variables, gen, gen_params, scaler, frame_bucket=8
    )


def try_export(pipe, sym: str, shape_fn):
    avars = jax.device_get(pipe.acoustic_variables)
    gparams = jax.device_get(pipe.generator_params)
    a_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), avars
    )
    g_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), gparams
    )
    scope = jax.export.SymbolicScope()
    try:
        f_shape, m_shape = shape_fn(scope)
        exp = jax.export.export(jax.jit(pipe._forward))(
            a_spec, g_spec,
            jax.ShapeDtypeStruct(f_shape, jnp.float32),
            jax.ShapeDtypeStruct(m_shape, jnp.float32),
        )
        blob = exp.serialize()
        exp2 = jax.export.deserialize(blob)
        call = jax.jit(exp2.call)
        rng = np.random.default_rng(0)
        outs = []
        for t in (8, 16):
            fb = rng.random((1, t, 1, 32, 32)).astype(np.float32)
            mb = np.ones((1, t), dtype=np.float32)
            a, m, _ = call(avars, gparams, fb, mb)
            ref_a, ref_m, _ = pipe._fn(avars, gparams, fb, mb)
            outs.append(
                (t, float(np.abs(np.asarray(a) - np.asarray(ref_a)).max()),
                 float(np.abs(np.asarray(m) - np.asarray(ref_m)).max()))
            )
        print(f"[{sym}] OK  serialized={len(blob)}B  "
              + "  ".join(f"T={t}: a_err={ae:.2e} m_err={me:.2e}"
                          for t, ae, me in outs))
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:300]
        print(f"[{sym}] FAIL: {type(e).__name__}: {msg}")
        if "--trace" in sys.argv:
            traceback.print_exc()
        return False


def main() -> None:
    pipe = tiny_pipeline()

    def sym_time(scope):
        # time dim symbolic, constrained to multiples of the frame bucket so
        # scan/conv length arithmetic stays integral
        (t,) = jax.export.symbolic_shape("8*b", scope=scope)
        return (1, t, 1, 32, 32), (1, t)

    def sym_batch_time(scope):
        n, t = jax.export.symbolic_shape("n, 8*b", scope=scope)
        return (n, t, 1, 32, 32), (n, t)

    ok_t = try_export(pipe, "symbolic time", sym_time)
    ok_bt = try_export(pipe, "symbolic batch+time", sym_batch_time)
    print(f"verdict: time={'OK' if ok_t else 'NO'} "
          f"batch+time={'OK' if ok_bt else 'NO'}")


if __name__ == "__main__":
    main()
