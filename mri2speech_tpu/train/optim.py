"""AdaBelief with reduced-precision moment storage (TPU HBM optimization).

The reference trains the vocoder GAN with torch AdaBelief
(`train.py:64-71`: betas 0.8/0.99, eps 1e-16, weight_decouple/rectify False).
`optax.adabelief` reproduces that math exactly (pinned by
`tests/test_train_vocoder.py`), but this optax version offers no dtype control
for the two moment trees — at ~85M discriminator+generator params, fp32
mu+nu is ~680 MB of HBM read+write per step on a step that already runs at
95.8% HBM utilisation (docs/BENCH_NOTES.md, round 2).

`scale_by_belief` here mirrors optax's transform (optax/_src/transform.py)
operand-for-operand, with one extension: `state_dtype` stores mu/nu in a
reduced dtype (bf16). All arithmetic runs in the gradient dtype (fp32) —
moments are cast up on entry and down on store, i.e. the only change vs optax
is a per-step bf16 quantisation of the moment accumulators. Params stay fp32
(master weights); only optimizer state shrinks.

With `state_dtype=None` the update is bit-identical to `optax.adabelief`
(asserted by `tests/test_train_vocoder.py::test_adabelief_matches_optax`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from optax._src import numerics


def scale_by_belief(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-16,
    eps_root: float = 1e-16,
    state_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """optax.scale_by_belief with optional reduced-dtype moment storage."""

    def _store(x):
        return x.astype(state_dtype) if state_dtype is not None else x

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype or p.dtype), params
        )
        return optax.ScaleByBeliefState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu=jax.tree.map(jnp.copy, zeros),
        )

    def update_fn(updates, state, params=None):
        del params
        # compute in the gradient dtype (fp32); store in state_dtype
        mu = jax.tree.map(
            lambda g, m: b1 * m.astype(g.dtype) + (1.0 - b1) * g, updates, state.mu
        )
        nu = jax.tree.map(
            lambda g, m, v: b2 * v.astype(g.dtype)
            + (1.0 - b2) * jnp.square(g - m)
            + eps_root,
            updates,
            mu,
            state.nu,
        )
        count_inc = numerics.safe_increment(state.count)
        mu_hat = optax.tree.bias_correction(mu, b1, count_inc)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        new_updates = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu_hat, nu_hat
        )
        return new_updates, optax.ScaleByBeliefState(
            count=count_inc,
            mu=jax.tree.map(_store, mu),
            nu=jax.tree.map(_store, nu),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adabelief(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-16,
    eps_root: float = 1e-16,
    state_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """AdaBelief (reference hyperparameters) with moment-dtype control."""
    return optax.chain(
        scale_by_belief(
            b1=b1, b2=b2, eps=eps, eps_root=eps_root, state_dtype=state_dtype
        ),
        optax.scale_by_learning_rate(learning_rate),
    )
