"""LSGAN + feature-matching losses (`models.py:274-311`), as pure functions."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_loss(fmap_r: Sequence[Sequence[Array]], fmap_g: Sequence[Sequence[Array]]) -> Array:
    """L1 feature matching, summed over all maps, x2 (`models.py:274-286`).

    Shapes always agree here because both branches run the same graph; the
    reference's trim-to-min is therefore a no-op retained upstream of this call.
    """
    loss = jnp.float32(0.0)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(
    disc_real_outputs: Sequence[Array], disc_generated_outputs: Sequence[Array]
) -> Tuple[Array, List[Array], List[Array]]:
    """LSGAN D loss: (1-D(y))^2 + D(y_hat)^2 (`models.py:289-300`)."""
    loss = jnp.float32(0.0)
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g_loss = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: Sequence[Array]) -> Tuple[Array, List[Array]]:
    """LSGAN G loss: (1-D(y_hat))^2 (`models.py:303-311`)."""
    loss = jnp.float32(0.0)
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
