"""Discriminator: MLP -> sigmoid on (flattened) latent vectors, optionally
concatenating the original x and/or an invariant label embedding.

Counterpart of reference gan.py:388-425.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .mlp import get_activation


class Discriminator(nn.Module):
    hidden_dim: int = 512
    n_layers: int = 5
    activation: str = "ReLU"
    activation_args: Sequence[float] = ()
    use_invariant_y: bool = False
    embed_y: bool = False
    y_classes: int = 2
    y_embed_dim: int = 16

    @nn.compact
    def __call__(self, z, y: Optional[jnp.ndarray] = None,
                 x: Optional[jnp.ndarray] = None):
        act = get_activation(self.activation, self.activation_args)
        z = z.reshape(z.shape[0], -1)
        if y is not None:
            if self.embed_y:
                y = nn.Embed(self.y_classes, self.y_embed_dim)(y)
            z = jnp.concatenate([z, y], axis=-1)
        if x is not None:
            z = jnp.concatenate([z, x.reshape(x.shape[0], -1)], axis=-1)
        h = nn.Dense(self.hidden_dim)(z)
        h = act(h)
        for _ in range(self.n_layers - 1):
            h = nn.Dense(self.hidden_dim)(h)
            h = act(h)
        return nn.sigmoid(nn.Dense(1)(h))
