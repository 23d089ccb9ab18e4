"""Neural building blocks: MLP encoder/decoder with optional BatchNorm and an
orthogonally-parameterized final layer.

Counterparts of reference model.py (EncoderMLP/DecoderMLP/SplitModel/Reshape)
and the inline Sequential construction in reference autoencoder.py:36-65.

Notes on the mapping:
- torch BatchNorm1d with the reference's Reshape juggling for n_comps>1
  (model.py:22-25: flatten (B, n_comps, H) -> (B*n_comps, H) before the norm)
  is exactly linen BatchNorm's default behavior (stats over all non-feature
  axes), so no reshapes are needed.
- torch BatchNorm1d(momentum=0.1) == linen BatchNorm(momentum=0.9).
- torch orthogonal parametrization of the final encoder layer
  (autoencoder.py:52, model.py:35) maps to a QR-based parametrization:
  W = qr(V).Q with R-diagonal sign fixing (any smooth orthogonal
  parametrization preserves the semantics: orthonormal rows of the
  latent-projection weight).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(name: str, args: Sequence[float] = ()) -> Callable:
    """torch-style activation names (reference getattr(nn, activation),
    autoencoder.py:43)."""
    # the reference forwards activation_args to the torch module ctor
    # (nn.ELU(alpha), nn.Softplus(beta, threshold), nn.LeakyReLU(slope)) —
    # thread them to the jax equivalents the same way
    table = {
        "ReLU": lambda: nn.relu,
        "Tanh": lambda: jnp.tanh,
        "Sigmoid": lambda: jax.nn.sigmoid,
        "ELU": lambda: (lambda x: jax.nn.elu(x, args[0] if args else 1.0)),
        "SiLU": lambda: jax.nn.silu,
        "GELU": lambda: jax.nn.gelu,
        # torch Softplus(beta=1, threshold=20): linear above threshold/beta
        "Softplus": lambda: (lambda x: jnp.where(
            (args[0] if args else 1.0) * x > (args[1] if len(args) > 1 else 20.0),
            x, jax.nn.softplus((args[0] if args else 1.0) * x)
            / (args[0] if args else 1.0))),
        "LeakyReLU": lambda: (lambda x: jax.nn.leaky_relu(x, args[0] if args else 0.01)),
    }
    if name not in table:
        raise ValueError(f"Unknown activation: {name}")
    if args and name in ("ReLU", "Tanh", "Sigmoid", "SiLU", "GELU"):
        raise ValueError(f"activation {name} takes no activation_args")
    return table[name]()


class OrthoDense(nn.Module):
    """Dense layer whose weight has orthonormal rows (out_dim <= in_dim):
    y = x @ Q + b with Q the thin-QR factor of a free parameter."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        V = self.param("V", nn.initializers.lecun_normal(), (in_dim, self.features))
        Q, R = jnp.linalg.qr(V)
        # sign-fix for a deterministic, smooth parametrization
        Q = Q * jnp.sign(jnp.diagonal(R))[None, :]
        y = x @ Q
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class EncoderMLP(nn.Module):
    """Reference EncoderMLP (model.py:17-42) / inline encoder
    (autoencoder.py:37-56): n_layers hidden blocks, optional BatchNorm after
    every Linear including the final latent layer, optional orthogonal final
    layer."""

    hidden_dim: int
    latent_dim: int
    n_layers: int
    activation: str = "ReLU"
    activation_args: Sequence[float] = ()
    batch_norm: bool = False
    ortho: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation, self.activation_args)
        for _ in range(self.n_layers):
            x = nn.Dense(self.hidden_dim)(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(x)
            x = act(x)
        if self.ortho:
            x = OrthoDense(self.latent_dim)(x)
        else:
            x = nn.Dense(self.latent_dim)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn_final")(x)
        return x


class DecoderMLP(nn.Module):
    """Reference DecoderMLP (model.py:45-59)."""

    hidden_dim: int
    output_dim: int
    n_layers: int
    activation: str = "ReLU"
    activation_args: Sequence[float] = ()

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation, self.activation_args)
        for _ in range(self.n_layers):
            x = nn.Dense(self.hidden_dim)(x)
            x = act(x)
        return nn.Dense(self.output_dim)(x)


class SplitEncoder(nn.Module):
    """Reference SplitModel (model.py:62-70): split the last axis in two,
    apply twin submodules, concatenate."""

    hidden_dim: int
    latent_dim: int
    n_layers: int
    activation: str = "ReLU"
    activation_args: Sequence[float] = ()
    batch_norm: bool = False
    ortho: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        # each half-submodule produces HALF the latent so the concatenation
        # closes the encode->decode round trip at latent_dim (giving each
        # half the full latent_dim would emit 2*latent_dim and crash the
        # decoder; the reference's SplitModel has the same mismatch and is
        # unusable as written)
        assert self.latent_dim % 2 == 0, "mlp_split needs an even latent_dim"
        h = x.shape[-1] // 2
        x1, x2 = x[..., :h], x[..., h:]
        kw = dict(hidden_dim=self.hidden_dim, latent_dim=self.latent_dim // 2,
                  n_layers=self.n_layers, activation=self.activation,
                  activation_args=self.activation_args,
                  batch_norm=self.batch_norm, ortho=self.ortho)
        return jnp.concatenate([
            EncoderMLP(**kw, name="model1")(x1, train),
            EncoderMLP(**kw, name="model2")(x2, train),
        ], axis=-1)


class SplitDecoder(nn.Module):
    hidden_dim: int
    output_dim: int
    n_layers: int
    activation: str = "ReLU"
    activation_args: Sequence[float] = ()

    @nn.compact
    def __call__(self, x):
        # halves mirror SplitEncoder: each submodule reconstructs half the
        # output from half the latent
        assert self.output_dim % 2 == 0, "mlp_split needs an even output_dim"
        h = x.shape[-1] // 2
        x1, x2 = x[..., :h], x[..., h:]
        kw = dict(hidden_dim=self.hidden_dim, output_dim=self.output_dim // 2,
                  n_layers=self.n_layers, activation=self.activation,
                  activation_args=self.activation_args)
        return jnp.concatenate([
            DecoderMLP(**kw, name="model1")(x1),
            DecoderMLP(**kw, name="model2")(x2),
        ], axis=-1)
