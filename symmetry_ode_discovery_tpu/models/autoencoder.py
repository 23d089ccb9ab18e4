"""AutoEncoder: MLP encoder/decoder pair with JVP pushforwards and the
infinitesimal group action.

Counterpart of reference autoencoder.py (AutoEncoder, arch 'mlp' /
'mlp_split' / 'none'). The reference's 'stick_cnn'/'pendulum_cnn' branches
reference model classes that do not exist in the reference codebase
(autoencoder.py:71-85 — dead code) and are intentionally not reproduced.

Functional design: `AutoEncoderDef` holds the static architecture; parameters
and BatchNorm running stats are explicit pytrees threaded through the apply
functions, so everything jits and vmaps (including nested jvp through the
decoder, reference autoencoder.py:102-126 / model_utils.py symmreg losses).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .mlp import DecoderMLP, EncoderMLP, SplitDecoder, SplitEncoder


@dataclasses.dataclass(frozen=True)
class AutoEncoderDef:
    """Static config (reference autoencoder.py:25-89 constructor args)."""

    ae_arch: str = "mlp"
    input_dim: int = 2
    hidden_dim: int = 512
    latent_dim: int = 2
    n_layers: int = 5
    n_comps: int = 1
    activation: str = "ReLU"
    activation_args: Tuple[float, ...] = ()
    batch_norm: bool = False
    ortho_ae: bool = False

    def _modules(self):
        if self.ae_arch == "mlp":
            enc = EncoderMLP(self.hidden_dim, self.latent_dim, self.n_layers,
                             self.activation, self.activation_args,
                             self.batch_norm, self.ortho_ae)
            dec = DecoderMLP(self.hidden_dim, self.input_dim, self.n_layers,
                             self.activation, self.activation_args)
        elif self.ae_arch == "mlp_split":
            enc = SplitEncoder(self.hidden_dim, self.latent_dim, self.n_layers,
                               self.activation, self.activation_args,
                               self.batch_norm, self.ortho_ae)
            dec = SplitDecoder(self.hidden_dim, self.input_dim, self.n_layers,
                               self.activation, self.activation_args)
        elif self.ae_arch == "none":
            return None, None
        else:
            raise ValueError(f"Unknown ae_arch: {self.ae_arch}")
        return enc, dec

    def init(self, key: jax.Array):
        """Returns (params, batch_stats) pytrees ('none' arch: empty dicts)."""
        if self.ae_arch == "none":
            return {}, {}
        enc, dec = self._modules()
        k1, k2 = jax.random.split(key)
        x = jnp.ones((2, self.n_comps, self.input_dim)) if self.n_comps > 1 \
            else jnp.ones((2, self.input_dim))
        z = jnp.ones((2, self.n_comps, self.latent_dim)) if self.n_comps > 1 \
            else jnp.ones((2, self.latent_dim))
        ev = enc.init(k1, x, train=True)
        dv = dec.init(k2, z)
        params = {"encoder": ev["params"], "decoder": dv["params"]}
        batch_stats = {"encoder": ev.get("batch_stats", {})}
        return params, batch_stats

    def encode(self, params, batch_stats, x, train: bool = False):
        """Returns (z, new_batch_stats). In eval mode (train=False) running
        stats are used and returned unchanged."""
        if self.ae_arch == "none":
            return x, batch_stats
        enc, _ = self._modules()
        variables = {"params": params["encoder"], "batch_stats": batch_stats.get("encoder", {})}
        if train and self.batch_norm:
            z, mut = enc.apply(variables, x, train=True, mutable=["batch_stats"])
            return z, {"encoder": mut["batch_stats"]}
        z = enc.apply(variables, x, train=False)
        return z, batch_stats

    def decode(self, params, z):
        if self.ae_arch == "none":
            return z
        _, dec = self._modules()
        return dec.apply({"params": params["decoder"]}, z)

    def forward(self, params, batch_stats, x, train: bool = False):
        """(z, xhat, new_batch_stats) — reference autoencoder.py:91-94."""
        z, bs = self.encode(params, batch_stats, x, train)
        xhat = self.decode(params, z)
        return z, xhat, bs

    # --- autodiff pushforwards (reference autoencoder.py:102-108) ---

    def compute_dz(self, params, batch_stats, x, dx):
        """dz = J_enc(x) dx via jvp (eval mode — matches the reference, whose
        jvp of a train-mode BatchNorm would differentiate through batch
        statistics; all reference call sites use it for the frozen/eval AE)."""
        f = lambda xx: self.encode(params, batch_stats, xx, train=False)[0]
        return jax.jvp(f, (x,), (dx,))[1]

    def compute_dx(self, params, z, dz):
        f = lambda zz: self.decode(params, zz)
        return jax.jvp(f, (z,), (dz,))[1]

    def iga(self, params, batch_stats, g, x, normalize_z: bool = True):
        """Infinitesimal group action pushed to data space (reference
        autoencoder.py:110-126): v_x = J_dec(z) . (g @ z_flat)."""
        z, _ = self.encode(params, batch_stats, x, train=False)
        if normalize_z:
            z = z - z.mean(axis=0, keepdims=True)
        z_shape = z.shape
        z_flat = z.reshape(z_shape[0], -1)
        v_z = jnp.einsum("jk,bk->bj", g, z_flat).reshape(z_shape)
        return jax.jvp(lambda zz: self.decode(params, zz), (z,), (v_z,))[1]

    def encoder_final_bias(self, params) -> Optional[jnp.ndarray]:
        """The z_mean used by 'global' normalization in the symmreg losses:
        the final BatchNorm's beta (reference model_utils.py:46
        `autoencoder.encoder[-2].bias`)."""
        if self.ae_arch == "none":
            return None
        if self.batch_norm:
            return params["encoder"]["bn_final"]["bias"]
        return None
