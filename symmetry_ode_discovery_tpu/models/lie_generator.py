"""LieGenerator: Lie-algebra-parameterized symmetry generator (the LaLiGAN
core novelty).

Counterpart of reference gan.py:9-386. A representation string such as
'(2,1,2)' (2 components of a 2-dim vector acted on by a 1-channel learned
algebra) or '(1,so2)' / '(2,sim2)' / '(1,scaling2)' / '(1,so2*r)' / '(1,so3)'
/ '(1,so3+1)' / '(1,so4)' / '(N,)' is parsed once into a static `GeneratorSpec`
(block structure, learnability, channel counts); the learnable parameters
(Li, structure constants, sampling sigma) and the sequential-thresholding
masks live in a `GeneratorState` pytree.

Group elements g = exp(sum_i z_i L_i) are sampled with jax PRNG and assembled
block-diagonally; the matrix exponential (the reference's hot op, gan.py:296
torch.matrix_exp) is `jax.scipy.linalg.expm` vmapped over the batch.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.lie import expm, so


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One component of the representation string (reference gan.py:71-172)."""

    n_comps: int
    n_channels: int
    block_dim: int  # dimension of the vector this block acts on
    learnable: bool
    skew: bool  # f_Li = L - L^T (the '(c,ch,d,o)' form, gan.py:79)
    group_idx: str
    fixed_Li: Optional[np.ndarray]  # (n_channels, block_dim, block_dim) for fixed groups
    sigma_trainable: bool


@dataclasses.dataclass(frozen=True)
class GeneratorSpec:
    blocks: Tuple[BlockSpec, ...]
    n_dims: int
    coef_dist: str
    uniform_max: float
    sigma_init: float
    keep_center: bool
    int_param: bool
    int_param_max: int
    int_param_noise: float
    threshold: float  # gan_st_thres

    @property
    def group_ids(self) -> List[str]:
        """Unique group indices in first-appearance order."""
        seen = []
        for b in self.blocks:
            if b.group_idx not in seen:
                seen.append(b.group_idx)
        return seen


_FIXED_GROUPS = {
    # reference gan.py:110-168
    "so2": (np.array([[[0.0, 1.0], [-1.0, 0.0]]], np.float32), 2),
    "sim2": (np.array([[[-0.2, 1.0], [-1.0, 0.0]]], np.float32), 2),
    "scaling2": (np.array([[[2.0, 0.0], [0.0, 1.0]]], np.float32), 2),
    "so2*r": (np.array([[[0.0, 1.0], [-1.0, 0.0]],
                        [[0.1, 0.0], [0.0, 0.1]]], np.float32), 2),
}


def parse_repr(repr_str: str, group_idx: str, **kwargs) -> GeneratorSpec:
    """Parse the representation string (reference gan.py:40-183)."""
    # Parse all parenthesized tuples. (The reference splits on '+' first,
    # gan.py:43-49, which breaks the documented '(N,so3+1)' form — scanning
    # for parenthesized groups handles both '+'-joined tuples and group names
    # containing '+'.)
    import re

    tuples = [tuple(e.strip() for e in m.split(",") if e.strip())
              for m in re.findall(r"\(([^()]*)\)", repr_str)]
    gidx = [g.strip() for g in group_idx.split(",")]
    if len(gidx) != len(tuples):
        raise ValueError("Number of group indices does not match number of components "
                         "in representation string.")
    blocks = []
    n_dims = 0
    for i, (r, gi) in enumerate(zip(tuples, gidx)):
        if len(r) >= 3:
            skew = False
            if len(r) == 4:
                if r[3] == "o":
                    skew = True
                else:
                    raise ValueError(f"Group {r[3]} not implemented yet.")
            n_comps, n_channels, d = int(r[0]), int(r[1]), int(r[2])
            blocks.append(BlockSpec(n_comps, n_channels, d, True, skew, gi, None, False))
            n_dims += d * n_comps
        elif len(r) == 1:
            n_comps = int(r[0])
            # N scalars: a single frozen zero (n_comps x n_comps) block
            blocks.append(BlockSpec(1, 1, n_comps, False, False, gi,
                                    np.zeros((1, n_comps, n_comps), np.float32), True))
            n_dims += n_comps
        elif len(r) == 2:
            n_comps, gname = int(r[0]), r[1]
            if gname in _FIXED_GROUPS:
                Li, d = _FIXED_GROUPS[gname]
            elif gname == "so3":
                Li, d = np.asarray(so(3)), 3
            elif gname == "so3+1":
                L = np.zeros((3, 4, 4), np.float32)
                L[:, :3, :3] = np.asarray(so(3))
                Li, d = L, 4
            elif gname == "so4":
                Li, d = np.asarray(so(4)), 4
            else:
                raise ValueError(f"Group {gname} not implemented yet.")
            blocks.append(BlockSpec(n_comps, Li.shape[0], d, False, False, gi,
                                    np.asarray(Li, np.float32), False))
            n_dims += d * n_comps
        else:
            raise ValueError(f"Invalid representation string at position {i}: {r}")
    # channel-count consistency per group index (reference gan.py:174-179)
    by_idx = {}
    for b in blocks:
        by_idx.setdefault(b.group_idx, []).append(b.n_channels)
    for k, v in by_idx.items():
        if len(set(v)) > 1:
            raise ValueError(f"Group index {k} contains channels of different dimensions.")
    return GeneratorSpec(
        blocks=tuple(blocks),
        n_dims=n_dims,
        coef_dist=kwargs.get("coef_dist", "normal"),
        uniform_max=kwargs.get("uniform_max", 1.0),
        sigma_init=kwargs.get("sigma_init", 1.0),
        keep_center=kwargs.get("keep_center", False),
        int_param=kwargs.get("int_param", False),
        int_param_max=kwargs.get("int_param_max", 2),
        int_param_noise=kwargs.get("int_param_noise", 0.1),
        threshold=kwargs.get("gan_st_thres", 0.3),
    )


@struct.dataclass
class GeneratorState:
    """Learnable parameters + masks. Tuples are aligned with spec.blocks."""

    Li: Tuple[jnp.ndarray, ...]  # each (n_channels, d, d)
    sigma: Tuple[jnp.ndarray, ...]  # each (n_channels, n_channels)
    struct_const: Tuple[jnp.ndarray, ...]  # each (ch, ch, ch)
    masks: Tuple[jnp.ndarray, ...]  # each (n_channels, d, d); ones for fixed blocks


def init_generator(key: jax.Array, spec: GeneratorSpec) -> GeneratorState:
    """Random init of learnable blocks (reference gan.py:83-93)."""
    Li, sigma, struct_const, masks = [], [], [], []
    for b in spec.blocks:
        key, sub = jax.random.split(key)
        if b.learnable:
            Li.append(jax.random.normal(sub, (b.n_channels, b.block_dim, b.block_dim)))
        else:
            Li.append(jnp.asarray(b.fixed_Li))
        # the scalar '(N,)' identity block is the one whose sigma the
        # reference leaves at eye(1) WITHOUT the sigma_init factor
        # (gan.py:104 vs :93 and the fixed groups :117-168); it is also the
        # only sigma created without requires_grad=False there, which is
        # what sigma_trainable records
        s0 = 1.0 if b.sigma_trainable else spec.sigma_init
        sigma.append(jnp.eye(b.n_channels) * s0)
        struct_const.append(jnp.zeros((b.n_channels, b.n_channels, b.n_channels)))
        masks.append(jnp.ones((b.n_channels, b.block_dim, b.block_dim)))
    return GeneratorState(Li=tuple(Li), sigma=tuple(sigma),
                          struct_const=tuple(struct_const), masks=tuple(masks))


def trainable_filter(spec: GeneratorSpec, state: GeneratorState):
    """Boolean pytree: which leaves of GeneratorState are trainable (for
    optax.masked). Only learnable blocks' Li and struct_const train; sigma is
    frozen (requires_grad=False throughout reference gan.py:93-168)."""
    return GeneratorState(
        Li=tuple(b.learnable for b in spec.blocks),
        sigma=tuple(False for _ in spec.blocks),
        struct_const=tuple(b.learnable for b in spec.blocks),
        masks=tuple(False for _ in spec.blocks),
    )


def _effective_Li(spec: GeneratorSpec, state: GeneratorState, i: int,
                  key: Optional[jax.Array] = None,
                  int_round: bool = False) -> jnp.ndarray:
    """f(Li) * mask, with optional integer reparameterization.

    The reference applies IntParameter ONLY while sampling group elements
    (gan.py:290-291); regularizers, get_full_basis_list, and getLi all use
    the continuous f(Li) * mask (gan.py:199-229, 306-330, 377-380 — the
    int-rounded getLi variant is commented out there). int_round=True is
    therefore passed only by sample_group_element; rounding elsewhere would
    zero the regularizer gradients (piecewise-constant) and hand the symmetry
    losses a different basis than the reference. `key` enables IntParameter's
    stochastic rounding noise (gan.py:9-17).

    NOT reproduced: the reference line gan.py:292-293 then overwrites the
    rounded Li with f(Li) * mask for masked learnable blocks, making
    int_param fully inert — a bug (no shipped config uses --int_param)."""
    b = spec.blocks[i]
    L = state.Li[i]
    if b.skew:
        L = L - jnp.swapaxes(L, -1, -2)
    if int_round and b.learnable and spec.int_param:
        noise = (jax.random.normal(key, L.shape) * spec.int_param_noise
                 if key is not None else 0.0)
        k = spec.int_param_max
        L = jnp.round(jnp.clip(k * (L + noise), -k - 0.49, k + 0.49))
    if b.learnable:
        L = L * state.masks[i]
    return L


# ---------------------------------------------------------------------------
# Regularizers (reference gan.py:199-229)
# ---------------------------------------------------------------------------

def reg_norm(spec: GeneratorSpec, state: GeneratorState) -> jnp.ndarray:
    s = 0.0
    for i, b in enumerate(spec.blocks):
        if b.learnable:
            L = _effective_Li(spec, state, i)
            sq = jnp.einsum("kdf,kdf->k", L, L)
            s += jnp.sum(jnp.clip(0.5 - sq, min=0.0))
    return jnp.asarray(s)


def _normalized_Li(spec, state, i):
    L = _effective_Li(spec, state, i)
    norm = jnp.einsum("kdf,kdf->k", L, L)
    return L / (jnp.sqrt(norm)[:, None, None] + 1e-6)


def reg_ortho(spec: GeneratorSpec, state: GeneratorState) -> jnp.ndarray:
    s = 0.0
    for i, b in enumerate(spec.blocks):
        if b.learnable:
            Ln = _normalized_Li(spec, state, i)
            gram = jnp.einsum("bij,cij->bc", Ln, Ln)
            s += jnp.sum(jnp.square(jnp.triu(gram, k=1)))
    return jnp.asarray(s)


def reg_closure(spec: GeneratorSpec, state: GeneratorState) -> jnp.ndarray:
    """Lie-closure with learned structure constants (reference gan.py:216-229)."""
    s = 0.0
    for i, b in enumerate(spec.blocks):
        if not b.learnable:
            continue
        Ln = _normalized_Li(spec, state, i)
        c = state.struct_const[i]
        n_ch = b.n_channels
        for a in range(n_ch):
            for bb in range(a + 1, n_ch):
                comm = Ln[a] @ Ln[bb] - Ln[bb] @ Ln[a]
                target = jnp.einsum("k,kij->ij", c[a, bb], Ln)
                s += jnp.sum(jnp.square(comm - target))
    return jnp.asarray(s)


# ---------------------------------------------------------------------------
# Sampling and transforms (reference gan.py:231-365)
# ---------------------------------------------------------------------------

def sample_coefficient(spec: GeneratorSpec, key: jax.Array, batch_size: int,
                       n_channels: int, sigma: jnp.ndarray,
                       activated_channel: Optional[int] = None) -> jnp.ndarray:
    """reference gan.py:350-365. The amplitude for ALL coef_dist modes is the
    per-group `params` argument, which the caller binds to sigma
    (gan.py:286) — the reference's kwargs['uniform_max'] never reaches
    sampling. Its uniform broadcast (batch, ch) * (ch, ch) only works at
    n_channels == 1, where sigma is the (1, 1) matrix [[sigma_init]]."""
    if spec.coef_dist == "normal":
        z = jax.random.normal(key, (batch_size, n_channels)) @ sigma
    elif spec.coef_dist == "uniform":
        z = jax.random.uniform(key, (batch_size, n_channels)) * 2 * sigma - sigma
    elif spec.coef_dist == "uniform_int_grid":
        # the reference's int(sigma[0]) reads the live tensor eagerly each
        # batch; jax.random.randint accepts traced bounds, so the same
        # truncation works inside the jitted training epoch
        bound = jnp.floor(jnp.abs(sigma.reshape(-1)[0])).astype(jnp.int32)
        z = jax.random.randint(key, (batch_size, n_channels),
                               -bound, bound).astype(jnp.float32)
    else:
        raise ValueError(f"Unknown coef_dist: {spec.coef_dist}")
    if activated_channel is not None:
        onehot = jnp.zeros((n_channels,)).at[activated_channel].set(1.0)
        z = z * onehot[None, :]
    return z


def sample_group_element(spec: GeneratorSpec, state: GeneratorState, key: jax.Array,
                         batch_size: int,
                         activated_channel: Optional[int] = None) -> jnp.ndarray:
    """Random block-diagonal group element (batch, n_dims, n_dims)
    (reference gan.py:278-304). One coefficient draw per distinct group index,
    shared across its blocks."""
    z_dict = {}
    for gi in spec.group_ids:
        key, sub = jax.random.split(key)
        i = next(j for j, b in enumerate(spec.blocks) if b.group_idx == gi)
        z_dict[gi] = sample_coefficient(spec, sub, batch_size,
                                        spec.blocks[i].n_channels, state.sigma[i],
                                        activated_channel)
    g = jnp.zeros((batch_size, spec.n_dims, spec.n_dims))
    start = 0
    for i, b in enumerate(spec.blocks):
        key, sub = jax.random.split(key)
        L = _effective_Li(spec, state, i, key=sub if spec.int_param else None,
                          int_round=True)
        z = z_dict[b.group_idx]
        g_z = expm(jnp.einsum("bj,jkl->bkl", z, L))  # (batch, d, d)
        for _ in range(b.n_comps):
            end = start + b.block_dim
            g = g.at[:, start:end, start:end].set(g_z)
            start = end
    return g


def generator_forward(spec: GeneratorSpec, state: GeneratorState, key: jax.Array,
                      x: jnp.ndarray,
                      activated_channel: Optional[int] = None) -> jnp.ndarray:
    """Random transformation of x: (batch, *, n_dims) -> same shape
    (reference gan.py:231-248). Optionally recenters around the batch mean."""
    if not spec.keep_center:
        x_mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)), keepdims=True)
        x = x - x_mean
    shape = x.shape
    xb = x.reshape(shape[0], -1)
    g = sample_group_element(spec, state, key, shape[0], activated_channel)
    xt = jnp.einsum("bij,bj->bi", g, xb).reshape(shape)
    if not spec.keep_center:
        xt = xt + x_mean
    return xt


def get_full_basis_list(spec: GeneratorSpec, state: GeneratorState,
                        split_channel: bool = True) -> List[jnp.ndarray]:
    """Padded block-diagonal basis elements on the full latent space, grouped
    by group index (reference gan.py:306-330). split_channel=True yields one
    (n_dims, n_dims) matrix per channel; False one (ch, n_dims, n_dims) stack
    per group index."""
    start = 0
    per_group = {gi: [] for gi in spec.group_ids}
    for i, b in enumerate(spec.blocks):
        L = _effective_Li(spec, state, i)
        v = jnp.zeros((b.n_channels, spec.n_dims, spec.n_dims))
        for _ in range(b.n_comps):
            end = start + b.block_dim
            v = v.at[:, start:end, start:end].set(L)
            start = end
        per_group[b.group_idx].append(v)
    out = []
    for gi in spec.group_ids:
        tot = sum(per_group[gi])
        if split_channel:
            out.extend([tot[c] for c in range(tot.shape[0])])
        else:
            out.append(tot)
    return out


def get_deterministic_group_elems(spec: GeneratorSpec, state: GeneratorState,
                                  split_channel: bool = False,
                                  scale: float = 1.0) -> List[jnp.ndarray]:
    """Deterministic group elements exp(sigma * L * scale) for finite/reversed
    symmetry regularization (reference gan.py:332-348)."""
    basis = get_full_basis_list(spec, state, split_channel=split_channel)
    # sigma per group id (first block of each group)
    sigmas = []
    for gi in spec.group_ids:
        i = next(j for j, b in enumerate(spec.blocks) if b.group_idx == gi)
        sigmas.append(state.sigma[i])
    if split_channel:
        # basis is a flat per-channel list: expand each group's diagonal
        # sigma entries to stay aligned (the reference zips the per-block
        # sigma list against this flat list, silently dropping every channel
        # past the group count — gan.py:339-344; no caller exercises it)
        sigmas = [s[c, c] for s in sigmas for c in range(s.shape[0])]
    g_list = []
    for sigma, L in zip(sigmas, basis):
        if L.ndim == 3:
            for c in range(L.shape[0]):
                g_list.append(expm(sigma[c, c] * L[c] * scale))
        else:
            g_list.append(expm(sigma * L * scale))
    return g_list


def infinitesimal_transform(spec: GeneratorSpec, state: GeneratorState,
                            x: jnp.ndarray, L_idx: int) -> jnp.ndarray:
    """L_x = L @ x for the L_idx-th full-basis element (reference
    gan.py:250-267)."""
    if not spec.keep_center:
        x_mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)), keepdims=True)
        x = x - x_mean
    shape = x.shape
    xb = x.reshape(shape[0], -1)
    L = get_full_basis_list(spec, state)[L_idx]
    return jnp.einsum("ij,bj->bi", L, xb).reshape(shape)


def set_threshold(spec: GeneratorSpec, state: GeneratorState,
                  threshold: float) -> GeneratorState:
    """Sequential thresholding of Li entries, relative to each channel's max
    (reference gan.py:269-276); monotone (AND with the existing mask)."""
    new_masks = []
    for i, b in enumerate(spec.blocks):
        if not b.learnable:
            new_masks.append(state.masks[i])
            continue
        L = state.Li[i]
        if b.skew:
            L = L - jnp.swapaxes(L, -1, -2)
        max_ch = jnp.max(jnp.abs(L), axis=(1, 2), keepdims=True)
        m = jnp.logical_and(jnp.abs(L) > threshold * max_ch,
                            state.masks[i] > 0).astype(state.masks[i].dtype)
        new_masks.append(m)
    return state.replace(masks=tuple(new_masks))


def getLi(spec: GeneratorSpec, state: GeneratorState) -> List[jnp.ndarray]:
    """reference gan.py:377-378."""
    return get_full_basis_list(spec, state, split_channel=False)
