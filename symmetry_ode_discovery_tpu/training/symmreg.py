"""Symmetry-regularization losses for equation discovery (EquivSINDy-r /
EquivGP-r).

Counterparts of reference model_utils.py:8-211:
- symmreg_i: infinitesimal — || J_f(x) v_x - v_{f(x)} ||^2 per Lie basis
  element, with v pushed through the decoder by jvp;
- symmreg_f: finite — || f(g.x) - g.f(x) ||^2 per deterministic group element;
- symmreg_r: reversed — for an ODE h, || J_g(x) h(x) - h(g.x) ||^2;
- precompute_symmreg_r: g(x), J_g(x) tables for decoupled engines (the
  genetic-programming path).

All are pure functions of (ae_def, ae_params, batch_stats, spec, g_state) and
jit/vmap/grad-compose. The autoencoder is always applied in eval mode
(reference calls autoencoder.eval(), model_utils.py:33-34).

z normalization: 'global' subtracts z_mean; when z_mean is None it uses the
encoder's final BatchNorm beta (reference model_utils.py:44-47
`autoencoder.encoder[-2].bias`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.autoencoder import AutoEncoderDef
from ..models import lie_generator as lg
from ..models.lie_generator import GeneratorSpec, GeneratorState


def _resolve_z_mean(ae_def, ae_params, normalize, z_mean):
    if normalize == "global" and z_mean is None:
        z_mean = ae_def.encoder_final_bias(ae_params)
        if z_mean is None:
            raise ValueError("normalize='global' needs a BatchNorm final layer "
                             "or an explicit z_mean")
    return z_mean


def symmreg_i(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    x_fx: jnp.ndarray,
    f: Optional[Callable] = None,
    dfdx: Optional[jnp.ndarray] = None,
    normalize: str = "global",
    z_mean: Optional[jnp.ndarray] = None,
    relative: bool = True,
) -> jnp.ndarray:
    """Infinitesimal symmetry loss (reference model_utils.py:8-67).

    x_fx: (batch, 2, input_dim) stacking the input and the predicted output.
    """
    if (f is None) == (dfdx is None):
        raise ValueError("Exactly one of f and dfdx must be specified.")
    z, _ = ae_def.encode(ae_params, batch_stats, x_fx, train=False)
    x = x_fx[:, 0]
    if normalize == "in_batch":
        z = z - z.mean(axis=0, keepdims=True)
    elif normalize == "global":
        z = z - _resolve_z_mean(ae_def, ae_params, normalize, z_mean)
    z_shape = z.shape

    loss = 0.0
    for v in lg.get_full_basis_list(spec, g_state):
        v_z = jnp.einsum("jk,bk->bj", v, z.reshape(z_shape[0], -1)).reshape(z_shape)
        v_x_fx = jax.jvp(lambda zz: ae_def.decode(ae_params, zz), (z,), (v_z,))[1]
        v_x, v_fx = v_x_fx[:, 0], v_x_fx[:, 1]
        if f is not None:
            input_variation = jax.jvp(f, (x,), (v_x,))[1]
        else:
            input_variation = jnp.einsum("bjk,bk->bj", dfdx, v_x)
        sq = jnp.mean((input_variation - v_fx) ** 2)
        if relative:
            sq = sq / jnp.mean(input_variation ** 2)
        loss = loss + sq
    return loss


def symmreg_f(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    x_fx: jnp.ndarray,
    f: Callable,
    normalize: str = "global",
    z_mean: Optional[jnp.ndarray] = None,
    relative: bool = True,
) -> jnp.ndarray:
    """Finite symmetry loss (reference model_utils.py:69-124)."""
    z, _ = ae_def.encode(ae_params, batch_stats, x_fx, train=False)
    fx = x_fx[:, 1]
    zm = 0.0  # normalize='none' shifts by nothing (cf. _group_transform)
    if normalize == "in_batch":
        zm = z.mean(axis=0, keepdims=True)
        z = z - zm
    elif normalize == "global":
        zm = _resolve_z_mean(ae_def, ae_params, normalize, z_mean)
        z = z - zm
    z_shape = z.shape

    loss = 0.0
    for g in lg.get_deterministic_group_elems(spec, g_state):
        g_z = jnp.einsum("jk,bk->bj", g, z.reshape(z_shape[0], -1)).reshape(z_shape)
        g_z = g_z + zm
        g_x_fx = ae_def.decode(ae_params, g_z)
        g_x, g_fx = g_x_fx[:, 0], g_x_fx[:, 1]
        f_g_x = f(g_x)
        sq = jnp.mean((f_g_x - g_fx) ** 2)
        if relative:
            sq = sq / jnp.mean((f_g_x - fx) ** 2)
        loss = loss + sq
    return loss


def _group_transform(ae_def, ae_params, batch_stats, g, x, normalize, z_mean):
    """g acting on data space through the autoencoder: decode(g . encode(x))
    component 0 (reference model_utils.py:144-158). The input is duplicated
    across the 2 components to match the multi-timestep encoder."""
    xx = jnp.stack([x, x], axis=1)
    z, _ = ae_def.encode(ae_params, batch_stats, xx, train=False)
    zm = 0.0
    if normalize == "in_batch":
        zm = z.mean(axis=0, keepdims=True)
        z = z - zm
    elif normalize == "global":
        zm = _resolve_z_mean(ae_def, ae_params, normalize, z_mean)
        z = z - zm
    z_shape = z.shape
    g_z = jnp.einsum("jk,bk->bj", g, z.reshape(z_shape[0], -1)).reshape(z_shape)
    g_z = g_z + zm
    g_xx = ae_def.decode(ae_params, g_z)
    return g_xx[:, 0]


def symmreg_r(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    x: jnp.ndarray,
    h: Callable,
    normalize: str = "global",
    z_mean: Optional[jnp.ndarray] = None,
    scale: float = 0.01,
) -> jnp.ndarray:
    """Reversed symmetry loss for an ODE h (reference model_utils.py:126-170)."""
    g_list = lg.get_deterministic_group_elems(spec, g_state, scale=scale)
    loss = 0.0
    for g in g_list:
        gt = partial(_group_transform, ae_def, ae_params, batch_stats, g,
                     normalize=normalize, z_mean=z_mean)
        gx = gt(x)
        hx = h(x)
        variation1 = jax.jvp(gt, (x,), (hx,))[1]
        variation2 = h(gx)
        loss = loss + jnp.mean((variation1 - variation2) ** 2)
    return loss


def make_symmreg_i_fast(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    int_t: float, int_dt: float,
    z_mean: Optional[jnp.ndarray] = None,
    relative: bool = True,
    ae_dtype=None,
    pallas: bool = False,
    pallas_interpret: bool = False,
    fused_rollout_lib=None,
):
    """Fast-path builder for the infinitesimal symmetry loss inside L-BFGS
    equation discovery (the EquivSINDy-r hot loop).

    Mathematically identical to `make_sym_reg_fn(..., 'i')` +
    `symmreg_i(..., f=forward_step)` but restructured around what is actually
    iteration-dependent. With the autoencoder and generator FROZEN (the
    --fix_laligan protocol, reference main.py:47-63) and the fit batch x fixed
    per seed, the candidate equation Xi only enters through the rollout
    endpoint fx = odeint(f, x, int_t, int_dt). Everything evaluated at x is
    constant across all L-BFGS iterations:

      - z_x = normalize(encode(x))           (one encoder pass per seed)
      - J_dec(z_x)                           (decoder Jacobian at z_x; the
                                              'x' half of the reference's
                                              per-closure decoder jvp,
                                              model_utils.py:53-56)

    `prep(x)` computes these once; `penalty(forward_fn, x, ctx)` then costs
    ONE encoder forward (at fx) + ONE decoder jvp (at z_fx) per evaluation —
    half the reference's per-closure autoencoder work, which re-encodes the
    (x, fx) pair and pushes both halves through the decoder jvp every closure
    call (reference model_utils.py:8-67, train.py:667-673).

    The per-component split is exact because encoder/decoder apply the same
    weights to each component of the (batch, 2, dim) stack (models/mlp.py
    Dense broadcasts over the component axis; BatchNorm runs in eval mode).

    ae_dtype: optional compute dtype (e.g. jnp.bfloat16) for the frozen
    autoencoder matmuls in this penalty — the MXU fast path. The reduction
    and the rest of the loss stay float32.

    pallas: fuse the per-closure autoencoder work (encoder at fx, decoder
    JVP at z_fx, and both backward chains) into VMEM-resident Pallas kernels
    (ops/pallas_symmpen.py) — weights stay on-chip across a row-tile grid
    and the backward recomputes ReLU masks instead of storing or re-running
    the activation graph. Requires ae_arch='mlp' + ReLU (the shipped
    protocol); kernel compute dtype follows ae_dtype (None = f32, same as
    the autodiff path).
    IMPORTANT for the L-BFGS driver: with pallas=True the closure's
    residuals are tiny (kernel inputs only), so jax.checkpoint is
    unnecessary — pass remat=False to make_lbfgs_stepper.
    pallas_interpret: run the kernels in interpreter mode (CPU tests).

    fused_rollout_lib: the SINDy FunctionLibrary of the candidate equation.
    When given, the returned penalty takes the MASKED COEFFICIENT MATRIX
    instead of a closure — `penalty(XiM, x, ctx)` with XiM (d, p) — and is
    marked `penalty.wants_coefs = True` (make_lbfgs_stepper dispatches on
    the attribute). The rollout endpoint and its directional derivative then
    come from ONE fused scan with a memory-light custom VJP
    (ops/integrators.make_euler_pair) instead of odeint + jvp(odeint),
    whose autodiff stores (n_steps, batch, n_terms) linearizations per
    closure evaluation — the dominant HBM traffic of the flagship sweep
    (tools/profile_symreg.py). Additionally v_x = J_dec(z_x)·(v·z_x) moves
    into prep(): it only depends on frozen quantities because every shipped
    basis element is block-diagonal over the (x, fx) component pair —
    checked at build time; a basis with a nonzero upper-right block (v_x
    depending on z_fx) raises. Same math, exact derivatives; only float
    association order differs from the closure path.
    """
    from ..ops.integrators import odeint

    zm = _resolve_z_mean(ae_def, ae_params, "global", z_mean)
    basis = lg.get_full_basis_list(spec, g_state)
    latent = ae_def.latent_dim

    if pallas:
        from ..ops.pallas_symmpen import (fold_decoder, fold_encoder,
                                          make_dec_jvp, make_enc_apply)
        # ae_dtype=None means f32 on the autodiff path; the kernels follow
        # the same convention so callers get consistent precision end-to-end
        kdtype = ae_dtype if ae_dtype is not None else jnp.float32
        enc_folded = fold_encoder(ae_def, ae_params, batch_stats, z_mean=zm)
        dec_folded = fold_decoder(ae_def, ae_params)
        enc_k = make_enc_apply(enc_folded, dtype=kdtype,
                               interpret=pallas_interpret)
        dec_jvp_k = make_dec_jvp(dec_folded, dtype=kdtype,
                                 interpret=pallas_interpret)

    if ae_dtype is not None:
        # cast the big Dense weights; keep the OrthoDense 'V' factor f32 (QR
        # has no low-precision kernel, and it's the tiny final layer anyway)
        def cast(t):
            return jax.tree_util.tree_map_with_path(
                lambda path, a: a if any(getattr(k, "key", None) == "V" for k in path)
                or not jnp.issubdtype(a.dtype, jnp.floating)
                else a.astype(ae_dtype), t)
        ae_params = cast(ae_params)
        batch_stats = cast(batch_stats)

    def enc1(x):
        """Encode a single component batch (b, input_dim) -> normalized z."""
        xin = x.astype(ae_dtype) if ae_dtype is not None else x
        z, _ = ae_def.encode(ae_params, batch_stats, xin, train=False)
        return z.astype(jnp.float32) - zm.astype(jnp.float32)

    def dec1(z):
        zin = z.astype(ae_dtype) if ae_dtype is not None else z
        return ae_def.decode(ae_params, zin).astype(jnp.float32)

    def prep(x):
        z_x = enc1(x)
        Jd_x = jax.vmap(jax.jacfwd(lambda zz: dec1(zz[None, :])[0]))(z_x)
        return {"z_x": z_x, "Jd_x": Jd_x}

    if fused_rollout_lib is not None:
        from ..ops.integrators import make_euler_pair

        for v in basis:
            if not np.allclose(np.asarray(v[:latent, latent:]), 0.0):
                raise ValueError(
                    "fused_rollout requires block-diagonal basis elements "
                    "(v_x must not depend on the rollout endpoint)")
        n_steps = int(int_t / int_dt)
        ep = make_euler_pair(lambda A: (lambda q: fused_rollout_lib(q) @ A),
                             n_steps, int_dt)

        def prep_fused(x):
            ctx = prep(x)
            z_x, Jd_x = ctx["z_x"], ctx["Jd_x"]
            # v_x per basis element, constant across L-BFGS iterations:
            # v_z_x = v[:lat,:lat] z_x (block-diagonal), pushed through the
            # frozen decoder Jacobian — previously recomputed every closure
            v_xs = [jnp.einsum("bij,bj->bi", Jd_x,
                               z_x @ jnp.asarray(v)[:latent, :latent].T)
                    for v in basis]
            ctx["v_xs"] = jnp.stack(v_xs)  # (n_basis, b, input_dim)
            return ctx

        def penalty_fused(XiM, x, ctx):
            z_x = ctx["z_x"]
            loss = 0.0
            for i, v in enumerate(basis):
                fx, iv = ep(x, ctx["v_xs"][i], XiM.T)
                z_fx = enc_k(fx) if pallas else enc1(fx)
                v_z_fx = (z_fx @ jnp.asarray(v)[latent:, latent:].T
                          + z_x @ jnp.asarray(v)[latent:, :latent].T)
                v_fx = (dec_jvp_k(z_fx, v_z_fx) if pallas
                        else jax.jvp(dec1, (z_fx,), (v_z_fx,))[1])
                sq = jnp.mean((iv - v_fx) ** 2)
                if relative:
                    sq = sq / jnp.mean(iv ** 2)
                loss = loss + sq
            return loss

        penalty_fused.wants_coefs = True
        return prep_fused, penalty_fused

    def penalty(forward_fn, x, ctx):
        def forward_step(q):
            return odeint(forward_fn, q, int_t, int_dt)

        fx = forward_step(x)
        z_fx = enc_k(fx) if pallas else enc1(fx)
        z_x, Jd_x = ctx["z_x"], ctx["Jd_x"]
        z_flat = jnp.concatenate([z_x, z_fx], axis=-1)  # (b, 2*latent)

        loss = 0.0
        for v in basis:
            v_z = jnp.einsum("jk,bk->bj", v, z_flat)
            v_z_x, v_z_fx = v_z[:, :latent], v_z[:, latent:]
            v_x = jnp.einsum("bij,bj->bi", Jd_x, v_z_x)
            v_fx = (dec_jvp_k(z_fx, v_z_fx) if pallas
                    else jax.jvp(dec1, (z_fx,), (v_z_fx,))[1])
            input_variation = jax.jvp(forward_step, (x,), (v_x,))[1]
            sq = jnp.mean((input_variation - v_fx) ** 2)
            if relative:
                sq = sq / jnp.mean(input_variation ** 2)
            loss = loss + sq
        return loss

    return prep, penalty


def make_precompute_symmreg_r(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    z_mean: Optional[jnp.ndarray] = None,
    scale: float = 0.01,
):
    """Factory form of precompute_symmreg_r: returns `precompute(x) ->
    (gx_list, Jgx_list)` with the per-group-element (g(x), J_g(x)) program
    jitted ONCE and reused across calls. Callers that precompute for many
    subsample seeds (the EquivGP-r sweep, cli/main_gp.py) must use this —
    the unjitted path re-dispatches every AE layer per call, which costs
    ~13 s/seed over the TPU tunnel vs <0.2 s warm jitted."""
    g_list = lg.get_deterministic_group_elems(spec, g_state, scale=scale)

    @jax.jit
    def one(g, x):
        gt = partial(_group_transform, ae_def, ae_params, batch_stats, g,
                     normalize="global", z_mean=z_mean)
        gx = gt(x)
        Jgx = jax.vmap(jax.jacfwd(lambda xi: gt(xi[None, :])[0]))(x)
        return gx, Jgx

    def precompute(x):
        gx_list: List[jnp.ndarray] = []
        Jgx_list: List[jnp.ndarray] = []
        for g in g_list:
            gx, Jgx = one(g, x)
            gx_list.append(gx)
            Jgx_list.append(Jgx)
        return gx_list, Jgx_list

    return precompute


def precompute_symmreg_r(
    ae_def: AutoEncoderDef, ae_params, batch_stats,
    spec: GeneratorSpec, g_state: GeneratorState,
    x: jnp.ndarray,
    z_mean: Optional[jnp.ndarray] = None,
    scale: float = 0.01,
):
    """Precompute (g(x), J_g(x)) per deterministic group element for decoupled
    symmetry-regularized engines (reference model_utils.py:172-211, the
    'beta torch.func' path — here plain vmap(jacfwd)). One-shot convenience
    wrapper; for repeated calls use make_precompute_symmreg_r."""
    return make_precompute_symmreg_r(ae_def, ae_params, batch_stats, spec,
                                     g_state, z_mean=z_mean, scale=scale)(x)
