"""Fused frozen-autoencoder kernels for the EquivSINDy-r penalty (Pallas/TPU).

The symmetry-regularized L-BFGS closure (training/symmreg.py
make_symmreg_i_fast, reference model_utils.py:8-67 + train.py:667-673)
spends nearly all of its FLOPs in the frozen autoencoder: one encoder pass
at the rollout endpoint fx and one decoder JVP at z_fx, every closure
evaluation, 2000 evaluations per seed. Under XLA each 512-wide Dense is its
own HBM-streamed dot (arithmetic intensity ~N*512 reads per N*512*512*2
FLOPs, below the v5e bf16 ridge point) and jax.checkpoint re-runs the whole
forward in the backward pass; measured throughput of the step program is
~6x below the bf16 roofline.

These kernels fuse each frozen-MLP chain into one VMEM-resident Pallas
program: weights stay in VMEM across a row-tile grid, activations never
touch HBM, and the hand-written backward recomputes the ReLU masks in-VMEM
instead of storing (or re-running) the activation graph. Because the
shipped architecture is ReLU (utils/config.py --activation default; every
run_configs/*.cfg inherits it), sigma'' == 0 and all backward chains are
masked matmuls:

  encoder     z = A_K(relu(...relu(A_0 x)))       (BatchNorm eval-mode
              affines, the orthogonal final layer's QR factor and the
              global z-mean are folded into plain (W, b) pairs at build
              time -- the autoencoder is frozen on this path,
              reference main.py:47-63 --fix_laligan)
  vjp:        cx = ((cz W_K^T) . m_{K-1}) W_{K-1}^T ...

  decoder jvp v = t_K W_K,  t_{k+1} = m_k . (t_k W_k),  m_k = [p_k > 0]
              (primal chain p_k = a_k W_k + b_k only produces the masks)
  vjp:        cu = ((cv W_K^T) . m_{K-1}) W_{K-1}^T ...;  cz = 0
              (exactly what JAX autodiff yields for ReLU: the masks are
              piecewise constant, so d(v)/d(z) a.e. vanishes -- verified
              against the autodiff path in tests/test_pallas_symmpen.py)

Matmuls run in bfloat16 with float32 accumulation (the ae_dtype=bf16 fast
path of make_symmreg_i_fast; RESULTS.md documents sweep-statistic
insensitivity); set dtype=float32 for bit-comparable testing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512

# the package-level jax_default_matmul_precision=float32 (see __init__)
# would stamp contract_precision<fp32> onto these bf16 MXU matmuls, which
# Mosaic rejects ("Bad lhs type"); inside the kernels the dtype argument IS
# the precision contract, so pin the lowering to DEFAULT explicitly.
_PREC = jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# Build-time folding of the frozen autoencoder into plain affine chains
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FoldedMLP:
    """A frozen x -> A_K(relu(... relu(A_0 x + b_0) ...) + b_K chain.

    Ws[k] has shape (d_k, d_{k+1}); ReLU is applied after every layer except
    the last. All arrays are float32 host constants.
    """

    Ws: Tuple[jnp.ndarray, ...]
    bs: Tuple[jnp.ndarray, ...]

    @property
    def n_relu(self) -> int:
        return len(self.Ws) - 1


def _bn_affine(params, stats, eps=1e-5):
    s = params["scale"] / jnp.sqrt(stats["var"] + eps)
    return s, params["bias"] - stats["mean"] * s


def fold_encoder(ae_def, ae_params, batch_stats,
                 z_mean: Optional[jnp.ndarray] = None) -> FoldedMLP:
    """Fold the eval-mode single-component encoder (models/mlp.py EncoderMLP)
    into plain (W, b) pairs: BatchNorm running-stat affines into the
    preceding Dense, the OrthoDense QR factor evaluated once, and the global
    z-mean subtraction into the final bias."""
    if ae_def.ae_arch != "mlp":
        raise ValueError("fold_encoder requires ae_arch='mlp'")
    if ae_def.activation != "ReLU":
        raise ValueError("fused penalty kernels require ReLU activation")
    enc = ae_params["encoder"]
    ebs = batch_stats.get("encoder", {})
    Ws, bs = [], []
    for k in range(ae_def.n_layers):
        W = enc[f"Dense_{k}"]["kernel"]
        b = enc[f"Dense_{k}"]["bias"]
        if ae_def.batch_norm:
            s, t = _bn_affine(enc[f"BatchNorm_{k}"], ebs[f"BatchNorm_{k}"])
            W, b = W * s[None, :], b * s + t
        Ws.append(W)
        bs.append(b)
    if ae_def.ortho_ae:
        V = enc["OrthoDense_0"]["V"]
        Q, R = jnp.linalg.qr(V)
        W = Q * jnp.sign(jnp.diagonal(R))[None, :]
        b = enc["OrthoDense_0"]["bias"]
    else:
        W = enc[f"Dense_{ae_def.n_layers}"]["kernel"]
        b = enc[f"Dense_{ae_def.n_layers}"]["bias"]
    if ae_def.batch_norm:
        s, t = _bn_affine(enc["bn_final"], ebs["bn_final"])
        W, b = W * s[None, :], b * s + t
    if z_mean is not None:
        b = b - z_mean
    Ws.append(W)
    bs.append(b)
    return FoldedMLP(tuple(jnp.asarray(w, jnp.float32) for w in Ws),
                     tuple(jnp.asarray(v, jnp.float32) for v in bs))


def fold_decoder(ae_def, ae_params) -> FoldedMLP:
    """The decoder (models/mlp.py DecoderMLP) is already a plain chain."""
    if ae_def.ae_arch != "mlp":
        raise ValueError("fold_decoder requires ae_arch='mlp'")
    if ae_def.activation != "ReLU":
        raise ValueError("fused penalty kernels require ReLU activation")
    dec = ae_params["decoder"]
    Ws = [dec[f"Dense_{k}"]["kernel"] for k in range(ae_def.n_layers + 1)]
    bs = [dec[f"Dense_{k}"]["bias"] for k in range(ae_def.n_layers + 1)]
    return FoldedMLP(tuple(jnp.asarray(w, jnp.float32) for w in Ws),
                     tuple(jnp.asarray(v, jnp.float32) for v in bs))


def mlp_ref(folded: FoldedMLP, x: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX reference of the folded chain (tests / CPU fallback)."""
    h = x
    for k, (W, b) in enumerate(zip(folded.Ws, folded.bs)):
        h = h @ W + b
        if k < folded.n_relu:
            h = jnp.maximum(h, 0.0)
    return h


# ---------------------------------------------------------------------------
# Kernels. Grid = row tiles; weights are whole-array VMEM operands revisited
# on every grid step. Matmul compute dtype is `dtype` (bf16 default) with
# f32 accumulation; the mask chain uses the f32 accumulator pre-activations,
# recomputed identically in forward and backward so masks always agree.
# ---------------------------------------------------------------------------


def _chain_fwd(x, Ws, bs, dtype):
    """Shared in-kernel forward: returns (output f32, [masks bf16])."""
    h = x.astype(dtype)
    masks = []
    n_relu = len(Ws) - 1
    for k in range(len(Ws)):
        p = jnp.dot(h, Ws[k][:].astype(dtype),
                    preferred_element_type=jnp.float32, precision=_PREC) + bs[k][:]
        if k < n_relu:
            masks.append(p > 0.0)
            h = jnp.maximum(p, 0.0).astype(dtype)
        else:
            h = p
    return h, masks


def _mask_bwd(c, Ws, masks, dtype):
    """Shared in-kernel cotangent chain: c @ W_K^T, then masked W_k^T hops."""
    g = jnp.dot(c.astype(dtype), Ws[-1][:].astype(dtype).T,
                preferred_element_type=jnp.float32, precision=_PREC)
    for k in range(len(Ws) - 2, -1, -1):
        g = jnp.where(masks[k], g, 0.0)
        g = jnp.dot(g.astype(dtype), Ws[k][:].astype(dtype).T,
                    preferred_element_type=jnp.float32, precision=_PREC)
    return g


def _enc_fwd_kernel(n_w, dtype, x_ref, *refs):
    Ws, bs, z_ref = refs[:n_w], refs[n_w:2 * n_w], refs[2 * n_w]
    z, _ = _chain_fwd(x_ref[:], Ws, bs, dtype)
    z_ref[:] = z


def _enc_bwd_kernel(n_w, dtype, x_ref, cz_ref, *refs):
    Ws, bs, cx_ref = refs[:n_w], refs[n_w:2 * n_w], refs[2 * n_w]
    _, masks = _chain_fwd(x_ref[:], Ws, bs, dtype)
    cx_ref[:] = _mask_bwd(cz_ref[:], Ws, masks, dtype)


def _dec_jvp_kernel(n_w, dtype, z_ref, u_ref, *refs):
    Ws, bs, v_ref = refs[:n_w], refs[n_w:2 * n_w], refs[2 * n_w]
    a = z_ref[:].astype(dtype)
    t = u_ref[:].astype(dtype)
    n_relu = n_w - 1
    for k in range(n_w):
        W = Ws[k][:].astype(dtype)
        p = jnp.dot(a, W, preferred_element_type=jnp.float32, precision=_PREC) + bs[k][:]
        tq = jnp.dot(t, W, preferred_element_type=jnp.float32, precision=_PREC)
        if k < n_relu:
            m = p > 0.0
            a = jnp.maximum(p, 0.0).astype(dtype)
            t = jnp.where(m, tq, 0.0).astype(dtype)
        else:
            t = tq
    v_ref[:] = t


def _dec_jvp_bwd_kernel(n_w, dtype, z_ref, cv_ref, *refs):
    Ws, bs, cu_ref = refs[:n_w], refs[n_w:2 * n_w], refs[2 * n_w]
    _, masks = _chain_fwd(z_ref[:], Ws, bs, dtype)
    cu_ref[:] = _mask_bwd(cv_ref[:], Ws, masks, dtype)


def _tile_call(kernel, folded: FoldedMLP, row_args: Sequence[jnp.ndarray],
               out_dim: int, dtype, interpret: bool, row_tile: int):
    """Run `kernel` over row tiles of the leading axis. row_args are (N, d_i)
    arrays; the output is (N, out_dim) f32. Handles padding to the tile."""
    N = row_args[0].shape[0]
    n_tiles = max(1, -(-N // row_tile))
    Np = n_tiles * row_tile
    padded = [jnp.pad(a, ((0, Np - N), (0, 0))) if Np > N else a
              for a in row_args]
    n_w = len(folded.Ws)
    bs2d = [b[None, :] for b in folded.bs]

    row_specs = [pl.BlockSpec((row_tile, a.shape[1]), lambda i: (i, 0))
                 for a in padded]
    w_specs = [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in folded.Ws]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs2d]

    out = pl.pallas_call(
        functools.partial(kernel, n_w, dtype),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Np, out_dim), jnp.float32),
        in_specs=row_specs + w_specs + b_specs,
        out_specs=pl.BlockSpec((row_tile, out_dim), lambda i: (i, 0)),
        interpret=interpret,
    )(*padded, *folded.Ws, *bs2d)
    return out[:N]


def make_enc_apply(folded: FoldedMLP, dtype=jnp.bfloat16,
                   interpret: bool = False, row_tile: int = ROW_TILE):
    """x (N, d_in) f32 -> z (N, d_out) f32, with a custom VJP whose backward
    recomputes the ReLU masks in-VMEM (residual = x alone)."""
    d_out = folded.Ws[-1].shape[1]

    @jax.custom_vjp
    def enc_apply(x):
        return _tile_call(_enc_fwd_kernel, folded, [x], d_out, dtype,
                          interpret, row_tile)

    def fwd(x):
        return enc_apply(x), x

    def bwd(x, cz):
        cx = _tile_call(_enc_bwd_kernel, folded, [x, cz],
                        folded.Ws[0].shape[0], dtype, interpret, row_tile)
        return (cx,)

    enc_apply.defvjp(fwd, bwd)
    return enc_apply


def make_dec_jvp(folded: FoldedMLP, dtype=jnp.bfloat16,
                 interpret: bool = False, row_tile: int = ROW_TILE):
    """(z, u) (N, d_in) f32 -> v = J_dec(z) u (N, d_out) f32.

    Custom VJP: cu via the masked transpose chain; cz = 0 exactly as ReLU
    autodiff yields (masks are piecewise constant)."""
    d_out = folded.Ws[-1].shape[1]

    @jax.custom_vjp
    def dec_jvp(z, u):
        return _tile_call(_dec_jvp_kernel, folded, [z, u], d_out, dtype,
                          interpret, row_tile)

    def fwd(z, u):
        return dec_jvp(z, u), z

    def bwd(z, cv):
        cu = _tile_call(_dec_jvp_bwd_kernel, folded, [z, cv],
                        folded.Ws[0].shape[0], dtype, interpret, row_tile)
        return (jnp.zeros_like(z), cu)

    dec_jvp.defvjp(fwd, bwd)
    return dec_jvp
