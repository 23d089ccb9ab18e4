"""Pallas two-loop L-BFGS direction kernel for external-gradient losses.

The plain/constrained sweeps run the ENTIRE protocol inside one fused kernel
(ops/pallas_lbfgs.py). The symmetry-regularized (EquivSINDy-r) sweeps cannot:
their closure gradient comes from XLA autodiff through frozen-AE JVPs and
Euler rollouts. There the per-iteration optimizer work — optax
`scale_by_lbfgs`'s two-loop recursion over a 100-pair memory — compiles to
~800 TINY HLOs per closure (dots over <=128-lane vectors), and the XPlane
profile of the flagship sweep shows those micro-ops are ~10 s of its 16 s
device time per 10-epoch chunk step (2x the actual AE penalty kernels).

This module keeps optax's exact algorithm and state layout but executes the
sequential two-loop (Nocedal alg. 7.4 — the only irreducibly sequential
part) as ONE Pallas program over VMEM-resident memory buffers:

    direction = gamma-scaled two-loop over chronologically-ordered
                (s_k, y_k, rho_k) pairs, identical operation order to
                optax._src.transform._precondition_by_lbfgs

`scale_by_lbfgs_pallas(memory_size)` is a drop-in replacement for
`optax.scale_by_lbfgs(memory_size)` (same NamedTuple field names, so
`opt_state[0].count` keeps working); `lbfgs_pallas(lr, memory_size)` mirrors
`optax.lbfgs(lr, linesearch=None, memory_size=...)`. Parity is guarded by
tests/test_lbfgs_dir.py (update-for-update vs optax on random streams and on
the real stepper trajectory).

Reference counterpart: torch.optim.LBFGS's two-loop (lbfgs.py step()), which
the optax path was verified against iterate-for-iterate
(tests/test_sweep.py::test_optax_lbfgs_matches_torch_trajectory).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _dir_kernel(m: int, g_ref, s_ref, y_ref, rho_ref, gam_ref, out_ref):
    """direction = H·g via the two-loop recursion, memory in VMEM.

    Batched over seeds on SUBLANES (like ops/pallas_lbfgs.py): g_ref (B,
    LANES); s_ref/y_ref (m, B, LANES) pairs in CHRONOLOGICAL order (oldest
    first); rho_ref (m, B, LANES) with rho_k broadcast across lanes (0 for
    empty slots — a zero weight makes the slot's update a no-op, exactly
    like optax's zero-initialized memory); gam_ref (B, LANES) gamma
    broadcast. Statically unrolled over m — one kernel for the whole chunk
    instead of ~8m tiny HLOs per seed.
    """
    q = g_ref[:]                       # (B, LANES)
    alphas = [None] * m
    # right products: newest -> oldest (optax reverse scan)
    for k in range(m - 1, -1, -1):
        sk = s_ref[k]
        yk = y_ref[k]
        rk = rho_ref[k][:, 0:1]        # (B, 1)
        a = rk * jnp.sum(sk * q, axis=1, keepdims=True)
        q = q - a * yk
        alphas[k] = a
    r = q * gam_ref[:]
    # left products: oldest -> newest (optax forward scan)
    for k in range(m):
        sk = s_ref[k]
        yk = y_ref[k]
        rk = rho_ref[k][:, 0:1]
        beta = rk * jnp.sum(yk * r, axis=1, keepdims=True)
        r = r + sk * (alphas[k] - beta)
    out_ref[:] = r


def _dir_call(g, s, y, rho, gam, interpret: bool):
    """(B,L)/(m,B,L)-shaped kernel launch shared by both custom_vmap paths."""
    m = s.shape[0]
    return pl.pallas_call(
        functools.partial(_dir_kernel, m),
        out_shape=jax.ShapeDtypeStruct(g.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, s, y, rho, gam)


def _make_two_loop(interpret: bool):
    """two_loop(g (n,), s/y (m, n) oldest-first, rho (m,), gamma ()) -> (n,).

    custom_vmap: under `jax.vmap` (the sweep's seed axis) the batch lands on
    KERNEL SUBLANES — one chunk-wide program — instead of pallas' default
    lift-to-grid, which serializes B single-seed programs of (1, LANES) ops
    and measured SLOWER than the XLA two-loop on the flagship sweep.
    """

    @jax.custom_batching.custom_vmap
    def two_loop(g, s_chrono, y_chrono, rho_chrono, gamma):
        m, n = s_chrono.shape
        pad = LANES - n
        gp = jnp.pad(g.astype(jnp.float32), (0, pad))[None, :]
        sp = jnp.pad(s_chrono.astype(jnp.float32), ((0, 0), (0, pad)))[:, None]
        yp = jnp.pad(y_chrono.astype(jnp.float32), ((0, 0), (0, pad)))[:, None]
        rp = jnp.broadcast_to(rho_chrono.astype(jnp.float32)[:, None, None],
                              (m, 1, LANES))
        gam = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32)[None, None],
                               (1, LANES))
        return _dir_call(gp, sp, yp, rp, gam, interpret)[0, :n]

    @two_loop.def_vmap
    def _two_loop_vmap(axis_size, in_batched, g, s, y, rho, gamma):
        B = axis_size

        def bcast(x, batched):
            x = jnp.asarray(x)
            if not batched:
                x = jnp.broadcast_to(x[None], (B,) + x.shape)
            return x

        g = bcast(g, in_batched[0])            # (B, n)
        s = bcast(s, in_batched[1])            # (B, m, n)
        y = bcast(y, in_batched[2])
        rho = bcast(rho, in_batched[3])        # (B, m)
        gamma = bcast(gamma, in_batched[4])    # (B,)
        m, n = s.shape[1], s.shape[2]
        pad = LANES - n
        gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad)))
        sp = jnp.pad(s.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pad))).transpose(1, 0, 2)
        yp = jnp.pad(y.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pad))).transpose(1, 0, 2)
        rp = jnp.broadcast_to(
            rho.astype(jnp.float32).T[:, :, None], (m, B, LANES))
        gam = jnp.broadcast_to(gamma.astype(jnp.float32)[:, None], (B, LANES))
        out = _dir_call(gp, sp, yp, rp, gam, interpret)
        return out[:, :n], True

    return two_loop


def two_loop_direction(g, s_chrono, y_chrono, rho_chrono, gamma,
                       interpret: bool = False):
    """H·g for one flat parameter vector (vmap-aware — see _make_two_loop).

    g: (n,) with n <= 128; s/y_chrono: (m, n) oldest-first; rho_chrono: (m,);
    gamma: scalar. Returns (n,).
    """
    n = s_chrono.shape[-1]
    if n > LANES:
        raise ValueError(
            f"--lbfgs_dir_backend pallas supports flat parameter vectors up "
            f"to {LANES} entries (one VMEM lane row); this problem has {n} "
            f"(e.g. latent_dim>=4 at poly_order 3). Use the default "
            f"--lbfgs_dir_backend xla, which is measured performance-neutral "
            f"(RESULTS.md 'Negative result')."
        )
    return _make_two_loop(interpret)(g, s_chrono, y_chrono, rho_chrono,
                                     jnp.asarray(gamma, jnp.float32))


class PallasLBFGSState(NamedTuple):
    """Field-compatible with optax.ScaleByLBFGSState (callers read .count)."""

    count: chex.Numeric
    params: optax.Params
    updates: optax.Params
    diff_params_memory: chex.ArrayTree
    diff_updates_memory: chex.ArrayTree
    weights_memory: chex.Array


def scale_by_lbfgs_pallas(memory_size: int = 100, interpret: bool = False):
    """optax.scale_by_lbfgs with the two-loop executed as one Pallas kernel.

    Same state layout, same memory-update rules (write at (count-1) % m,
    zeroed at count 0, weight = 1/(y·s) guarded at 0), same gamma
    (ys/yy, capped-reciprocal-norm first step), same two-loop operation
    order. Only the arithmetic *grouping* differs (VMEM kernel vs a chain
    of XLA dots) — parity within f32 rounding, guarded by tests.
    """
    if memory_size < 1:
        raise ValueError("memory_size must be >= 1")
    m = memory_size

    def flat(tree):
        return jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)])

    def unflat(vec, like):
        leaves = jax.tree_util.tree_leaves(like)
        out, i = [], 0
        for leaf in leaves:
            out.append(vec[i:i + leaf.size].reshape(leaf.shape).astype(leaf.dtype))
            i += leaf.size
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), out)

    def init_fn(params):
        stacked = jax.tree_util.tree_map(
            lambda leaf: jnp.zeros((m,) + leaf.shape, leaf.dtype), params)
        return PallasLBFGSState(
            count=jnp.asarray(0, jnp.int32),
            params=jax.tree_util.tree_map(jnp.zeros_like, params),
            updates=jax.tree_util.tree_map(jnp.zeros_like, params),
            diff_params_memory=stacked,
            diff_updates_memory=stacked,
            weights_memory=jnp.zeros(m),
        )

    def update_fn(updates, state, params):
        # 1. memory update (optax scale_by_lbfgs update_fn step 1, same
        # semantics): s = params - prev, y = g - prev_g, w = 1/(y·s).
        # Layout difference: optax keeps a RING buffer (write at
        # (count-1) % m, read in (count % m + arange(m)) % m order), which
        # costs a dynamic scatter + two dynamic gathers per closure —
        # batched dynamic gather/scatter serializes on XLA:TPU (the symgp
        # stack-machine lesson). We keep the memory CHRONOLOGICAL instead
        # and SHIFT on every update (drop oldest, append newest — one
        # contiguous copy). The (s, y, rho) sequence the two-loop consumes
        # is IDENTICAL: during fill, optax's read order visits its zero
        # slots first (weight 0 = no-op), exactly like our zero-padded
        # front; when full, ring-in-chronological-order == shifted buffer.
        diff_params = jax.tree_util.tree_map(jnp.subtract, params, state.params)
        diff_updates = jax.tree_util.tree_map(jnp.subtract, updates, state.updates)
        vdot = sum(jnp.vdot(dy, dp) for dy, dp in zip(
            jax.tree_util.tree_leaves(diff_updates),
            jax.tree_util.tree_leaves(diff_params)))
        weight = jnp.where(vdot == 0.0, 0.0, 1.0 / vdot)
        zero_first = lambda x: jnp.where(state.count > 0, x, jnp.zeros_like(x))
        diff_params = jax.tree_util.tree_map(zero_first, diff_params)
        diff_updates = jax.tree_util.tree_map(zero_first, diff_updates)
        weight = zero_first(weight)
        shift_in = lambda mem, v: jnp.concatenate([mem[1:], v[None]], axis=0)
        dpm = jax.tree_util.tree_map(shift_in, state.diff_params_memory,
                                     diff_params)
        dum = jax.tree_util.tree_map(shift_in, state.diff_updates_memory,
                                     diff_updates)
        wm = shift_in(state.weights_memory, weight)

        # 2. gamma (identity scale), optax semantics incl. the first-step
        # capped reciprocal norm
        num = sum(jnp.vdot(dy, dp) for dy, dp in zip(
            jax.tree_util.tree_leaves(diff_updates),
            jax.tree_util.tree_leaves(diff_params)))
        den = sum(jnp.sum(dy * dy)
                  for dy in jax.tree_util.tree_leaves(diff_updates))
        gamma = jnp.where(den > 0.0, num / den, 1.0)
        gnorm = jnp.sqrt(sum(jnp.sum(u * u) for u in
                             jax.tree_util.tree_leaves(
                                 jax.lax.stop_gradient(updates))))
        gamma = jnp.where(state.count > 0, gamma,
                          jnp.minimum(1.0, 1.0 / gnorm))

        # 3. two-loop in ONE kernel over chronologically-gathered memory
        # flatten the stacked-leaf memory trees to (m, n): ravel each leaf's
        # trailing dims, concat on the last axis (same order as flat());
        # already chronological — no reorder gather
        s_mem = jnp.concatenate(
            [x.reshape(m, -1) for x in jax.tree_util.tree_leaves(dpm)], axis=1)
        y_mem = jnp.concatenate(
            [x.reshape(m, -1) for x in jax.tree_util.tree_leaves(dum)], axis=1)
        direction = two_loop_direction(
            flat(updates), s_mem, y_mem, wm, gamma, interpret=interpret)
        precond = unflat(direction, updates)

        return precond, PallasLBFGSState(
            count=(state.count + 1).astype(jnp.int32),
            params=params, updates=updates,
            diff_params_memory=dpm, diff_updates_memory=dum,
            weights_memory=wm)

    return optax.GradientTransformation(init_fn, update_fn)


def lbfgs_pallas(learning_rate: float, memory_size: int = 100,
                 interpret: bool = False):
    """optax.lbfgs(lr, linesearch=None, memory_size=m) with the Pallas
    two-loop (same chain: scale_by_lbfgs then scale_by_learning_rate)."""
    return optax.chain(
        scale_by_lbfgs_pallas(memory_size, interpret=interpret),
        optax.scale_by_learning_rate(learning_rate),
    )
