"""Multi-seed GP sweeps: seeds as a device batch axis.

The reference runs its PySR loop once per subsample seed, sequentially
(reference main_pysr.py:48-55, `for seed in range(100)`), each a full Julia
evolution. Here the seed axis is another population axis: ONE device program
per generation evaluates and constant-optimizes EVERY seed's population on
that seed's own data subsample (vmap over units), and the host breeds each
unit with the C++ core. Two unit layouts:

- plain mode (gp_sweep_plain): units are (seed, dimension) pairs — per-dim
  independent regression like the reference's plain PySR fit
  (main_pysr.py:170-214);
- system mode (gp_sweep_system): units are seeds; each unit holds `group=2`
  interleaved component tapes and the symmetry-regularized objective
  (main_pysr.py:80-133).

Constant optimization is top-K: fitness ranks the whole population first,
then Adam tunes constants only for the best K groups per unit (PySR likewise
optimizes constants only for a fraction of mutants per iteration:
optimizer_probability). This cuts per-generation device FLOPs ~3x with no
measurable loss in discovery rate.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .evolve import GPConfig, breed
from .tape import TapeSpec, eval_tapes, spec_op_table, tape_length


def _eval_fn(spec: TapeSpec, backend: str):
    """The tape evaluator for a unit loss: 'xla' (autodiff-capable
    lax.scan interpreter), 'pallas' (forward-only VMEM kernel —
    pallas_eval.py; fitness/ranking only), or 'pallas_grad' (same forward,
    plus the zero-residual VMEM VJP kernel for d/d consts — usable in the
    const-opt gradient loss)."""
    if backend in ("pallas", "pallas_grad"):
        from .pallas_eval import eval_tapes_pallas, make_diff_eval_pallas

        interpret = jax.default_backend() == "cpu"  # CPU tests

        if backend == "pallas_grad":
            cache = {}

            def ev(ops, args, consts, X, stack_depth, op_table):
                key = (stack_depth, op_table)
                if key not in cache:
                    cache[key] = make_diff_eval_pallas(
                        stack_depth, op_table, interpret=interpret)
                return cache[key](ops, args, consts, X)

            return ev

        def ev(ops, args, consts, X, stack_depth, op_table):
            return eval_tapes_pallas(ops, args, consts, X, stack_depth,
                                     op_table=op_table, interpret=interpret)

        return ev
    if backend != "xla":
        raise ValueError(f"unknown eval backend: {backend!r}")
    return eval_tapes


def _system_unit_loss(spec: TapeSpec, w_sym_reg: float, n_g: int,
                      reference_bug_compat: bool = False, eval_dtype=None,
                      backend: str = "xla"):
    """Per-unit loss for interleaved 2-component tapes.

    (ops (2P,L), args, consts, X (N,d), dX (N,d), gx (n_g,N,d),
    Jg (n_g,N,d,d)) -> (P,). Same math as objective.make_symmreg_fitness but
    with the data as traced arguments so it vmaps over units.

    eval_dtype: optional dtype for the tape-machine evaluation (the VPU is
    2x faster in bf16 and the one-hot interpreter is compute-bound —
    RESULTS.md wall-clock section). Predictions are cast back to f32 before
    the loss reductions, so only per-element prediction rounding (~0.4%)
    enters the fitness; constant-optimization gradients stay full f32.
    """

    evaluate = _eval_fn(spec, backend)

    def loss(ops, args, consts, X, dX, gx, Jg):
        N, d = X.shape
        if n_g:
            all_pts = jnp.concatenate([X[None], gx], axis=0).reshape(-1, d)
        else:
            all_pts = X
        if eval_dtype is not None:
            all_pts = all_pts.astype(eval_dtype)
            consts = consts.astype(eval_dtype)
        preds = evaluate(ops, args, consts, all_pts, spec.stack_depth,
                         op_table=spec_op_table(spec)).astype(jnp.float32)
        P2 = preds.shape[0]
        preds = preds.reshape(P2 // 2, 2, -1)
        h_x = preds[:, :, :N]
        out = jnp.mean((jnp.swapaxes(h_x, 1, 2) - dX[None]) ** 2, axis=(1, 2))
        for i in range(n_g):
            h_gx = preds[:, :, (1 + i) * N:(2 + i) * N]
            if reference_bug_compat:
                lhs = jnp.einsum("nij,pjn->pin", Jg[i], h_gx)
            else:
                lhs = jnp.einsum("nij,pjn->pin", Jg[i], h_x)
            out = out + w_sym_reg * jnp.mean((lhs - h_gx) ** 2, axis=(1, 2))
        return jnp.where(jnp.isfinite(out), out, jnp.inf)

    return loss


def _plain_unit_loss(spec: TapeSpec, eval_dtype=None, backend: str = "xla"):
    """(ops (P,L), args, consts, X (N,d), y (N,)) -> (P,).

    eval_dtype: see _system_unit_loss — bf16 tape evaluation, f32 loss."""
    evaluate = _eval_fn(spec, backend)

    def loss(ops, args, consts, X, y):
        if eval_dtype is not None:
            X = X.astype(eval_dtype)
            consts = consts.astype(eval_dtype)
        pred = evaluate(ops, args, consts, X, spec.stack_depth,
                        op_table=spec_op_table(spec)).astype(jnp.float32)
        mse = jnp.mean((pred - y[None, :]) ** 2, axis=1)
        return jnp.where(jnp.isfinite(mse), mse, jnp.inf)

    return loss


def make_sweep_gen_step(unit_loss, steps: int, lr: float, topk: int,
                        group: int = 1, n_data: int = 0, mesh=None,
                        fit_loss=None):
    """Fused per-generation device program, vmapped over units.

    unit_loss(ops, args, consts, *data) -> (P,) group losses.
    Returns gen(ops (U,G*P,L), args, consts, *data_batched) ->
    (consts (U,G*P,L), fitness (U,P)).

    `data_batched` carries TWO copies of the per-unit data tuple (n_data
    arrays each): the full batch, used for population fitness and the
    accept/reject comparison, and a row-subsampled copy used only inside the
    Adam constant-optimization gradient. Differentiating the tape evaluator
    retains a (tape_len, topk, stack_depth, N) mask buffer per unit, which at
    N=2500 / topk=256 over 20 vmapped units exceeds v5e HBM (measured 19.2G);
    gradients on ~512 rows keep the tuned constants statistically identical
    (full-batch fitness still gates acceptance) at ~1/5 the memory and FLOPs.

    mesh: optional 1-D jax Mesh with a "seed" axis — the unit axis is
    sharded over it (shard_map, embarrassingly parallel like every other
    sweep in this framework; the unit count must be divisible by the mesh
    size — _run_sweep pads).

    fit_loss: optional loss used for the full-batch fitness evaluations
    (population ranking + const-opt accept/reject) — e.g. a bf16-eval
    variant of unit_loss. The Adam gradient always differentiates
    unit_loss (full f32). Defaults to unit_loss.
    """
    import optax

    opt = optax.adam(lr)
    if fit_loss is None:
        fit_loss = unit_loss

    def unit_gen(ops, args, consts, *all_data):
        data = all_data[:n_data] if n_data else all_data
        data_small = all_data[n_data:] if n_data else all_data
        fit0 = fit_loss(ops, args, consts, *data)  # (P,)
        if steps <= 0 or topk <= 0:
            return consts, fit0
        # best-K groups by current fitness
        _, idx = jax.lax.top_k(-fit0, topk)  # (K,)
        rows = (idx[:, None] * group + jnp.arange(group)[None, :]).reshape(-1)
        sub_ops = ops[rows]
        sub_args = args[rows]
        c0 = consts[rows]

        def step(carry, _):
            c, s = carry
            g = jax.grad(lambda cc: jnp.sum(unit_loss(sub_ops, sub_args, cc,
                                                      *data_small)))(c)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            upd, s = opt.update(g, s, c)
            return (optax.apply_updates(c, upd), s), None

        (c_new, _), _ = jax.lax.scan(step, (c0, opt.init(c0)), None,
                                     length=steps)
        fit_new = fit_loss(sub_ops, sub_args, c_new, *data)
        fit_old = fit0[idx]
        take = fit_new < fit_old
        c_final = jnp.where(jnp.repeat(take, group)[:, None], c_new, c0)
        consts = consts.at[rows].set(c_final)
        fitness = fit0.at[idx].set(jnp.minimum(fit_new, fit_old))
        return consts, fitness

    batched = jax.vmap(unit_gen)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        batched = jax.shard_map(batched, mesh=mesh, in_specs=P("seed"),
                                out_specs=P("seed"), check_vma=False)
    return jax.jit(batched)


@dataclasses.dataclass
class SweepResult:
    best: List[tuple]        # per unit: (ops, args, consts) or pair thereof
    best_fit: np.ndarray     # (U,)
    history: np.ndarray      # (U, n_generations)


def _run_sweep(populations, data_arrays, unit_loss, spec, cfg: GPConfig,
               rngs, group: int, topk: int, verbose: bool = False,
               gen_cb=None, data_small=None, select: str = "penalized",
               mesh=None, fit_loss=None):
    """Shared evolution driver over a batch of units.

    populations: (ops (U,G*P,L), args, consts) numpy arrays.
    data_arrays: tuple of (U, ...) jnp arrays passed to unit_loss.
    data_small: optional row-subsampled copy of data_arrays for the
        constant-optimization gradient (see make_sweep_gen_step).
    rngs: per-unit np.random.Generator list (breeding).
    select: which score picks the reported best — 'penalized' (loss +
        parsimony * length, PySR model_selection='best' elbow behavior, the
        plain-mode default) or 'raw' (pure loss, PySR 'accuracy' — what the
        reference sets for the symmetry-regularized mode,
        main_pysr.py:137,151). Breeding always uses the penalized fitness.
    """
    ops, args, consts = populations
    U = ops.shape[0]
    P = ops.shape[1] // group
    if data_small is None:
        data_small = data_arrays
    pad = 0
    if mesh is not None:
        # shard_map needs the unit axis divisible by the mesh: duplicate the
        # last unit (the duplicates' outputs are sliced off below; their
        # populations never feed breeding)
        m = mesh.devices.size
        pad = (-U) % m
        if pad:
            def pad_u(a):
                reps = jnp.concatenate if isinstance(a, jnp.ndarray) else np.concatenate
                return reps([a] + [a[-1:]] * pad, axis=0)
            ops, args, consts = pad_u(ops), pad_u(args), pad_u(consts)
            data_arrays = tuple(pad_u(a) for a in data_arrays)
            data_small = tuple(pad_u(a) for a in data_small)
    gen_step = make_sweep_gen_step(unit_loss, cfg.const_opt_steps,
                                   cfg.const_opt_lr, topk, group,
                                   n_data=len(data_arrays), mesh=mesh,
                                   fit_loss=fit_loss)
    data_arrays = tuple(data_arrays) + tuple(data_small)
    best = [None] * U
    best_fit = np.full(U, np.inf)
    history = np.zeros((U, cfg.n_generations), np.float32)

    Up = U + pad
    for gen in range(cfg.n_generations):
        c_final, base = jax.device_get(gen_step(
            jnp.asarray(ops), jnp.asarray(args), jnp.asarray(consts),
            *data_arrays))
        consts = c_final
        lens = tape_length(ops.reshape(Up * group * P, -1)).reshape(Up, P, group).sum(-1)
        fit = base + cfg.parsimony * lens  # (Up, P); rows >= U are padding
        score = np.asarray(base) if select == "raw" else fit
        for u in range(U):
            i = int(np.argmin(score[u]))
            # "or best is None": a unit whose every score is inf/NaN (e.g. a
            # corrupt data row) must still record SOME tape, or the per-seed
            # unpacking in gp_sweep_plain/system crashes after the whole sweep
            if best[u] is None or score[u, i] < best_fit[u]:
                best_fit[u] = float(score[u, i])
                rows = slice(group * i, group * (i + 1))
                best[u] = (ops[u, rows].copy(), args[u, rows].copy(),
                           consts[u, rows].copy())
            history[u, gen] = best_fit[u]
        if verbose and gen % 10 == 0:
            print(f"gen {gen}: best fit median {np.median(best_fit):.5f} "
                  f"min {best_fit.min():.5f}")
        if gen_cb is not None:
            gen_cb(gen, best, best_fit)
        # host breeding per REAL unit (C++ core); padding rows just mirror
        # the last real unit so the next device call stays well-formed
        new_ops = np.empty_like(ops)
        new_args = np.empty_like(args)
        new_consts = np.empty_like(consts)
        for u in range(U):
            pop_u = (ops[u], args[u], consts[u])
            if group == 1:
                o, a, c = breed(pop_u, fit[u], rngs[u], spec, cfg)
            else:
                from .objective import paired_breed

                o, a, c = paired_breed(pop_u, fit[u], rngs[u], spec, cfg)
            new_ops[u], new_args[u], new_consts[u] = o, a, c
        for u in range(U, Up):
            new_ops[u], new_args[u], new_consts[u] = (new_ops[U - 1],
                                                      new_args[U - 1],
                                                      new_consts[U - 1])
        ops, args, consts = new_ops, new_args, new_consts

    return SweepResult(best=best, best_fit=best_fit, history=history)


def gp_sweep_plain(
    X_all: np.ndarray,           # (S, N, d) per-seed subsamples
    dX_all: np.ndarray,          # (S, N, d)
    spec: TapeSpec,
    cfg: GPConfig,
    seeds,
    topk: Optional[int] = None,
    verbose: bool = False,
    const_subsample: int = 512,
    mesh=None,
    eval_dtype=None,
    eval_backend: str = "xla",
    grad_backend: str = "xla",
    select: str = "penalized",
):
    """Per-dimension independent GP for S seeds: units are (seed, dim).

    eval_dtype: optional dtype (e.g. jnp.bfloat16) for the full-batch
    fitness tape evaluations — ~1.9x faster on the VPU; constant
    optimization stays f32 (see _plain_unit_loss).
    eval_backend: 'xla' or 'pallas' for those same fitness evaluations
    (the VMEM stack-machine kernel, pallas_eval.py).
    grad_backend: 'xla' (autodiff through the scan interpreter) or 'pallas'
    (zero-residual fused VJP kernel) for the const-opt gradient loss —
    always f32 either way.
    select: 'penalized' (PySR 'best', the reference's plain-mode selection)
    or 'raw' (PySR 'accuracy') — see _run_sweep. Breeding is unaffected.

    Returns a list (per seed) of per-dim best tapes
    [[(ops,args,consts) for dim in d] for seed in S].
    """
    S, N, d = X_all.shape
    topk = topk if topk is not None else max(1, cfg.pop_size // 4)
    rngs = [np.random.default_rng(int(1000 * s + dim))
            for s in seeds for dim in range(d)]
    pops = []
    from .tape import random_population

    for rng in rngs:
        pops.append(random_population(rng, spec, cfg.pop_size))
    ops = np.stack([p[0] for p in pops])
    args = np.stack([p[1] for p in pops])
    consts = np.stack([p[2] for p in pops])

    X_u = jnp.asarray(np.repeat(X_all, d, axis=0))          # (U, N, d)
    y_u = jnp.asarray(np.stack([dX_all[s, :, dim]
                                for s in range(S) for dim in range(d)]))
    k = min(N, const_subsample)  # rows are already a random subsample
    grad_be = "pallas_grad" if grad_backend == "pallas" else "xla"
    # fit_loss=None falls back to the GRAD loss for fitness — only valid
    # when that loss's forward is exactly the requested fitness evaluator
    # (grad_backend pallas makes its forward the Pallas kernel)
    grad_fwd = "pallas" if grad_backend == "pallas" else "xla"
    fit_loss = (None if eval_dtype is None and eval_backend == grad_fwd
                else _plain_unit_loss(spec, eval_dtype=eval_dtype,
                                      backend=eval_backend))
    res = _run_sweep((ops, args, consts), (X_u, y_u),
                     _plain_unit_loss(spec, backend=grad_be), spec, cfg,
                     rngs, group=1,
                     topk=topk, verbose=verbose,
                     data_small=(X_u[:, :k], y_u[:, :k]), mesh=mesh,
                     fit_loss=fit_loss, select=select)
    # each res.best[u] is (ops (1,L), args, consts) — squeeze the group axis
    per_seed = [[tuple(arr[0] for arr in res.best[s * d + dim])
                 for dim in range(d)] for s in range(S)]
    return per_seed, res


def gp_sweep_system(
    X_all: np.ndarray,           # (S, N, d)
    dX_all: np.ndarray,
    spec: TapeSpec,
    cfg: GPConfig,
    seeds,
    gx_all: Optional[np.ndarray] = None,    # (S, n_g, N, d)
    Jgx_all: Optional[np.ndarray] = None,   # (S, n_g, N, d, d)
    w_sym_reg: float = 0.0,
    topk: Optional[int] = None,
    verbose: bool = False,
    const_subsample: int = 512,
    mesh=None,
    eval_dtype=None,
    eval_backend: str = "xla",
    grad_backend: str = "xla",
):
    """Two-component system GP (optionally symmetry-regularized) for S seeds.

    eval_dtype / eval_backend / grad_backend: dtype and evaluators for the
    full-batch fitness and const-opt gradient losses (see gp_sweep_plain).

    Returns (per-seed best pairs [((ops,args,consts) h1, h2)], SweepResult).
    """
    S, N, d = X_all.shape
    assert d == 2
    n_g = 0 if gx_all is None else gx_all.shape[1]
    topk = topk if topk is not None else max(1, cfg.pop_size // 4)
    rngs = [np.random.default_rng(int(s)) for s in seeds]
    from .objective import paired_population

    pops = [paired_population(rng, spec, cfg.pop_size) for rng in rngs]
    ops = np.stack([p[0] for p in pops])
    args = np.stack([p[1] for p in pops])
    consts = np.stack([p[2] for p in pops])

    data = (jnp.asarray(X_all), jnp.asarray(dX_all))
    if n_g:
        data = data + (jnp.asarray(gx_all), jnp.asarray(Jgx_all))
    else:
        data = data + (jnp.zeros((S, 0, N, d)), jnp.zeros((S, 0, N, d, d)))
    k = min(N, const_subsample)  # rows are already a random subsample
    data_small = (data[0][:, :k], data[1][:, :k],
                  data[2][:, :, :k], data[3][:, :, :k])
    grad_be = "pallas_grad" if grad_backend == "pallas" else "xla"
    grad_fwd = "pallas" if grad_backend == "pallas" else "xla"  # see gp_sweep_plain
    fit_loss = (None if eval_dtype is None and eval_backend == grad_fwd
                else _system_unit_loss(spec, w_sym_reg, n_g,
                                       eval_dtype=eval_dtype,
                                       backend=eval_backend))
    res = _run_sweep((ops, args, consts), data,
                     _system_unit_loss(spec, w_sym_reg, n_g,
                                       backend=grad_be), spec, cfg,
                     rngs, group=2, topk=topk, verbose=verbose,
                     data_small=data_small, select="raw", mesh=mesh,
                     fit_loss=fit_loss)
    per_seed = [tuple((res.best[s][0][c], res.best[s][1][c], res.best[s][2][c])
                      for c in range(2)) for s in range(S)]
    return per_seed, res
