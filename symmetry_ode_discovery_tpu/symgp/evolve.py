"""Genetic-programming evolution loop: TPU fitness + host breeding.

Replaces the reference's PySR/SymbolicRegression.jl backend
(main_pysr.py:135-214). Division of labor:

- FITNESS on device: the whole population evaluates on the whole dataset in
  one vectorized program (tape.py), including the symmetry-regularized
  objective (the reference's custom Julia `symmreg` objective,
  main_pysr.py:80-133): loss = MSE + w_sym_reg * sum_i ||J_gi h(x) - h(gi x)||^2
  using precomputed g(x), J_g(x) tables.
- CONSTANT optimization on device: constants are differentiable through the
  tape interpreter, so the entire population's constants are tuned by a few
  vmapped Adam steps per generation (PySR does per-expression host BFGS).
- BREEDING on host: tournament selection + postfix-subtree crossover +
  point/subtree mutation, in the C++ core (native/evolve.cpp via ctypes) with
  a numpy fallback of identical semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tape import (
    ARITY, CONST, PAD, VAR, TapeSpec, eval_tapes, random_population, random_tape, spec_op_table,
    tape_length,
)


@dataclasses.dataclass(frozen=True)
class GPConfig:
    pop_size: int = 512
    n_generations: int = 40  # reference 'niterations' (main_pysr.py:139)
    tournament_size: int = 5
    p_crossover: float = 0.5
    p_mutate: float = 0.5
    elitism: int = 4
    parsimony: float = 0.0016  # complexity penalty (main_pysr.py:146)
    const_opt_steps: int = 8
    const_opt_lr: float = 0.05
    seed: int = 0


# ---------------------------------------------------------------------------
# Breeding (host). numpy reference implementation; the C++ core mirrors it.
# ---------------------------------------------------------------------------

def subtree_span(ops_row: np.ndarray, i: int) -> int:
    """Start index of the postfix subtree ending at position i."""
    need = 1
    j = i
    while need > 0 and j >= 0:
        need -= 1
        need += int(ARITY[ops_row[j]])
        j -= 1
    return j + 1


def _splice(parent_a, parent_b, rng, spec: TapeSpec):
    """Subtree crossover: replace a random subtree of A with one of B."""
    ops_a, arg_a, c_a = parent_a
    ops_b, arg_b, c_b = parent_b
    la = int(tape_length(ops_a[None])[0])
    lb = int(tape_length(ops_b[None])[0])
    ia = int(rng.integers(la))
    ib = int(rng.integers(lb))
    sa = subtree_span(ops_a, ia)
    sb = subtree_span(ops_b, ib)
    new_len = sa + (ib - sb + 1) + (la - ia - 1)
    if new_len > spec.max_len:
        return parent_a
    ops = np.concatenate([ops_a[:sa], ops_b[sb:ib + 1], ops_a[ia + 1:la]])
    arg = np.concatenate([arg_a[:sa], arg_b[sb:ib + 1], arg_a[ia + 1:la]])
    cc = np.concatenate([c_a[:sa], c_b[sb:ib + 1], c_a[ia + 1:la]])
    pad = spec.max_len - len(ops)
    return (np.concatenate([ops, np.zeros(pad, np.int32)]),
            np.concatenate([arg, np.zeros(pad, np.int32)]),
            np.concatenate([cc, np.zeros(pad, np.float32)]))


def _mutate(ind, rng, spec: TapeSpec):
    ops, arg, cc = (x.copy() for x in ind)
    L = int(tape_length(ops[None])[0])
    r = rng.random()
    if r < 0.4:  # point mutation
        i = int(rng.integers(L))
        op = int(ops[i])
        if op == VAR:
            arg[i] = int(rng.integers(spec.n_vars))
        elif op == CONST:
            cc[i] = cc[i] * (1 + 0.3 * rng.standard_normal()) + 0.1 * rng.standard_normal()
        elif ARITY[op] == 2:
            ops[i] = int(rng.choice(list(spec.binary_ops)))
        elif ARITY[op] == 1 and spec.unary_ops:
            ops[i] = int(rng.choice(list(spec.unary_ops)))
    elif r < 0.55 and L > 1:  # hoist: promote a subtree (bloat control)
        i = int(rng.integers(L))
        s = subtree_span(ops, i)
        seg = slice(s, i + 1)
        n = i + 1 - s
        ops = np.concatenate([ops[seg], np.zeros(spec.max_len - n, np.int32)])
        arg = np.concatenate([arg[seg], np.zeros(spec.max_len - n, np.int32)])
        cc = np.concatenate([cc[seg], np.zeros(spec.max_len - n, np.float32)])
    elif r < 0.8:  # subtree replacement
        i = int(rng.integers(L))
        s = subtree_span(ops, i)
        new_ops, new_arg, new_c = random_tape(rng, spec, int(rng.integers(1, 8)))
        nlen = int(tape_length(new_ops[None])[0])
        total = s + nlen + (L - i - 1)
        if total <= spec.max_len:
            ops = np.concatenate([ops[:s], new_ops[:nlen], ops[i + 1:L],
                                  np.zeros(spec.max_len - total, np.int32)])
            arg = np.concatenate([arg[:s], new_arg[:nlen], arg[i + 1:L],
                                  np.zeros(spec.max_len - total, np.int32)])
            cc = np.concatenate([cc[:s], new_c[:nlen], cc[i + 1:L],
                                 np.zeros(spec.max_len - total, np.float32)])
    else:  # fresh individual
        return random_tape(rng, spec, int(rng.integers(1, 10)))
    return ops, arg, cc


def breed_numpy(population, fitness: np.ndarray, rng, spec: TapeSpec, cfg: GPConfig):
    """One generation of tournament selection + crossover + mutation."""
    ops, args, consts = population
    P = ops.shape[0]
    order = np.argsort(fitness)
    new = [(ops[i].copy(), args[i].copy(), consts[i].copy()) for i in order[:cfg.elitism]]

    def tournament():
        idx = rng.integers(P, size=cfg.tournament_size)
        return idx[np.argmin(fitness[idx])]

    while len(new) < P:
        a = tournament()
        ind = (ops[a], args[a], consts[a])
        if rng.random() < cfg.p_crossover:
            b = tournament()
            ind = _splice(ind, (ops[b], args[b], consts[b]), rng, spec)
        if rng.random() < cfg.p_mutate:
            ind = _mutate(ind, rng, spec)
        new.append(ind)
    return (np.stack([n[0] for n in new]), np.stack([n[1] for n in new]),
            np.stack([n[2] for n in new]))


def _load_native():
    """The C++ breeding core; builds it on demand via symgp/native/build.sh
    (the .so is not version-controlled). Returns None when no toolchain is
    available or the binary fails to load (wrong arch/ABI) — callers fall
    back to breed_numpy."""
    import ctypes
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(__file__), "native")
    so = os.path.join(native_dir, "libevolve.so")
    src = os.path.join(native_dir, "evolve.cpp")
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if stale or not os.path.exists(so):
        # a stale .so (older than evolve.cpp) may have drifted semantically;
        # rebuild, and if the rebuild fails use the numpy fallback rather
        # than silently diverging from the source
        try:
            subprocess.run(["bash", os.path.join(native_dir, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ptrs = [i32p, i32p, f32p, f32p, i32p, i32p, f32p]
    tail = [ctypes.c_int, ctypes.c_int,               # tournament, elitism
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            i32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_float, ctypes.c_ulonglong]
    lib.breed.argtypes = ptrs + [ctypes.c_int, ctypes.c_int] + tail  # P, L
    if hasattr(lib, "breed_grouped"):  # absent only in a stale prebuilt .so
        lib.breed_grouped.argtypes = (
            ptrs + [ctypes.c_int] * 3 + tail)  # n_groups, group, L
    return lib


_NATIVE = None
_NATIVE_TRIED = False


def get_native():
    """Process-wide cached handle to the C++ breeding core (None when
    unavailable). ALL native users must come through here — _load_native can
    shell out to the compiler, so calling it per generation is pathological
    on toolchain-less machines."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE = _load_native()
        _NATIVE_TRIED = True
    return _NATIVE


def call_native_breed(fn, population, fitness, dims, rng, spec: TapeSpec,
                      cfg: GPConfig):
    """Shared ctypes marshalling for `breed` / `breed_grouped` (identical
    pointer layout and config tail; `dims` carries the per-entry-point
    integer dims — (P, L) or (n_groups, group, L))."""
    import ctypes

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ops, args, consts = (np.ascontiguousarray(x) for x in population)
    out_ops = np.zeros_like(ops)
    out_args = np.zeros_like(args)
    out_consts = np.zeros_like(consts)
    fit = np.ascontiguousarray(np.asarray(fitness, np.float32))
    bins = np.asarray(list(spec.binary_ops), np.int32)
    uns = np.asarray(list(spec.unary_ops) or [0], np.int32)
    fn(ops.ctypes.data_as(i32p), args.ctypes.data_as(i32p),
       consts.ctypes.data_as(f32p), fit.ctypes.data_as(f32p),
       out_ops.ctypes.data_as(i32p), out_args.ctypes.data_as(i32p),
       out_consts.ctypes.data_as(f32p),
       *dims, cfg.tournament_size, cfg.elitism,
       cfg.p_crossover, cfg.p_mutate, spec.n_vars,
       bins.ctypes.data_as(i32p), len(bins),
       uns.ctypes.data_as(i32p), len(spec.unary_ops),
       spec.const_range, int(rng.integers(2 ** 63)))
    return out_ops, out_args, out_consts


def breed(population, fitness, rng, spec: TapeSpec, cfg: GPConfig):
    lib = get_native()
    if lib is None:
        return breed_numpy(population, fitness, rng, spec, cfg)
    P, L = population[0].shape
    return call_native_breed(lib.breed, population, fitness, (P, L),
                             rng, spec, cfg)


# ---------------------------------------------------------------------------
# Fitness + constant optimization (device)
# ---------------------------------------------------------------------------

def make_fitness_fn(spec: TapeSpec, X: jnp.ndarray, y: jnp.ndarray):
    """Plain per-dimension regression device loss: MSE(h(X), y) with
    non-finite (diverged / stack-overflowed) tapes scored +inf (reference
    main_pysr.py:170-212 loss; the parsimony term is added on the host by
    the evolution driver)."""

    @jax.jit
    def fitness(ops, args, consts):
        pred = eval_tapes(ops, args, consts, X, spec.stack_depth,
                          op_table=spec_op_table(spec))
        mse = jnp.mean((pred - y[None, :]) ** 2, axis=1)
        return jnp.where(jnp.isfinite(mse), mse, jnp.inf)

    return fitness


def make_gen_step(loss_fn, steps: int, lr: float, group: int = 1):
    """ONE jitted call per generation: constant optimization + fitness, with a
    single host sync (the TPU tunnel makes per-call round trips expensive, so
    the whole generation's device work is fused).

    loss_fn maps (ops, args, consts) -> per-GROUP losses ((P/group,)); consts
    acceptance is per group (all `group` component tapes share the decision).
    Returns gen(ops, args, consts) -> (final_consts, fitness) device arrays.
    """
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def gen(opsj, argsj, c0):
        if steps > 0:
            def step(carry, _):
                c, s = carry
                g = jax.grad(lambda cc: jnp.sum(loss_fn(opsj, argsj, cc)))(c)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                upd, s = opt.update(g, s, c)
                return (optax.apply_updates(c, upd), s), None

            (c_new, _), _ = jax.lax.scan(step, (c0, opt.init(c0)), None, length=steps)
            f_old = loss_fn(opsj, argsj, c0)
            f_new = loss_fn(opsj, argsj, c_new)
            take = f_new < f_old
            take_rows = jnp.repeat(take, group)
            c_final = jnp.where(take_rows[:, None], c_new, c0)
            fit = jnp.minimum(f_new, f_old)
        else:
            c_final = c0
            fit = loss_fn(opsj, argsj, c0)
        return c_final, fit

    return gen


def symbolic_regression(
    X: np.ndarray,
    y: np.ndarray,
    spec: TapeSpec,
    cfg: GPConfig,
    device_loss=None,
    verbose: bool = False,
):
    """Evolve expressions fitting y = h(X). Returns (best individual, history).

    device_loss optionally overrides the per-tape loss
    (ops, args, consts) -> (P,); the driver adds the parsimony term.
    """
    rng = np.random.default_rng(cfg.seed)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    if device_loss is None:
        device_loss = make_fitness_fn(spec, Xj, yj)

    population = random_population(rng, spec, cfg.pop_size)
    gen_step = make_gen_step(device_loss, cfg.const_opt_steps, cfg.const_opt_lr)
    best = None
    best_fit = np.inf
    history = []
    for gen in range(cfg.n_generations):
        c_final, base = jax.device_get(gen_step(
            jnp.asarray(population[0]), jnp.asarray(population[1]),
            jnp.asarray(population[2])))
        population = (population[0], population[1], c_final)
        fit = base + cfg.parsimony * tape_length(population[0])
        i = int(np.argmin(fit))
        if fit[i] < best_fit:
            best_fit = float(fit[i])
            best = (population[0][i].copy(), population[1][i].copy(),
                    population[2][i].copy())
        history.append(best_fit)
        if verbose and gen % 10 == 0:
            from .tape import tape_to_string

            print(f"gen {gen}: best {best_fit:.6f}  {tape_to_string(*best)}")
        population = breed(population, fit, rng, spec, cfg)
    return best, history
