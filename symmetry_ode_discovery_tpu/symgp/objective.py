"""Symmetry-regularized GP objective (EquivGP-r).

Counterpart of the reference's embedded Julia `symmreg` objective
(main_pysr.py:80-133): a candidate system h = (h1, h2) is scored by

    loss = MSE(h(x), dx) + w_sym_reg * sum_i mean || J_gi(x) h(x) - h(gi x) ||^2

using precomputed group transforms g_i(x) and Jacobians J_gi(x)
(training/symmreg.precompute_symmreg_r). NOTE the reference's Julia code
computes `Jgxhx .- hgx` — i.e. J_g h(x) - h(g x) where the first h is ALSO
evaluated at gx in its hgx variable but the Jacobian product uses hgx too
(main_pysr.py:117-123: Jgxhx = Jgx * hgx with hgx = h(gx)); we follow the
MATH of symmreg_r (J_g(x) h(x) - h(g x), model_utils.py:160-168), which is
what the Julia code intends (its use of hgx in both terms is a reference bug
that makes the penalty (J_g - I) h(gx)).

Two components are represented as two tapes evaluated with the same engine;
fitness fuses all evaluations of x and every g_i(x) in one device program.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tape import TapeSpec, tape_length


def make_symmreg_fitness(
    spec: TapeSpec,
    X: jnp.ndarray,            # (N, d)
    dX: jnp.ndarray,           # (N, d)
    gx_list: List[jnp.ndarray],   # each (N, d)
    Jgx_list: List[jnp.ndarray],  # each (N, d, d)
    w_sym_reg: float,
    parsimony: float,
    reference_bug_compat: bool = False,
):
    """Fitness for two-component systems (d == 2, like the reference's Julia
    objective which is hard-coded to 2 components, main_pysr.py:88).

    Population is a pair of tape arrays: component tapes are stored
    interleaved — ops[2k] is h1 of individual k, ops[2k+1] is h2.
    Returns (full_fitness(population) -> np (P,), device_loss for const-opt).
    """
    d = X.shape[1]
    assert d == 2, "two-component objective (reference main_pysr.py:88)"
    n_g = len(gx_list)
    N = X.shape[0]
    # one implementation of the symmreg math: the sweep's per-unit loss,
    # with this problem's data closed over (single-unit specialization)
    from .sweep import _system_unit_loss

    unit = _system_unit_loss(spec, w_sym_reg, n_g,
                             reference_bug_compat=reference_bug_compat)
    gx = (jnp.stack(gx_list) if n_g else jnp.zeros((0, N, d), X.dtype))
    Jg = (jnp.stack(Jgx_list) if n_g else jnp.zeros((0, N, d, d), X.dtype))

    def device_loss(ops, args, consts):
        # ops: (2P, L) interleaved components -> (P,)
        return unit(ops, args, consts, X, dX, gx, Jg)

    jit_loss = jax.jit(device_loss)

    def full(population):
        ops, args, consts = population
        base = np.asarray(jit_loss(jnp.asarray(ops), jnp.asarray(args),
                                   jnp.asarray(consts)))
        lens = tape_length(ops).reshape(-1, 2).sum(axis=1)
        return base + parsimony * lens

    return full, device_loss


def paired_population(rng, spec: TapeSpec, pop_size: int):
    """Interleaved two-component population: 2*pop_size tapes."""
    from .tape import random_population

    return random_population(rng, spec, 2 * pop_size)


def paired_breed(population, fitness_P, rng, spec: TapeSpec, cfg):
    """Breed pair-coherent groups: selection/crossover partners are whole
    (h1, h2) systems; variation applies per component. C++ core
    (breed_grouped) with a numpy fallback."""
    from .evolve import call_native_breed, get_native, _splice, _mutate

    ops, args, consts = population
    n_groups = ops.shape[0] // 2
    lib = get_native()
    # breed_grouped is absent only in a stale prebuilt .so (argtypes are
    # bound next to breed's in evolve._load_native) -> numpy fallback
    grouped = getattr(lib, "breed_grouped", None) if lib is not None else None
    if grouped is not None:
        return call_native_breed(grouped, population, fitness_P,
                                 (n_groups, 2, ops.shape[1]), rng, spec, cfg)

    # numpy fallback
    order = np.argsort(fitness_P)
    new = []

    def tournament():
        idx = rng.integers(n_groups, size=cfg.tournament_size)
        return idx[np.argmin(fitness_P[idx])]

    for g in order[:cfg.elitism]:
        new.append([(ops[2 * g + c].copy(), args[2 * g + c].copy(),
                     consts[2 * g + c].copy()) for c in range(2)])
    while len(new) < n_groups:
        a = tournament()
        do_cx = rng.random() < cfg.p_crossover
        b = tournament() if do_cx else -1
        do_mut = rng.random() < cfg.p_mutate
        pair = []
        for c in range(2):
            ind = (ops[2 * a + c], args[2 * a + c], consts[2 * a + c])
            if do_cx:
                ind = _splice(ind, (ops[2 * b + c], args[2 * b + c],
                                    consts[2 * b + c]), rng, spec)
            if do_mut:
                ind = _mutate(ind, rng, spec)
            pair.append(ind)
        new.append(pair)
    out_ops = np.stack([p[c][0] for p in new for c in range(2)])
    out_args = np.stack([p[c][1] for p in new for c in range(2)])
    out_consts = np.stack([p[c][2] for p in new for c in range(2)])
    return out_ops, out_args, out_consts


def symbolic_regression_system(
    X: np.ndarray,
    dX: np.ndarray,
    spec: TapeSpec,
    cfg,
    gx_list=None,
    Jgx_list=None,
    w_sym_reg: float = 0.0,
    verbose: bool = False,
):
    """Evolve a two-component system dx = h(x) (optionally symmetry-
    regularized). Counterpart of the reference's PySR fit with the symmreg
    objective (main_pysr.py:80-214). Returns (best pair, history)."""
    from .evolve import make_gen_step

    rng = np.random.default_rng(cfg.seed)
    Xj, dXj = jnp.asarray(X), jnp.asarray(dX)
    if gx_list is None:
        gx_list, Jgx_list = [], []
    _, device_loss = make_symmreg_fitness(
        spec, Xj, dXj, [jnp.asarray(g) for g in gx_list],
        [jnp.asarray(J) for J in Jgx_list], w_sym_reg, cfg.parsimony)
    population = paired_population(rng, spec, cfg.pop_size)
    gen_step = make_gen_step(device_loss, cfg.const_opt_steps,
                             cfg.const_opt_lr, group=2)
    best, best_fit, history = None, np.inf, []
    for gen in range(cfg.n_generations):
        c_final, base = jax.device_get(gen_step(
            jnp.asarray(population[0]), jnp.asarray(population[1]),
            jnp.asarray(population[2])))
        population = (population[0], population[1], c_final)
        lens = tape_length(population[0]).reshape(-1, 2).sum(axis=1)
        fit = base + cfg.parsimony * lens
        # reported best by RAW loss (PySR model_selection='accuracy', the
        # reference's setting for the symmreg mode, main_pysr.py:137,151 —
        # same rule as sweep.gp_sweep_system); breeding uses penalized fit
        i = int(np.argmin(base))
        if base[i] < best_fit:
            best_fit = float(base[i])
            best = tuple((population[j][2 * i].copy(), population[j][2 * i + 1].copy())
                         for j in range(3))
        history.append(best_fit)
        if verbose and gen % 10 == 0:
            from .tape import tape_to_string

            h1 = tape_to_string(best[0][0], best[1][0], best[2][0])
            h2 = tape_to_string(best[0][1], best[1][1], best[2][1])
            print(f"gen {gen}: best {best_fit:.6f}  dx0={h1}  dx1={h2}")
        population = paired_breed(population, fit, rng, spec, cfg)
    return best, history
