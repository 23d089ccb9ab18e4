"""Tests for the genetic-programming engine (tape interpreter, breeding,
symmetry objective)."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.symgp.tape import (
    ADD, CONST, EXP, MUL, PAD, SUB, VAR, TapeSpec, eval_tapes,
    random_population, tape_to_string, tape_to_sympy, tape_valid,
)
from symmetry_ode_discovery_tpu.symgp.evolve import (
    GPConfig, breed, breed_numpy, make_fitness_fn, subtree_span,
    symbolic_regression,
)
from symmetry_ode_discovery_tpu.symgp.objective import (
    make_symmreg_fitness, paired_breed, paired_population,
)


def test_eval_hand_built():
    # (x0 * x1) + 2.5
    ops = np.array([[VAR, VAR, MUL, CONST, ADD, PAD]], np.int32)
    args = np.array([[0, 1, 0, 0, 0, 0]], np.int32)
    consts = np.array([[0, 0, 0, 2.5, 0, 0]], np.float32)
    X = np.array([[2.0, 3.0], [1.0, 4.0]], np.float32)
    out = np.asarray(eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                                jnp.asarray(consts), jnp.asarray(X), 8))
    np.testing.assert_allclose(out, [[8.5, 6.5]])


def test_eval_exp_sub():
    # 2/3 - 4/3 * exp(x1):  [C(2/3), C(4/3), VAR1, EXP, MUL, SUB]
    ops = np.array([[CONST, CONST, VAR, EXP, MUL, SUB]], np.int32)
    args = np.array([[0, 0, 1, 0, 0, 0]], np.int32)
    consts = np.array([[2 / 3, 4 / 3, 0, 0, 0, 0]], np.float32)
    X = np.array([[0.0, 0.5]], np.float32)
    out = np.asarray(eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                                jnp.asarray(consts), jnp.asarray(X), 8))
    np.testing.assert_allclose(out, [[2 / 3 - 4 / 3 * np.exp(0.5)]], rtol=1e-5)


def test_subtree_span():
    # postfix of (x0 + x1) * c : [VAR0, VAR1, ADD, CONST, MUL]
    ops = np.array([VAR, VAR, ADD, CONST, MUL, PAD], np.int32)
    assert subtree_span(ops, 2) == 0  # the ADD subtree spans [0..2]
    assert subtree_span(ops, 3) == 3  # CONST is a leaf
    assert subtree_span(ops, 4) == 0  # whole program


def test_random_population_valid():
    rng = np.random.default_rng(0)
    spec = TapeSpec(n_vars=3, max_len=20, unary_ops=(EXP,))
    pop = random_population(rng, spec, 300)
    assert tape_valid(pop[0]).all()


def test_breeding_preserves_validity_both_backends():
    rng = np.random.default_rng(1)
    spec = TapeSpec(n_vars=2, max_len=20)
    cfg = GPConfig(pop_size=64)
    pop = random_population(rng, spec, 64)
    fit = np.asarray(np.random.default_rng(2).random(64), np.float32)
    for fn in (breed_numpy, breed):
        out = fn(pop, fit, np.random.default_rng(3), spec, cfg)
        assert tape_valid(out[0]).all(), fn.__name__
        assert out[0].shape == pop[0].shape


def test_elitism_keeps_best():
    rng = np.random.default_rng(1)
    spec = TapeSpec(n_vars=2, max_len=20)
    cfg = GPConfig(pop_size=32, elitism=2)
    pop = random_population(rng, spec, 32)
    fit = np.arange(32, dtype=np.float32)[::-1].copy()  # last is best
    out = breed_numpy(pop, fit, rng, spec, cfg)
    np.testing.assert_array_equal(out[0][0], pop[0][31])


def test_symbolic_regression_discovers_linear():
    rng = np.random.default_rng(0)
    spec = TapeSpec(n_vars=2, max_len=20)
    X = rng.standard_normal((128, 2)).astype(np.float32)
    y = 2.0 * X[:, 0] - X[:, 1]
    cfg = GPConfig(pop_size=128, n_generations=15, seed=0, const_opt_steps=4)
    best, hist = symbolic_regression(X, y, spec, cfg)
    assert hist[-1] < 0.05, (hist[-1], tape_to_string(*best))


def test_symmreg_fitness_penalizes_asymmetric():
    """The symmetry penalty must separate equivariant from non-equivariant
    candidates under a rotation action."""
    N = 64
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, 2)).astype(np.float32)
    dX = np.stack([-X[:, 1], X[:, 0]], 1)  # rotation field (equivariant)
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
                 np.float32)
    gx = X @ R.T
    Jg = np.tile(R, (N, 1, 1))
    # the tape below uses NEG, so the spec must declare it: the evaluator
    # only dispatches opcodes inside the spec's search space (spec_op_table)
    spec = TapeSpec(n_vars=2, max_len=12, unary_ops=(10,))
    full, _ = make_symmreg_fitness(spec, jnp.asarray(X), jnp.asarray(dX),
                                   [jnp.asarray(gx)], [jnp.asarray(Jg)],
                                   w_sym_reg=1.0, parsimony=0.0)
    # candidate A: h = (-x1, x0) equivariant; candidate B: h = (x0, 0) not
    ops = np.array([
        [VAR, 10, PAD, PAD],   # -x1  (NEG=10)
        [VAR, PAD, PAD, PAD],  # x0
        [VAR, PAD, PAD, PAD],  # x0
        [CONST, PAD, PAD, PAD],  # 0
    ], np.int32)
    args = np.array([[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]], np.int32)
    consts = np.zeros((4, 4), np.float32)
    fit = full((ops, args, consts))
    assert fit[0] < 1e-6          # perfect fit + equivariant
    assert fit[1] > fit[0] + 0.1  # bad fit and asymmetric


def test_paired_breed_validity():
    rng = np.random.default_rng(0)
    spec = TapeSpec(n_vars=2, max_len=16)
    cfg = GPConfig(pop_size=32)
    pop = paired_population(rng, spec, 32)
    fit = np.asarray(rng.random(32), np.float32)
    out = paired_breed(pop, fit, rng, spec, cfg)
    assert out[0].shape == (64, 16)
    assert tape_valid(out[0]).all()


def test_tape_to_sympy_roundtrip():
    import sympy as sp

    ops = np.array([CONST, CONST, VAR, EXP, MUL, SUB], np.int32)
    args = np.array([0, 0, 1, 0, 0, 0], np.int32)
    consts = np.array([2 / 3, 4 / 3, 0, 0, 0, 0], np.float32)
    e = tape_to_sympy(ops, args, consts)
    x1 = sp.Symbol("x1")
    diff = sp.simplify(e - (sp.Float(np.float32(2 / 3)) - sp.Float(np.float32(4 / 3)) * sp.exp(x1)))
    assert abs(float(diff.subs(x1, 0.3))) < 1e-6


def test_deep_tape_overflow_is_nan_not_garbage():
    """A tape_valid-passing tape whose evaluation depth exceeds stack_depth
    must evaluate to NaN (-> inf fitness), not a silently corrupted value.
    Repro: 18 pushes saturate a 16-slot stack; the corrupted evaluation used
    to return 552 instead of sum(1..18)+... for the chain below."""
    from symmetry_ode_discovery_tpu.symgp.tape import ADD, CONST, PAD, eval_tapes

    n_push, n_add = 18, 17
    L = n_push + n_add
    ops = np.array([[CONST] * n_push + [ADD] * n_add], np.int32)
    args = np.zeros((1, L), np.int32)
    consts = np.array([[float(i + 1) for i in range(n_push)] + [0.0] * n_add],
                      np.float32)
    assert tape_valid(ops).all()
    X = np.zeros((3, 2), np.float32)
    out = np.asarray(eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                                jnp.asarray(consts), jnp.asarray(X),
                                stack_depth=16))
    assert np.isnan(out).all()
    # deep enough stack -> exact value, finite
    out32 = np.asarray(eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                                  jnp.asarray(consts), jnp.asarray(X),
                                  stack_depth=32))
    np.testing.assert_allclose(out32, np.sum(np.arange(1, n_push + 1)))


def test_breeding_valid_at_tiny_max_len_both_backends():
    """max_len smaller than mutate's fresh-individual target draw (up to 9):
    random_tape must clamp the target to the capacity in BOTH breeders, or
    the C++ core truncates grown-valid programs into malformed postfix."""
    rng = np.random.default_rng(5)
    spec = TapeSpec(n_vars=2, max_len=6)
    cfg = GPConfig(pop_size=64, p_mutate=1.0)  # force heavy mutation
    pop = random_population(rng, spec, 64)
    assert tape_valid(pop[0]).all()
    for fn in (breed_numpy, breed):
        out = pop
        for it in range(10):  # many rounds so fresh/subtree branches fire
            fit = np.asarray(np.random.default_rng(it).random(64), np.float32)
            out = fn(out, fit, np.random.default_rng(100 + it), spec, cfg)
            assert tape_valid(out[0]).all(), (fn.__name__, it)


def test_tape_to_string_neg_is_sympy_parseable():
    """NEG must render as standard notation: 'neg(x)' would sympify into an
    undefined Function and every NEG equation would be scored off-library."""
    import sympy as sp

    from symmetry_ode_discovery_tpu.symgp.tape import NEG

    ops = np.array([VAR, NEG, CONST, ADD, PAD, PAD], np.int32)
    args = np.zeros(6, np.int32)
    consts = np.zeros(6, np.float32)
    consts[2] = 2.5
    s = tape_to_string(ops, args, consts)
    x0 = sp.Symbol("x0")
    assert sp.simplify(sp.sympify(s) - (-x0 + 2.5)) == 0
