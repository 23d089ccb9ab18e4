"""Expression tapes: fixed-size postfix programs evaluated by a vectorized
stack machine on TPU.

This is the TPU-native replacement for the reference's PySR/Julia genetic
programming backend (reference main_pysr.py:80-214 ships a custom Julia
objective to SymbolicRegression.jl). Instead of pointer-based expression trees
evolved in Julia, expressions are fixed-length postfix tapes:

    ops:    (P, L) int32 opcodes (0 = PAD/no-op)
    args:   (P, L) int32 variable indices (VAR) / unused otherwise
    consts: (P, L) float32 constant values (CONST slots)

Evaluation is one `lax.scan` over tape positions with a (S, N) value stack,
vmapped over the population — the entire population evaluates on the whole
dataset in a single fused XLA program, and the constants are differentiable
(enabling vmapped on-device constant optimization, which PySR does with
per-expression BFGS on the host).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# opcodes
PAD, CONST, VAR, ADD, SUB, MUL, DIV, EXP, SIN, COS, NEG = range(11)
ARITY = np.array([0, 0, 0, 2, 2, 2, 2, 1, 1, 1, 1], dtype=np.int32)
OP_NAMES = ["pad", "const", "var", "+", "-", "*", "/", "exp", "sin", "cos", "neg"]
BINARY_OPS = [ADD, SUB, MUL]
UNARY_OPS_DEFAULT: List[int] = []


@dataclasses.dataclass(frozen=True)
class TapeSpec:
    """Static GP search-space description (reference main_pysr.py config
    dicts: binary_operators / unary_operators / maxsize)."""

    n_vars: int
    max_len: int = 32
    stack_depth: int = 16
    binary_ops: Tuple[int, ...] = (ADD, SUB, MUL)
    unary_ops: Tuple[int, ...] = ()
    const_range: float = 2.0


def eval_tapes(ops: jnp.ndarray, args: jnp.ndarray, consts: jnp.ndarray,
               X: jnp.ndarray, stack_depth: int = 16,
               op_table: Tuple[int, ...] | None = None) -> jnp.ndarray:
    """Evaluate a population of tapes on data.

    ops/args: (P, L) int32; consts: (P, L) float32; X: (N, n_vars).
    Returns (P, N) predictions. Programs whose evaluation depth exceeds
    `stack_depth` would silently clobber the top stack slot (the printed
    expression would not be the one scored), so the interpreter tracks the
    overflow and returns NaN for those tapes — the fitness layers' isfinite
    guards then score them as +inf, excluding them from selection.
    stack_depth is therefore a search-space bound (PySR's maxdepth analog),
    not just a buffer size. Breeding keeps tapes postfix-valid (`tape_valid`
    invariants); underflow reads cannot occur for valid tapes.

    op_table: static tuple of the opcodes the search space can emit
    (PAD/CONST/VAR are always included). Restricting it to the TapeSpec's
    ops skips the unused result computations — pass
    `spec_op_table(spec)` from fitness code.

    TPU note: all stack reads/writes and the opcode dispatch are ONE-HOT
    masked selects, not dynamic gathers/scatters. The tape position indices
    are data-dependent per tape, and the transpose of a batched dynamic
    scatter is a serial per-tape loop on XLA:TPU — profiling the constant-
    optimization backward showed 5.4 s/generation spent in 500k
    one-slice dynamic-update-slices. Dense one-hot selects keep both the
    forward and the autodiff backward fully vectorized over the population.
    """
    N = X.shape[0]
    XT = X.T  # (n_vars, N)
    if op_table is None:
        op_table = tuple(range(3, 11))  # every non-leaf opcode
    table = (PAD, CONST, VAR) + tuple(o for o in op_table
                                      if o not in (PAD, CONST, VAR))
    pos = jnp.arange(stack_depth)

    def eval_one(op_row, arg_row, const_row):
        stack0 = jnp.zeros((stack_depth, N), dtype=X.dtype)

        def step(carry, slot):
            stack, sp, bad = carry
            op, arg, cval = slot
            arity = jnp.asarray(ARITY)[op]
            # operand reads below sp: one-hot row-mask contractions
            i1 = jnp.clip(sp - 1, 0, stack_depth - 1)
            i2 = jnp.clip(sp - 2, 0, stack_depth - 1)
            # where-mask + sum (NOT a mask multiply): 0 * inf would turn a
            # non-finite value parked in an unselected slot into NaN in the
            # selected read — where zeroes unselected rows exactly
            a = jnp.where((pos == i1)[:, None], stack, 0.0).sum(0)
            b = jnp.where((pos == i2)[:, None], stack, 0.0).sum(0)
            var_val = XT[jnp.clip(arg, 0, XT.shape[0] - 1)]

            def safe_div(num, den):
                ok = jnp.abs(den) > 1e-9
                return jnp.where(ok, num / jnp.where(ok, den, 1.0), 1.0)

            def op_result(code):
                if code == PAD:
                    return jnp.zeros((N,), X.dtype)
                if code == CONST:
                    return jnp.full((N,), cval, X.dtype)
                if code == VAR:
                    return var_val
                if code == ADD:
                    return b + a
                if code == SUB:
                    return b - a
                if code == MUL:
                    return b * a
                if code == DIV:
                    return safe_div(b, a)
                if code == EXP:
                    return jnp.exp(jnp.clip(a, -40.0, 40.0))
                if code == SIN:
                    return jnp.sin(a)
                if code == COS:
                    return jnp.cos(a)
                return -a  # NEG

            # opcode dispatch as a select chain (dense fwd AND bwd)
            res = op_result(table[0])
            for code in table[1:]:
                res = jnp.where(op == code, op_result(code), res)
            # stack pointer update: push for leaves (+1), pop-pop-push for
            # binary (-1), pop-push for unary (0); PAD no-op
            delta = jnp.where(op == PAD, 0, 1 - arity)
            write_idx = jnp.clip(sp - arity, 0, stack_depth - 1)
            wmask = jnp.logical_and(pos == write_idx, op != PAD)[:, None]
            new_stack = jnp.where(wmask, res[None, :], stack)
            new_sp = jnp.clip(sp + delta, 0, stack_depth)
            # a leaf push with the stack already full clobbers the top slot
            bad = jnp.logical_or(
                bad, jnp.logical_and(op != PAD,
                                     jnp.logical_and(arity == 0,
                                                     sp >= stack_depth)))
            return (new_stack, new_sp, bad), None

        (stack, sp, bad), _ = jax.lax.scan(
            step, (stack0, jnp.asarray(0), jnp.asarray(False)),
            (op_row, arg_row, const_row))
        i_out = jnp.clip(sp - 1, 0, stack_depth - 1)
        out = jnp.where((pos == i_out)[:, None], stack, 0.0).sum(0)
        return jnp.where(bad, jnp.nan, out)

    return jax.vmap(eval_one)(ops, args, consts)


def spec_op_table(spec: "TapeSpec") -> Tuple[int, ...]:
    """The opcodes a TapeSpec's search space can emit (for eval_tapes)."""
    return tuple(spec.binary_ops) + tuple(spec.unary_ops)


def eval_population(population, X, spec: TapeSpec):
    ops, args, consts = population
    return eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                      jnp.asarray(consts), X, spec.stack_depth)


def tape_valid(ops: np.ndarray) -> np.ndarray:
    """(P, L) -> (P,) bool: postfix well-formedness — running stack depth
    stays >= arity at each op and ends at exactly 1 (ignoring trailing PAD).
    Host-side numpy (used by the breeder, not in the jit path)."""
    P, L = ops.shape
    depth = np.zeros(P, dtype=np.int64)
    ok = np.ones(P, dtype=bool)
    for i in range(L):
        op = ops[:, i]
        is_pad = op == PAD
        ar = ARITY[op]
        ok &= is_pad | (depth >= ar)
        depth = np.where(is_pad, depth, depth - ar + 1)
    ok &= depth == 1
    # no non-PAD after a PAD once program started
    for p in range(P):
        nz = np.nonzero(ops[p] != PAD)[0]
        if nz.size and (ops[p][: nz[-1] + 1] == PAD).any():
            ok[p] = False
    return ok


def random_tape(rng: np.random.Generator, spec: TapeSpec, target_len: int):
    """Grow a random postfix program of approximately target_len slots."""
    # a target beyond the tape capacity would overflow max_len and break the
    # fixed-shape population stack (callers draw target ~ U[1, 2*mean_len))
    target_len = min(target_len, spec.max_len)
    ops, args, consts = [], [], []
    depth = 0
    while len(ops) < target_len:
        remaining = target_len - len(ops)
        choices = []
        if depth >= 1 and remaining >= 1:
            choices += [o for o in spec.unary_ops]
        if depth >= 2:
            choices += [o for o in spec.binary_ops] * 2
        if depth < remaining:  # room to push leaves
            choices += [CONST, VAR, VAR]
        if not choices:
            break
        op = int(rng.choice(choices))
        ops.append(op)
        if op == VAR:
            args.append(int(rng.integers(spec.n_vars)))
            consts.append(0.0)
            depth += 1
        elif op == CONST:
            args.append(0)
            consts.append(float(rng.uniform(-spec.const_range, spec.const_range)))
            depth += 1
        else:
            args.append(0)
            consts.append(0.0)
            depth -= ARITY[op] - 1
        if depth == 1 and rng.random() < 0.3:
            break
    # close the program: reduce depth to 1 with binary ops
    while depth > 1 and len(ops) < spec.max_len:
        op = int(rng.choice(list(spec.binary_ops)))
        ops.append(op)
        args.append(0)
        consts.append(0.0)
        depth -= 1
    if depth != 1:
        # fall back to a single leaf
        ops, args, consts = [VAR], [int(rng.integers(spec.n_vars))], [0.0]
    pad = spec.max_len - len(ops)
    return (np.array(ops + [PAD] * pad, np.int32),
            np.array(args + [0] * pad, np.int32),
            np.array(consts + [0.0] * pad, np.float32))


def random_population(rng: np.random.Generator, spec: TapeSpec, pop_size: int,
                      mean_len: int = 8):
    rows = [random_tape(rng, spec, max(1, int(rng.integers(1, 2 * mean_len))))
            for _ in range(pop_size)]
    ops = np.stack([r[0] for r in rows])
    args = np.stack([r[1] for r in rows])
    consts = np.stack([r[2] for r in rows])
    return ops, args, consts


def tape_length(ops: np.ndarray) -> np.ndarray:
    """(P, L) -> (P,) number of non-PAD slots (complexity measure)."""
    return (ops != PAD).sum(axis=-1)


def tape_to_string(op_row: np.ndarray, arg_row: np.ndarray, const_row: np.ndarray,
                   var_names: List[str] | None = None) -> str:
    """Postfix -> infix string (for reporting; reference prints sympy
    equations, main_pysr.py:220-243)."""
    stack: List[str] = []
    for op, arg, c in zip(op_row, arg_row, const_row):
        op = int(op)
        if op == PAD:
            continue
        if op == CONST:
            stack.append(f"{float(c):.4g}")
        elif op == VAR:
            name = var_names[int(arg)] if var_names else f"x{int(arg)}"
            stack.append(name)
        elif op in (ADD, SUB, MUL, DIV):
            if len(stack) < 2:
                return "<invalid>"
            a = stack.pop()
            b = stack.pop()
            sym = OP_NAMES[op]
            stack.append(f"({b} {sym} {a})")
        else:  # unary
            if len(stack) < 1:
                return "<invalid>"
            a = stack.pop()
            if op == NEG:
                # standard notation so sympify (eval_gp form projection)
                # parses it; "neg(x)" would become an undefined Function
                stack.append(f"(-{a})")
            else:
                stack.append(f"{OP_NAMES[op]}({a})")
    return stack[-1] if len(stack) == 1 else "<invalid>"


def tape_to_sympy(op_row, arg_row, const_row, var_names=None):
    """Postfix -> sympy expression (for exact-form checking in tests/eval).

    Raises ValueError on a malformed tape (operand underflow or multiple
    roots) — the sympy sibling of tape_to_string's '<invalid>'."""
    import sympy as sp

    stack = []
    for op, arg, c in zip(op_row, arg_row, const_row):
        op = int(op)
        if op == PAD:
            continue
        if op != CONST and op != VAR and len(stack) < ARITY[op]:
            raise ValueError("malformed tape: operand underflow")
        if op == CONST:
            stack.append(sp.Float(float(c)))
        elif op == VAR:
            name = var_names[int(arg)] if var_names else f"x{int(arg)}"
            stack.append(sp.Symbol(name))
        elif op in (ADD, SUB, MUL, DIV):
            a = stack.pop()
            b = stack.pop()
            stack.append({ADD: b + a, SUB: b - a, MUL: b * a, DIV: b / a}[op])
        elif op == EXP:
            stack.append(sp.exp(stack.pop()))
        elif op == SIN:
            stack.append(sp.sin(stack.pop()))
        elif op == COS:
            stack.append(sp.cos(stack.pop()))
        elif op == NEG:
            stack.append(-stack.pop())
    if len(stack) != 1:
        raise ValueError("malformed tape: expected exactly one root")
    return stack[-1]
