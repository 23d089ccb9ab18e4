"""Pallas/TPU tape evaluator: the GP fitness stack machine in VMEM.

`tape.eval_tapes` runs the postfix interpreter as a `lax.scan` over tape
positions with a (P, D, N) value-stack carry. On XLA:TPU that carry
round-trips HBM every step: for the symmetry-regularized LV protocol
(2P=2048 tapes, D=16, (1+n_g)*N=12.5k rows, L=40 steps) the stack alone
moves ~2 * L * P*D*N*4B = tens of GB per generation — the fitness
evaluation is bandwidth-bound, not compute-bound (bf16 eval speeds the
sweep ~1.8x end-to-end, the signature of halved carry traffic).

This kernel keeps the whole stack in VMEM scratch for all L steps: HBM
traffic drops to the tapes (P*L ints), the data tile (n_vars*N) and the
predictions (P*N) — the interpreter's one-hot selects run at VPU speed on
VMEM-resident tiles. Same dense one-hot semantics as `eval_tapes`
(reads/writes and opcode dispatch are where-masked selects, never dynamic
gathers — see tape.py's TPU note), same overflow->NaN contract, same
clipped-exp/safe-div guards, so predictions match the XLA interpreter to
elementwise rounding.

Forward-only by design: the constant-optimization gradient path keeps the
autodiff `eval_tapes` (sweep.py separates the full-batch fitness loss from
the differentiated loss precisely so the fitness backend is free to be a
custom kernel). Mosaic notes honored here: no bool vectors in loop
carries (`bad` is int32), scratch refs + `fori_loop` instead of
scan-with-refs, tapes laid out (L, P) so the per-step slice indexes the
sublane-major axis, never the lane axis.

Reference analog: none — PySR evaluates expression trees per-CPU-core in
Julia (reference main_pysr.py:80-214); this is the TPU-native equivalent
of its inner evaluation loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tape import (ADD, ARITY, CONST, COS, DIV, EXP, MUL, NEG, PAD, SIN, SUB,
                   VAR)

TAPE_TILE = 128
ROW_TILE = 512


def _tape_kernel(L, D, n_vars, table, ops_ref, args_ref, consts_ref, xt_ref,
                 out_ref, stack_ref):
    """One (TP tapes) x (TN rows) tile: run all L tape steps in VMEM.

    ops/args/consts blocks are (L, TP): memory-exact in VMEM (a trailing
    (TP, 1) layout would pad the lane dim to the 128-wide tile, inflating
    the three operand blocks ~128x and blowing the VMEM budget). The
    per-step load `ref[l][:, None]` is a 1D->(TP, 1) relayout of TP
    elements — noise next to the (TP, TN) stack selects.
    xt is (n_vars, TN); out (TP, TN); stack_ref scratch (D, TP, TN).
    """
    TP, TN = out_ref.shape
    dtype = stack_ref.dtype

    for d in range(D):
        stack_ref[d] = jnp.zeros((TP, TN), dtype)

    arity = [int(ARITY[code]) for code in table]

    def step(l, carry):
        sp, bad = carry  # (TP, 1) int32 each
        op = ops_ref[l][:, None]        # (TP, 1) int32
        arg = args_ref[l][:, None]      # (TP, 1) int32
        cval = consts_ref[l][:, None]   # (TP, 1)

        ar = jnp.zeros_like(op)
        for code, a_c in zip(table, arity):
            if a_c:
                ar = jnp.where(op == code, a_c, ar)

        i1 = jnp.clip(sp - 1, 0, D - 1)
        i2 = jnp.clip(sp - 2, 0, D - 1)
        a = jnp.zeros((TP, TN), dtype)
        b = jnp.zeros((TP, TN), dtype)
        for d in range(D):
            row = stack_ref[d]
            # where-mask + accumulate (NOT a mask multiply): 0 * inf in an
            # unselected slot must not poison the selected read
            a = a + jnp.where(i1 == d, row, 0.0)
            b = b + jnp.where(i2 == d, row, 0.0)

        var_val = jnp.zeros((TP, TN), dtype)
        for v in range(n_vars):
            var_val = var_val + jnp.where(arg == v, xt_ref[v][None, :], 0.0)

        def safe_div(num, den):
            ok = jnp.abs(den) > 1e-9
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 1.0)

        def op_result(code):
            # mirrors tape.eval_tapes op_result exactly
            if code == PAD:
                return jnp.zeros((TP, TN), dtype)
            if code == CONST:
                return jnp.broadcast_to(cval.astype(dtype), (TP, TN))
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
            return -a       # NEG

        res = op_result(table[0])
        for code in table[1:]:
            res = jnp.where(op == code, op_result(code), res)

        write_idx = jnp.clip(sp - ar, 0, D - 1)
        live = op != PAD
        for d in range(D):
            wmask = jnp.logical_and(write_idx == d, live)
            stack_ref[d] = jnp.where(wmask, res, stack_ref[d])

        delta = jnp.where(live, 1 - ar, 0)
        new_sp = jnp.clip(sp + delta, 0, D)
        overflow = jnp.logical_and(live,
                                   jnp.logical_and(ar == 0, sp >= D))
        new_bad = jnp.maximum(bad, overflow.astype(jnp.int32))
        return new_sp, new_bad

    sp0 = jnp.zeros((TP, 1), jnp.int32)
    sp, bad = jax.lax.fori_loop(0, L, step, (sp0, sp0))

    i_out = jnp.clip(sp - 1, 0, D - 1)
    out = jnp.zeros((TP, TN), dtype)
    for d in range(D):
        out = out + jnp.where(i_out == d, stack_ref[d], 0.0)
    out_ref[:] = jnp.where(bad > 0, jnp.nan, out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stack_depth", "op_table",
                                             "tape_tile", "row_tile",
                                             "interpret"))
def eval_tapes_pallas(ops: jnp.ndarray, args: jnp.ndarray,
                      consts: jnp.ndarray, X: jnp.ndarray,
                      stack_depth: int = 16,
                      op_table: Tuple[int, ...] | None = None,
                      tape_tile: int = TAPE_TILE, row_tile: int = ROW_TILE,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in forward-only `tape.eval_tapes` (same signature semantics).

    ops/args: (P, L) int32; consts: (P, L) float32-or-bf16; X: (N, n_vars).
    Returns (P, N) in X.dtype. The stack and all op arithmetic run in
    X.dtype (pass bf16 X/consts for the half-bandwidth eval, exactly like
    the XLA interpreter). Not differentiable — fitness/ranking use only.
    """
    if op_table is None:
        op_table = tuple(range(3, 11))
    table = (PAD, CONST, VAR) + tuple(o for o in op_table
                                      if o not in (PAD, CONST, VAR))
    P, L = ops.shape
    N, n_vars = X.shape
    D = stack_depth

    TP = min(tape_tile, max(8, P))
    TN = min(row_tile, max(128, N))
    p_tiles = -(-P // TP)
    n_tiles = -(-N // TN)
    Pp, Np = p_tiles * TP, n_tiles * TN

    # pad: extra tapes are all-PAD (out 0, bad False), extra rows are zeros
    opsT = jnp.pad(ops, ((0, Pp - P), (0, 0))).T          # (L, Pp)
    argsT = jnp.pad(args, ((0, Pp - P), (0, 0))).T
    constsT = jnp.pad(consts, ((0, Pp - P), (0, 0))).T.astype(X.dtype)
    XT = jnp.pad(X, ((0, Np - N), (0, 0))).T              # (n_vars, Np)

    tape_spec = pl.BlockSpec((L, TP), lambda i, j: (0, i))
    out = pl.pallas_call(
        functools.partial(_tape_kernel, L, D, n_vars, table),
        grid=(p_tiles, n_tiles),
        in_specs=[tape_spec, tape_spec, tape_spec,
                  pl.BlockSpec((n_vars, TN), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((TP, TN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Pp, Np), X.dtype),
        scratch_shapes=[pltpu.VMEM((D, TP, TN), X.dtype)],
        interpret=interpret,
    )(opsT, argsT, constsT, XT)
    return out[:P, :N]


# ---------------------------------------------------------------------------
# Differentiable evaluator: zero-residual custom VJP
# ---------------------------------------------------------------------------
#
# XLA's autodiff of the one-hot stack machine (tape.eval_tapes) saves a
# residual per scan step — the dominant buffer is (L, P, D, N) of select
# masks/operands that round-trips HBM on every Adam constant-optimization
# step (sweep.py make_sweep_gen_step). The backward kernel below stores
# nothing in HBM: it REPLAYS the forward in VMEM (saving only the one
# overwritten stack slot per step + the int32 stack pointer, both VMEM
# scratch), then runs the reverse sweep in the same kernel. Per-step
# control flow (stack pointer, write slot, arity) is value-independent —
# it depends only on the opcodes — so the replay is exact.
#
# Gradients flow to the CONST slots only (what constant optimization
# updates); X is data. The per-op adjoint formulas mirror tape.eval_tapes'
# forward select-chain exactly (safe-div / clipped-exp guards included), so
# g_consts matches jax.grad of the XLA interpreter to elementwise rounding.

GRAD_ROW_TILE = 128


def _tape_grad_kernel(L, D, n_vars, N_valid, table, ops_ref, args_ref,
                      consts_ref, xt_ref, gbar_ref, gc_ref, stack_ref,
                      gstack_ref, saved_ref, sps_ref):
    """One (TP tapes) x (TN rows) tile: forward replay + reverse sweep.

    Blocks: ops/args/consts (L, TP) — memory-exact, see _tape_kernel; xt
    (n_vars, TN); gbar (TP, TN); gc out (L, TP) accumulated over row tiles
    (grid dim j is innermost, the block index map drops j, so the block
    stays VMEM-resident across the row sweep). Scratch: stack/gstack
    (D, TP, TN), saved (L, TP, TN), sps (L, TP) int32.
    """
    TP, TN = gbar_ref.shape
    dtype = stack_ref.dtype
    j = pl.program_id(1)

    # zero-padded rows (global col >= N_valid) carry gbar=0, but a padded
    # row whose replayed operand is inf/NaN at x=0 would turn the 0-cotangent
    # product into NaN, and gc_row's row-sum folds that into the REAL
    # gradient — mask their stack pushes to exactly 0
    col = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TP, TN), 1)
    valid_cols = col < N_valid

    arity = [int(ARITY[code]) for code in table]

    def read_slot(idx):
        v = jnp.zeros((TP, TN), dtype)
        for d in range(D):
            v = v + jnp.where(idx == d, stack_ref[d], 0.0)
        return v

    def op_arity(op):
        ar = jnp.zeros_like(op)
        for code, a_c in zip(table, arity):
            if a_c:
                ar = jnp.where(op == code, a_c, ar)
        return ar

    # ---- forward replay: persist sp + the overwritten slot value per step
    for d in range(D):
        stack_ref[d] = jnp.zeros((TP, TN), dtype)

    def fstep(l, carry):
        sp, bad = carry  # (TP, 1) int32 each
        op = ops_ref[l][:, None]
        arg = args_ref[l][:, None]
        cval = consts_ref[l][:, None]
        ar = op_arity(op)

        i1 = jnp.clip(sp - 1, 0, D - 1)
        i2 = jnp.clip(sp - 2, 0, D - 1)
        a = read_slot(i1)
        b = read_slot(i2)

        var_val = jnp.zeros((TP, TN), dtype)
        for v in range(n_vars):
            var_val = var_val + jnp.where(arg == v, xt_ref[v][None, :], 0.0)

        def safe_div(num, den):
            ok = jnp.abs(den) > 1e-9
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 1.0)

        def op_result(code):
            if code == PAD:
                return jnp.zeros((TP, TN), dtype)
            if code == CONST:
                return jnp.broadcast_to(cval.astype(dtype), (TP, TN))
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
            return -a       # NEG

        res = op_result(table[0])
        for code in table[1:]:
            res = jnp.where(op == code, op_result(code), res)

        write_idx = jnp.clip(sp - ar, 0, D - 1)
        live = op != PAD
        sps_ref[l] = sp[:, 0]
        saved_ref[l] = read_slot(write_idx)
        for d in range(D):
            wmask = jnp.logical_and(write_idx == d, live)
            stack_ref[d] = jnp.where(wmask, res, stack_ref[d])

        delta = jnp.where(live, 1 - ar, 0)
        new_sp = jnp.clip(sp + delta, 0, D)
        overflow = jnp.logical_and(live,
                                   jnp.logical_and(ar == 0, sp >= D))
        new_bad = jnp.maximum(bad, overflow.astype(jnp.int32))
        return new_sp, new_bad

    sp0 = jnp.zeros((TP, 1), jnp.int32)
    sp, bad = jax.lax.fori_loop(0, L, fstep, (sp0, sp0))

    # ---- seed: d out/d stack[i_out]; bad tapes get exactly 0 (select vjp)
    i_out = jnp.clip(sp - 1, 0, D - 1)
    g0 = jnp.where(bad > 0, 0.0, gbar_ref[:, :].astype(dtype))
    for d in range(D):
        gstack_ref[d] = jnp.where(i_out == d, g0, 0.0)

    @pl.when(j == 0)
    def _():
        for l in range(L):
            gc_ref[l] = jnp.zeros((TP,), dtype)

    # ---- reverse sweep
    def bstep(k, _):
        l = L - 1 - k
        sp = sps_ref[l][:, None]
        op = ops_ref[l][:, None]
        ar = op_arity(op)
        live = op != PAD
        write_idx = jnp.clip(sp - ar, 0, D - 1)

        # pop the written slot's gradient; restore the stack to pre-step
        g_res = jnp.zeros((TP, TN), dtype)
        for d in range(D):
            wmask = jnp.logical_and(write_idx == d, live)
            g_res = g_res + jnp.where(wmask, gstack_ref[d], 0.0)
            gstack_ref[d] = jnp.where(wmask, 0.0, gstack_ref[d])
            stack_ref[d] = jnp.where(wmask, saved_ref[l], stack_ref[d])

        i1 = jnp.clip(sp - 1, 0, D - 1)
        i2 = jnp.clip(sp - 2, 0, D - 1)
        a = read_slot(i1)
        b = read_slot(i2)

        def partials(code):
            # (d res/d a, d res/d b) * g_res, mirroring op_result exactly
            if code == ADD:
                return g_res, g_res
            if code == SUB:
                return -g_res, g_res
            if code == MUL:
                return g_res * b, g_res * a
            if code == DIV:
                ok = jnp.abs(a) > 1e-9
                den = jnp.where(ok, a, 1.0)
                return (jnp.where(ok, -g_res * b / (den * den), 0.0),
                        jnp.where(ok, g_res / den, 0.0))
            if code == EXP:
                inr = jnp.logical_and(a >= -40.0, a <= 40.0)
                e = jnp.exp(jnp.clip(a, -40.0, 40.0))
                return jnp.where(inr, g_res * e, 0.0), None
            if code == SIN:
                return g_res * jnp.cos(a), None
            if code == COS:
                return -g_res * jnp.sin(a), None
            if code == NEG:
                return -g_res, None
            return None, None   # PAD / CONST / VAR: no stack operands

        ga = jnp.zeros((TP, TN), dtype)
        gb = jnp.zeros((TP, TN), dtype)
        for code in table:
            pa, pb = partials(code)
            if pa is not None:
                ga = jnp.where(op == code, pa, ga)
            if pb is not None:
                gb = jnp.where(op == code, pb, gb)
        ga = jnp.where(valid_cols, ga, 0.0)
        gb = jnp.where(valid_cols, gb, 0.0)

        # constant-slot gradient: row-sum of g_res where this step is CONST
        gc_row = jnp.sum(jnp.where(op == CONST, g_res, 0.0), axis=1)
        gc_ref[l] = gc_ref[l] + gc_row

        # push operand gradients (unary reads i1; binary reads i1 and i2)
        m1 = jnp.logical_and(ar >= 1, live)
        m2 = jnp.logical_and(ar == 2, live)
        for d in range(D):
            upd = (jnp.where(jnp.logical_and(i1 == d, m1), ga, 0.0)
                   + jnp.where(jnp.logical_and(i2 == d, m2), gb, 0.0))
            gstack_ref[d] = gstack_ref[d] + upd
        return 0

    jax.lax.fori_loop(0, L, bstep, 0)


@functools.partial(jax.jit, static_argnames=("stack_depth", "op_table",
                                             "tape_tile", "row_tile",
                                             "interpret"))
def eval_tapes_pallas_grad(ops: jnp.ndarray, args: jnp.ndarray,
                           consts: jnp.ndarray, X: jnp.ndarray,
                           gbar: jnp.ndarray,
                           stack_depth: int = 16,
                           op_table: Tuple[int, ...] | None = None,
                           tape_tile: int = TAPE_TILE,
                           row_tile: int = GRAD_ROW_TILE,
                           interpret: bool = False) -> jnp.ndarray:
    """d(sum(gbar * eval_tapes(...)))/d consts, fused in VMEM.

    ops/args: (P, L) int32; consts (P, L); X (N, n_vars); gbar (P, N).
    Returns (P, L) float32 — zero in non-CONST slots.
    """
    if op_table is None:
        op_table = tuple(range(3, 11))
    table = (PAD, CONST, VAR) + tuple(o for o in op_table
                                      if o not in (PAD, CONST, VAR))
    P, L = ops.shape
    N, n_vars = X.shape
    D = stack_depth

    TP = min(tape_tile, max(8, P))
    TN = min(row_tile, max(128, N))
    p_tiles = -(-P // TP)
    n_tiles = -(-N // TN)
    Pp, Np = p_tiles * TP, n_tiles * TN

    opsT = jnp.pad(ops, ((0, Pp - P), (0, 0))).T          # (L, Pp)
    argsT = jnp.pad(args, ((0, Pp - P), (0, 0))).T
    constsT = jnp.pad(consts, ((0, Pp - P), (0, 0))).T.astype(X.dtype)
    XT = jnp.pad(X, ((0, Np - N), (0, 0))).T              # (n_vars, Np)
    # padded rows/tapes contribute exactly 0: their gbar is 0
    gbarP = jnp.pad(gbar.astype(X.dtype), ((0, Pp - P), (0, Np - N)))

    tape_spec = pl.BlockSpec((L, TP), lambda i, j: (0, i))
    gc = pl.pallas_call(
        functools.partial(_tape_grad_kernel, L, D, n_vars, N, table),
        grid=(p_tiles, n_tiles),
        in_specs=[tape_spec, tape_spec, tape_spec,
                  pl.BlockSpec((n_vars, TN), lambda i, j: (0, j)),
                  pl.BlockSpec((TP, TN), lambda i, j: (i, j))],
        out_specs=tape_spec,
        out_shape=jax.ShapeDtypeStruct((L, Pp), X.dtype),
        scratch_shapes=[pltpu.VMEM((D, TP, TN), X.dtype),
                        pltpu.VMEM((D, TP, TN), X.dtype),
                        pltpu.VMEM((L, TP, TN), X.dtype),
                        pltpu.VMEM((L, TP), jnp.int32)],
        interpret=interpret,
    )(opsT, argsT, constsT, XT, gbarP)
    return gc[:, :P].T


def make_diff_eval_pallas(stack_depth: int,
                          op_table: Tuple[int, ...] | None = None,
                          interpret: bool = False):
    """A drop-in `tape.eval_tapes` whose VJP is the fused VMEM kernel.

    Forward = eval_tapes_pallas (bit-equal to the XLA interpreter);
    backward = eval_tapes_pallas_grad (consts cotangent only — X is data,
    ops/args are integers). Use for the constant-optimization loss
    (sweep.py make_sweep_gen_step differentiates w.r.t. consts only).
    """
    import numpy as _np

    @jax.custom_vjp
    def ev(ops, args, consts, X):
        return eval_tapes_pallas(ops, args, consts, X, stack_depth,
                                 op_table=op_table, interpret=interpret)

    def fwd(ops, args, consts, X):
        return ev(ops, args, consts, X), (ops, args, consts, X)

    def bwd(res, gbar):
        ops, args, consts, X = res
        gc = eval_tapes_pallas_grad(ops, args, consts, X, gbar, stack_depth,
                                    op_table=op_table, interpret=interpret)
        int0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
        return int0(ops), int0(args), gc.astype(consts.dtype), jnp.zeros_like(X)

    ev.defvjp(fwd, bwd)
    return ev
