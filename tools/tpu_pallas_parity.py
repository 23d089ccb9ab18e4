"""Real-hardware parity check for the symgp Pallas kernels.

tests/ force the CPU backend (conftest), so the Pallas tape kernels are
exercised there in interpret mode only — Mosaic lowering and the VMEM
budget are untested until a real TPU runs them. This tool repeats the
kernel-level parity checks of tests/test_gp_sweep.py on the default
backend (the axon TPU when the tunnel is up):

  1. eval_tapes_pallas vs tape.eval_tapes — f32 bit-equality + NaN mask,
     at test scale AND at the production LV-symm scale (2048 tapes x
     12.5k rows, max_len 40, stack depth 16 — the real VMEM footprint).
  2. the same in bf16 (the --gp_eval_dtype bf16 path).
  3. eval_tapes_pallas_grad vs jax.grad of the XLA interpreter (consts
     cotangent; elementwise-rounding tolerance — row-tile accumulation
     associates sums differently).

Exit 0 = all kernels lower and match; nonzero = a check failed (the
offending check is printed). Run serially with other TPU jobs (CLAUDE.md:
concurrent remote compiles contend).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.symgp.pallas_eval import (
    eval_tapes_pallas, eval_tapes_pallas_grad)
from symmetry_ode_discovery_tpu.symgp.tape import (
    ADD, COS, DIV, EXP, MUL, NEG, SIN, SUB, TapeSpec, eval_tapes,
    random_population, spec_op_table)


INTERPRET = False  # set in main(): True on CPU (no Mosaic), False on TPU


def check_forward(name, spec, n_tapes, n_rows, dtype, seed):
    rng = np.random.default_rng(seed)
    ops, args, consts = random_population(rng, spec, n_tapes)
    X = rng.standard_normal((n_rows, spec.n_vars)).astype(np.float32)
    tbl = spec_op_table(spec)
    opsj, argsj = jnp.asarray(ops), jnp.asarray(args)
    cj = jnp.asarray(consts).astype(dtype)
    Xj = jnp.asarray(X).astype(dtype)
    ref = np.asarray(eval_tapes(opsj, argsj, cj, Xj, spec.stack_depth,
                                op_table=tbl), np.float32)
    out = np.asarray(eval_tapes_pallas(opsj, argsj, cj, Xj, spec.stack_depth,
                                       op_table=tbl, interpret=INTERPRET),
                     np.float32)
    ok_nan = bool((np.isnan(ref) == np.isnan(out)).all()
                  and (np.isfinite(ref) == np.isfinite(out)).all())
    m = np.isfinite(ref) & np.isfinite(out)
    bit_eq = bool((ref[~np.isnan(ref)] == out[~np.isnan(ref)]).all())
    scale = np.maximum(np.abs(ref[m]), 1.0)
    err = float(np.max(np.abs(ref[m] - out[m]) / scale)) if m.any() else 0.0
    # pass on elementwise rounding (Mosaic transcendental lowering may
    # differ from XLA by ulps on hardware); bit-equality is reported
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    ok = ok_nan and err < tol
    print(f"{name}: nan_mask_equal={ok_nan} bit_equal={bit_eq} "
          f"max_rel_err={err:.2e} ok={ok} "
          f"(tapes={n_tapes} rows={n_rows} dtype={dtype.__name__})")
    return ok


def check_grad(name, spec, n_tapes, n_rows, seed):
    rng = np.random.default_rng(seed)
    ops, args, consts = random_population(rng, spec, n_tapes)
    X = rng.standard_normal((n_rows, spec.n_vars)).astype(np.float32)
    y = rng.standard_normal((n_tapes, n_rows)).astype(np.float32)
    tbl = spec_op_table(spec)
    opsj, argsj = jnp.asarray(ops), jnp.asarray(args)
    cj, Xj, yj = jnp.asarray(consts), jnp.asarray(X), jnp.asarray(y)

    def loss_ref(c):
        p = eval_tapes(opsj, argsj, c, Xj, spec.stack_depth, op_table=tbl)
        return jnp.sum(jnp.where(jnp.isnan(p), 0.0, p) * yj)

    g_ref = np.asarray(jax.grad(loss_ref)(cj))
    gbar = jnp.where(jnp.isnan(eval_tapes(opsj, argsj, cj, Xj,
                                          spec.stack_depth, op_table=tbl)),
                     0.0, yj)
    g_out = np.asarray(eval_tapes_pallas_grad(opsj, argsj, cj, Xj, gbar,
                                              spec.stack_depth, op_table=tbl,
                                              interpret=INTERPRET))
    # inf intermediates (e.g. 0-cotangent * inf operand) yield non-finite
    # gradients identically in both backends — require the non-finite masks
    # to agree and compare the finite elements
    fin_ref, fin_out = np.isfinite(g_ref), np.isfinite(g_out)
    ok_mask = bool((fin_ref == fin_out).all())
    m = fin_ref & fin_out
    scale = np.maximum(np.abs(g_ref[m]), 1.0)
    err = float(np.max(np.abs(g_ref[m] - g_out[m]) / scale)) if m.any() else 0.0
    ok = ok_mask and err < 1e-4
    print(f"{name}: finite_mask_equal={ok_mask} max_rel_err={err:.2e} "
          f"ok={ok} (tapes={n_tapes} rows={n_rows}, "
          f"nonfinite={int((~fin_ref).sum())})")
    return ok


def main():
    global INTERPRET
    dev = jax.devices()[0]
    INTERPRET = dev.platform == "cpu"
    print(f"backend: {dev.platform} ({dev}) interpret={INTERPRET}")
    small = TapeSpec(n_vars=2, max_len=24, stack_depth=8,
                     binary_ops=(ADD, SUB, MUL, DIV),
                     unary_ops=(EXP, SIN, COS, NEG))
    # the LV GP protocol's spec shape (run_configs/lv/noise99_eq_gp*.cfg)
    lv = TapeSpec(n_vars=2, max_len=40, stack_depth=16,
                  binary_ops=(ADD, SUB, MUL, DIV), unary_ops=(EXP,))
    ok = True
    ok &= check_forward("fwd small f32", small, 200, 300, jnp.float32, 3)
    ok &= check_forward("fwd small bf16", small, 200, 300, jnp.bfloat16, 3)
    ok &= check_grad("grad small", small, 160, 200, 7)
    if not INTERPRET:
        # production-scale checks exercise the real VMEM budget; in
        # interpret mode they are minutes of per-tile python for no signal
        ok &= check_forward("fwd lv-symm-scale f32", lv, 2048, 12500,
                            jnp.float32, 5)
        ok &= check_forward("fwd lv-symm-scale bf16", lv, 2048, 12500,
                            jnp.bfloat16, 5)
        ok &= check_grad("grad lv const-opt scale", lv, 512, 512, 9)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
