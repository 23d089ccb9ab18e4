"""SINDy equation discovery by L-BFGS with convergence-triggered sequential
thresholding.

TPU-native counterpart of reference train.py:617-766 (`train_SIGED_lbfgs`,
data-space path). The reference's Python epoch loop with in-place
mask/optimizer mutation becomes a `lax.scan` over a fixed epoch budget with a
`done` flag — fully jittable and **vmappable over seeds**, which is what turns
the reference's sequential 50-seed bash sweep into one batched TPU program.

Optimizer mapping: torch.optim.LBFGS(lr, max_iter=20, no line search) maps to
`optax.lbfgs(linesearch=None)` with the torch inner-loop stall breaks
(fixed-lr, the default; hp.linesearch=True opts into zoom instead), 20 inner
iterations per epoch. The outer
control flow is preserved exactly (reference train.py:692-725):
  - epoch := 20 L-BFGS iterations on the fixed full batch;
  - convergence when sum of per-parameter update norms < 1e-3;
  - on convergence: if also converged w.r.t. the params at the last
    thresholding -> STOP; else threshold the mask, reset the optimizer,
    remember params;
  - every st_freq epochs without convergence: threshold + reset;
  - NaN in params -> stop immediately (reference train.py:697-699).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.sindy import SINDyConfig
from ..ops.constraint import xi_from_beta


@dataclasses.dataclass(frozen=True)
class LBFGSHParams:
    """Static hyper-parameters of the L-BFGS discovery loop (flags of
    reference parser_utils.py:21-94 that reach train_SIGED_lbfgs)."""

    num_epochs: int = 100
    lr_sindy: float = 1.0
    w_sindy_x: float = 1.0
    w_sindy_reg: float = 0.0
    sindy_reg_type: str = "l1"  # 'l1' | 'none'
    w_sym_reg: float = 0.0
    st_freq: int = 100
    threshold: float = 1e-2
    tol: float = 1e-3
    inner_iters: int = 20  # torch LBFGS max_iter default
    # False (default) = fixed-lr, torch.optim.LBFGS semantics incl. the
    # inner-loop stall breaks — what the reference actually runs everywhere
    # (train.py:630, no line_search_fn) and what the Pallas kernel
    # implements. True = optax zoom linesearch (an optimization upgrade the
    # reference never had; changes sweep statistics).
    linesearch: bool = False
    # Two-loop direction engine for the fixed-lr path: 'xla' = optax
    # scale_by_lbfgs (~8*memory tiny HLOs per closure — half the flagship
    # sweep's device time in the XPlane profile), 'pallas' = the same
    # algorithm as ONE VMEM kernel (ops/pallas_lbfgs_dir.py). Identical
    # math modulo f32 grouping; parity guarded by tests/test_lbfgs_dir.py.
    dir_backend: str = "xla"


@struct.dataclass
class LBFGSResult:
    Xi: jnp.ndarray
    mask: jnp.ndarray
    stop_epoch: jnp.ndarray
    final_loss: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LatentCtx:
    """Latent-space discovery context (use_latent path of reference
    train_SIGED_lbfgs, train.py:647-661): the frozen autoencoder's pushforwards.

    decode_jvp(z, dz_pred) must return the data-space derivative prediction
    J_dec(z) dz_pred (reference autoencoder.compute_dx)."""

    decode_jvp: Callable
    w_sindy_z: float = 0.0


def _make_param_fns(cfg: SINDyConfig, Q: Optional[jnp.ndarray]):
    """(init_params, xi_of) for the free parameters of the regressor.

    Unconstrained: {'Xi'}; constrained: {'beta'[, 'const']} with Xi derived
    via Q (reference sindy.py:58-66,169-176).
    """
    d, p = cfg.latent_dim, cfg.n_terms

    if not cfg.constraint:
        def init_params(key):
            return {"Xi": jax.random.normal(key, (d, p))}

        def xi_of(params):
            return params["Xi"]
    else:
        assert Q is not None

        def init_params(key):
            k1, k2 = jax.random.split(key)
            params = {"beta": jax.random.normal(k1, (cfg.n_free,))}
            if cfg.allow_constant or cfg.dangling_const:
                # dangling_const: reference sindy.py:59 registers const as a
                # Parameter even under constrain_constant — it never reaches
                # Xi (xi_of ignores it) but feeds the L1 penalty and the
                # convergence delta like any other parameter
                params["const"] = jax.random.normal(k2, (d, 1))
            return params

        def xi_of(params):
            const = params.get("const", jnp.zeros((d, 1)))
            return xi_from_beta(Q, params["beta"], const, d, p,
                                cfg.allow_constant)

    return init_params, xi_of


def _init_loop_state(params0, opt, mask0, hp: LBFGSHParams):
    """Initial bookkeeping state of the outer thresholding loop."""
    return dict(
        params=params0, opt_state=opt.init(params0), prev=params0,
        pprev=params0, n_iters=jnp.array(0), mask=mask0,
        done=jnp.array(False), stop_epoch=jnp.array(hp.num_epochs),
        last_loss=jnp.array(jnp.inf),
    )


def _param_delta(a, b):
    return sum(
        jnp.linalg.norm(pa - pb)
        for pa, pb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def _lbfgs_epoch_update(opt, hp: LBFGSHParams, xi_of, loss_fn, state, epoch,
                        remat: bool = False):
    """One outer epoch, shared by the fused-scan driver (train_sindy_lbfgs)
    and the host-stepped driver (make_lbfgs_stepper): inner_iters L-BFGS
    iterations at fixed mask, then the convergence / thresholding / NaN
    bookkeeping of reference train.py:692-725.

    loss_fn(params, mask) -> scalar. remat wraps the closure in
    jax.checkpoint — required when the loss differentiates through
    autoencoder JVPs and odeint rollouts, else the L-BFGS scan keeps every
    iteration's activation graph alive and OOMs HBM on vmapped sweeps.
    """
    params, opt_state, mask, done = (state["params"], state["opt_state"],
                                     state["mask"], state["done"])

    fn = lambda p: loss_fn(p, mask)
    if remat:
        fn = jax.checkpoint(fn)

    if hp.linesearch:
        def one_iter(carry, _):
            params, opt_state = carry
            value, grad = optax.value_and_grad_from_state(fn)(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad, value_fn=fn
            )
            params = optax.apply_updates(params, updates)
            return (params, opt_state), value
    else:
        # torch.optim.LBFGS inner-loop break conditions (lbfgs.py step()):
        # max|g| <= tolerance_grad, per-iteration |loss - prev_loss| <
        # tolerance_change, max|step| <= tolerance_change, and the
        # directional-derivative break gtd = g.d > -tolerance_change (checked
        # before the step is applied, so a non-descent direction stalls the
        # epoch without moving). A firing condition freezes the remainder of
        # the epoch (torch breaks the while loop), so the outer convergence
        # check sees the same stalled parameter delta the reference does. The
        # loss here is an elementwise-mean in f32 exactly like torch's, so
        # the literal 1e-9 comparison fires through f32 quantization the same
        # way (consecutive equal floats).
        TOL_CHANGE, TOL_GRAD = 1e-9, 1e-7

        def one_iter(carry, i):
            params, opt_state, prev_val, prev_step, frozen = carry
            value, grad = jax.value_and_grad(fn)(params)
            leaves_g = jax.tree_util.tree_leaves(grad)
            gmax = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves_g]))
            frozen = jnp.logical_or(frozen, gmax <= TOL_GRAD)
            frozen = jnp.logical_or(
                frozen,
                jnp.logical_and(
                    i > 0,
                    jnp.logical_or(prev_step <= TOL_CHANGE,
                                   jnp.abs(value - prev_val) < TOL_CHANGE)))
            # torch commits the curvature pair and prev_loss/prev_grad
            # BEFORE the gtd check fires (lbfgs.py: the history update and
            # prev assignments precede the break), so the gtd-break freezes
            # only the parameter step — track the pre-gtd stall separately
            stalled = frozen
            # torch's first iteration after optimizer (re)creation takes
            # d = -g with t = min(1, 1/|g|_1) * lr (lbfgs.py, state n_iter
            # == 1; the reference re-creates the optimizer on every
            # thresholding, train.py:717, which our opt.init reset mirrors).
            # optax's first direction is -g/|g|_2 instead — override the
            # whole first step, not just its scale. The curvature memory is
            # unaffected: optax rebuilds pairs from the params/grad diffs
            # we actually apply, so subsequent directions match torch's
            # two-loop with the gamma = ys/y.y initial preconditioner.
            first = opt_state[0].count == 0
            g1 = sum(jnp.sum(jnp.abs(g)) for g in leaves_g)
            t1 = jnp.minimum(1.0, 1.0 / g1)
            updates, new_opt_state = opt.update(grad, opt_state, params)
            # updates = lr * d, so gtd = g.d = g.updates / lr; on the first
            # iteration torch's d = -g gives gtd = -|g|^2
            gg = sum(jnp.sum(g * g) for g in leaves_g)
            gtd = jnp.where(
                first, -gg,
                sum(jnp.sum(g * u) for g, u in
                    zip(leaves_g,
                        jax.tree_util.tree_leaves(updates))) / hp.lr_sindy)
            frozen = jnp.logical_or(frozen, gtd > -TOL_CHANGE)
            updates = jax.tree_util.tree_map(
                lambda u, g: jnp.where(first, -hp.lr_sindy * t1 * g, u),
                updates, grad)
            # step-size break compares the step actually taken (d * t)
            step_max = jnp.max(jnp.stack([jnp.max(jnp.abs(u))
                                          for u in jax.tree_util.tree_leaves(updates)]))
            new_params = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(frozen, o, n), new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(stalled, o, n), new_opt_state, opt_state)
            prev_val = jnp.where(stalled, prev_val, value)
            prev_step = jnp.where(frozen, prev_step, step_max)
            return (params, opt_state, prev_val, prev_step, frozen), value

    if hp.linesearch:
        (new_params, new_opt_state), values = jax.lax.scan(
            one_iter, (params, opt_state), None, length=hp.inner_iters
        )
    else:
        (new_params, new_opt_state, _, _, _), values = jax.lax.scan(
            one_iter,
            (params, opt_state, jnp.array(jnp.inf), jnp.array(jnp.inf),
             jnp.array(False)),
            jnp.arange(hp.inner_iters),
        )
    loss = values[-1]
    # freeze updates once done
    new_params = jax.tree_util.tree_map(
        lambda n, o: jnp.where(done, o, n), new_params, params)

    nan = jnp.any(jnp.stack([jnp.any(jnp.isnan(p))
                             for p in jax.tree_util.tree_leaves(new_params)]))
    n_iters = state["n_iters"] + 1
    conv = _param_delta(new_params, state["prev"]) < hp.tol
    final_conv = jnp.logical_and(conv,
                                 _param_delta(new_params, state["pprev"]) < hp.tol)

    if hp.st_freq > 0:
        st_hit = n_iters % hp.st_freq == 0
    else:
        st_hit = jnp.array(False)
    # NaN params stop BEFORE thresholding (reference train.py:697-699 breaks
    # on the NaN check first) — otherwise an st_freq epoch that NaNed would
    # zero the whole mask through |NaN| > threshold = False
    thresh_event = jnp.logical_and(
        jnp.logical_and(~done, ~nan),
        jnp.logical_and(~final_conv, jnp.logical_or(conv, st_hit)))

    Xi = xi_of(new_params)
    new_mask = jnp.where(
        thresh_event,
        jnp.logical_and(jnp.abs(Xi) > hp.threshold, mask > 0).astype(mask.dtype),
        mask,
    )
    # optimizer reset on thresholding (reference train.py:717,723)
    fresh_opt = opt.init(new_params)
    new_opt_state = jax.tree_util.tree_map(
        lambda f, o: jnp.where(thresh_event, f, o), fresh_opt, new_opt_state)
    # pprev reset only on the convergence-triggered thresholding (train.py:718)
    conv_thresh = jnp.logical_and(thresh_event, conv)
    pprev = jax.tree_util.tree_map(
        lambda n, o: jnp.where(conv_thresh, n, o), new_params, state["pprev"])
    n_iters = jnp.where(thresh_event, 0, n_iters)

    newly_done = jnp.logical_and(~done, jnp.logical_or(final_conv, nan))
    return dict(
        params=new_params, opt_state=new_opt_state, prev=new_params,
        pprev=pprev, n_iters=n_iters, mask=new_mask,
        done=jnp.logical_or(done, newly_done),
        stop_epoch=jnp.where(newly_done, epoch, state["stop_epoch"]),
        last_loss=jnp.where(done, state["last_loss"], loss),
    )


def _make_opt(hp: LBFGSHParams):
    if hp.linesearch:
        return optax.lbfgs(hp.lr_sindy)
    # torch-style fixed-step L-BFGS (no line search): fewer sequential ops
    # per iteration — the fast path for vmapped sweeps. memory_size matches
    # torch.optim.LBFGS's history_size default (100, what the reference
    # runs, train.py:630) — optax's default 10 truncates the curvature
    # history after half an epoch (inner_iters=20) and changes directions.
    if hp.dir_backend == "pallas":
        from ..ops.pallas_lbfgs_dir import lbfgs_pallas

        return lbfgs_pallas(hp.lr_sindy, memory_size=100,
                            interpret=jax.default_backend() == "cpu")
    return optax.lbfgs(hp.lr_sindy, linesearch=None, memory_size=100)


def train_sindy_lbfgs(
    cfg: SINDyConfig,
    Q: Optional[jnp.ndarray],
    x: jnp.ndarray,
    dx: jnp.ndarray,
    hp: LBFGSHParams,
    key: jax.Array,
    sym_reg_fn: Optional[Callable] = None,
    latent: Optional[LatentCtx] = None,
) -> LBFGSResult:
    """Fit the regressor to one fixed batch by L-BFGS.

    Data-space path (latent=None): x/dx are data samples; the regressor
    predicts dx from Theta(x) (reference train.py:662-679).

    Latent path (latent given): x is the PRE-ENCODED z, dx the data-space
    derivative target is recovered through latent.decode_jvp; the loss is
    w_sindy_z * MSE(dz_pred, dz) + w_sindy_x * MSE(J_dec(z) dz_pred, dx_data)
    (reference train.py:647-655). Pass dx=(dz, dx_data) as a tuple.

    sym_reg_fn, if given, receives (forward_fn, x) where forward_fn(x) is the
    current masked regressor, and must return a scalar penalty — the hook for
    EquivSINDy-r's symmetry regularization (reference train.py:666-679; the
    reference disables it on the latent path, train.py:656-661).
    Everything is shape-static: `jax.vmap` this over (x, dx, key) for the
    multi-seed sweep.
    """
    init_params, xi_of = _make_param_fns(cfg, Q)
    params0 = init_params(key)
    mask0 = jnp.ones((cfg.latent_dim, cfg.n_terms))
    theta = cfg.library(x)  # fixed batch: precompute once (the reference
    # re-evaluates it in every closure call, train.py:663)

    # Normal-equation reduction: with a FIXED batch and no symmetry penalty,
    # mean((Theta Xi^T - dx)^2) = (tr(Xi S Xi^T) - 2<Xi, b^T> + q) / (N d)
    # with S = Theta^T Theta (p x p), b = Theta^T dx, q = sum(dx^2) — computed
    # once, so every L-BFGS evaluation costs O(p^2 d) instead of O(N p d).
    # Identical loss and gradient; ~2500x fewer FLOPs per iteration at the
    # shipped subsample sizes.
    use_normal_eq = (latent is None) and (sym_reg_fn is None or hp.w_sym_reg == 0.0)
    if use_normal_eq:
        S = theta.T @ theta
        b_t = (theta.T @ dx).T  # (d, p)
        q = jnp.sum(dx ** 2)
        n_elems = dx.shape[0] * dx.shape[1]

    opt = _make_opt(hp)

    def add_reg(loss, params):
        # per-Parameter L1 like the reference's torch.norm(p, 1) sum — one
        # implementation shared by every loss branch
        if hp.sindy_reg_type == "l1":
            l1 = sum(jnp.sum(jnp.abs(p))
                     for p in jax.tree_util.tree_leaves(params))
            return loss + hp.w_sindy_reg * l1
        if hp.sindy_reg_type != "none":
            raise ValueError(f"Unknown regularization type: {hp.sindy_reg_type}")
        return loss

    def loss_fn(params, mask):
        Xi = xi_of(params)
        if use_normal_eq:
            Xm = Xi * mask
            mse = (jnp.einsum("ip,pq,iq->", Xm, S, Xm)
                   - 2.0 * jnp.sum(Xm * b_t) + q) / n_elems
            return add_reg(hp.w_sindy_x * mse, params)
        pred = theta @ (Xi * mask).T
        if latent is None:
            loss = hp.w_sindy_x * jnp.mean((pred - dx) ** 2)
            if sym_reg_fn is not None and hp.w_sym_reg > 0.0:
                def forward_fn(xq):
                    return cfg.library(xq) @ (Xi * mask).T
                loss = loss + hp.w_sym_reg * sym_reg_fn(forward_fn, x)
        else:
            dz, dx_data = dx
            dx_pred = latent.decode_jvp(x, pred)
            loss = (latent.w_sindy_z * jnp.mean((pred - dz) ** 2)
                    + hp.w_sindy_x * jnp.mean((dx_pred - dx_data) ** 2))
        return add_reg(loss, params)

    remat = sym_reg_fn is not None and hp.w_sym_reg > 0.0

    def outer_step(state, epoch):
        return _lbfgs_epoch_update(opt, hp, xi_of, loss_fn, state, epoch,
                                   remat=remat), None

    state0 = _init_loop_state(params0, opt, mask0, hp)
    # scan (not while_loop): measured faster on TPU for the vmapped sweep —
    # XLA pipelines the fixed-trip loop, while a batched while_loop runs to
    # the slowest lane anyway and defeats those optimizations. Per-seed "early
    # stop" is realized by the done-mask freezing updates.
    state, _ = jax.lax.scan(outer_step, state0, jnp.arange(hp.num_epochs))
    return LBFGSResult(Xi=xi_of(state["params"]), mask=state["mask"],
                       stop_epoch=state["stop_epoch"], final_loss=state["last_loss"])


def make_sym_reg_fn(ae_def, ae_params, batch_stats, spec, g_state,
                    sym_reg_type: str, int_t: float, int_dt: float):
    """Build the symmetry-regularization hook for the L-BFGS loop.

    Types 'i'/'f' roll the candidate ODE out with Euler odeint and penalize
    (in)finitesimal asymmetry of the flow map (reference train.py:667-673);
    type 'r' penalizes the reversed symmetry defect of the vector field
    directly (train.py:674-675).
    """
    from ..ops.integrators import odeint
    from . import symmreg as sr

    def fn(forward_fn, x):
        if sym_reg_type in ("i", "f"):
            def forward_step(q):
                return odeint(forward_fn, q, int_t, int_dt)
            fx = forward_step(x)
            x_fx = jnp.stack([x, fx], axis=1)
            if sym_reg_type == "i":
                return sr.symmreg_i(ae_def, ae_params, batch_stats, spec, g_state,
                                    x_fx, f=forward_step)
            return sr.symmreg_f(ae_def, ae_params, batch_stats, spec, g_state,
                                x_fx, f=forward_step)
        elif sym_reg_type == "r":
            return sr.symmreg_r(ae_def, ae_params, batch_stats, spec, g_state,
                                x, h=forward_fn)
        raise ValueError(f"Unknown sym_reg_type: {sym_reg_type}")

    return fn


def distill_to_data_space(
    cfg_dst: SINDyConfig,
    x: jnp.ndarray,
    dx_synth: jnp.ndarray,
    hp: LBFGSHParams,
    key: jax.Array,
) -> LBFGSResult:
    """Phase 2 of reference train_SIGED_lbfgs (train.py:768-852): re-fit an
    unconstrained regressor in data space against derivatives synthesized from
    the frozen latent equation (dx_synth = J_dec(z) regressor(z))."""
    return train_sindy_lbfgs(cfg_dst, None, x, dx_synth, hp, key)


def make_lbfgs_stepper(cfg: SINDyConfig, Q, hp: LBFGSHParams,
                       sym_reg_fn: Optional[Callable] = None,
                       sym_reg_prep: Optional[Callable] = None,
                       epochs_per_call: int = 1,
                       remat: Optional[bool] = None):
    """Host-steppable variant of train_sindy_lbfgs for heavy (symreg) losses.

    A single fused 100-epoch device program can exceed the TPU runtime's
    execution watchdog when every L-BFGS iteration differentiates through
    autoencoder JVPs and odeint rollouts; this splits the SAME protocol into
    bounded device calls driven from the host:

        init, step, extract = make_lbfgs_stepper(cfg, Q, hp, sym_reg_fn)
        carry = jax.jit(jax.vmap(init))(xs, dxs, keys)
        step_j = jax.jit(jax.vmap(step, in_axes=(0, None)))
        for e in range(0, hp.num_epochs, epochs_per_call):
            carry = step_j(carry, e)
        Xi, mask = extract(carry)

    Semantics identical to train_sindy_lbfgs (same epoch body); per-seed data
    rides in the carry so the whole thing vmaps over seeds.

    sym_reg_prep: optional per-seed precomputation hook (the
    make_symmreg_i_fast fast path) — `prep(x) -> ctx` runs once in `init`,
    the ctx pytree rides in the carry, and sym_reg_fn is then called as
    `sym_reg_fn(forward_fn, x, ctx)`.

    epochs_per_call: epochs fused into one device program per host step
    (a lax.scan); raise it as far as the watchdog budget allows to amortize
    dispatch latency.

    remat: override the checkpoint-the-closure default (None = checkpoint
    whenever a symreg loss is active). Pass False with the Pallas-fused
    penalty (make_symmreg_i_fast pallas=True) — its custom-VJP kernels keep
    only kernel inputs as residuals, so rematerialization just re-runs them.
    """
    init_params, xi_of = _make_param_fns(cfg, Q)
    opt = _make_opt(hp)
    has_sym = sym_reg_fn is not None and hp.w_sym_reg > 0.0
    remat = has_sym if remat is None else (remat and has_sym)

    # fused-rollout penalties (make_symmreg_i_fast fused_rollout_lib) take
    # the masked coefficient matrix directly instead of a closure
    wants_coefs = bool(getattr(sym_reg_fn, "wants_coefs", False))

    def make_loss(x, dx, srctx):
        theta = cfg.library(x)

        def loss_fn(params, mask):
            Xi = xi_of(params)
            pred = theta @ (Xi * mask).T
            loss = hp.w_sindy_x * jnp.mean((pred - dx) ** 2)
            if has_sym:
                def forward_fn(xq):
                    return cfg.library(xq) @ (Xi * mask).T
                if wants_coefs:
                    loss = loss + hp.w_sym_reg * sym_reg_fn(Xi * mask, x, srctx)
                elif sym_reg_prep is not None:
                    loss = loss + hp.w_sym_reg * sym_reg_fn(forward_fn, x, srctx)
                else:
                    loss = loss + hp.w_sym_reg * sym_reg_fn(forward_fn, x)
            if hp.sindy_reg_type == "l1":
                l1 = sum(jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(params))
                loss = loss + hp.w_sindy_reg * l1
            return loss

        return loss_fn

    def init(x, dx, key, params0=None):
        # params0 override: cross-framework replay mode feeds the torch
        # reference's recorded Xi init (tools/ref_isymreg_outcome.py) so the
        # optimizer state is initialized on the identical starting point
        if params0 is None:
            params0 = init_params(key)
        mask0 = jnp.ones((cfg.latent_dim, cfg.n_terms))
        carry = dict(x=x, dx=dx, **_init_loop_state(params0, opt, mask0, hp))
        if sym_reg_prep is not None:
            carry["srctx"] = sym_reg_prep(x)
        return carry

    def step(carry, epoch0):
        aux = {k: carry[k] for k in ("x", "dx", "srctx") if k in carry}
        loss_fn = make_loss(carry["x"], carry["dx"], carry.get("srctx"))
        state = {k: v for k, v in carry.items() if k not in aux}

        def body(st, e):
            # epochs past the protocol budget are no-ops (the host driver's
            # last call may overshoot when num_epochs % epochs_per_call != 0
            # — without this, extra thresholding rounds silently change the
            # sweep statistics): borrow the done-lane freeze, then restore
            # the true done flag (an over-budget epoch is not a convergence)
            live = e < hp.num_epochs
            st_in = dict(st, done=jnp.logical_or(st["done"], ~live))
            new = _lbfgs_epoch_update(opt, hp, xi_of, loss_fn, st_in, e,
                                      remat=remat)
            new["done"] = jnp.where(live, new["done"], st["done"])
            return new, None

        state, _ = jax.lax.scan(body, state,
                                epoch0 + jnp.arange(epochs_per_call))
        return dict(**aux, **state)

    def extract(carry):
        return xi_of(carry["params"]), carry["mask"]

    return init, step, extract
