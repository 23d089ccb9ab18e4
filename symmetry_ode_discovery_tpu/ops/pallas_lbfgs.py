"""Fused L-BFGS equation-discovery kernel (Pallas/TPU).

The vmapped optax-based sweep (training/siged.py) is bound by sequential op
dispatch: 100 epochs x 20 L-BFGS iterations x (two-loop recursion + line
search) compiles to ~10^6 tiny HLOs, ~35 s wall clock for the 50-seed LV
protocol. With the normal-equation reduction the whole optimization state per
seed is a handful of (p x p) matrices — so this kernel runs the ENTIRE
discovery protocol (L-BFGS iterations, convergence detection, sequential
thresholding, optimizer resets, NaN bailout; reference train.py:617-766)
inside ONE Pallas program, seeds vectorized across sublanes. One kernel launch
replaces the whole sweep.

Optimizer semantics follow torch.optim.LBFGS with lr and no line search (what
the reference actually uses): ring-buffer curvature history, ys > 1e-10
update guard, H_diag = ys/yy scaling, first-iteration step
t = min(1, 1/|g|_1) * lr (torch lbfgs.py), fixed t = lr afterwards, and the
inner-loop break conditions (torch lbfgs.py step()): max|g| <= tolerance_grad
(1e-7) at epoch start or after a step, directional derivative g.d >
-tolerance_change (1e-9), step max|d*t| <= tolerance_change, and per-iteration
loss change |loss - prev_loss| < tolerance_change. The breaks matter
statistically, not just for speed: with damped lr the reference's optimizer
stalls before weakly-determined (spurious) library coefficients reach their
subsample-optimum magnitudes, so sequential thresholding prunes them — an
implicit regularization that lifts e.g. the dosc noise20 plain-SINDy joint
success from ~29/50 (threshold at the exact optimum) to the reference's 40/50.
A break freezes that seed's lane for the remainder of the epoch
(ep_froz flag); the outer convergence/thresholding logic then sees the small
per-epoch parameter delta exactly as the reference loop does.

Loss (fixed batch, quadratic form): for Xi (d, p), Xm = Xi * mask,
    mse = (sum_i Xm_i S Xm_i^T - 2 <Xm, B> + q) / (N d)
    loss = w_x * mse + w_reg * ||theta||_1
with S = Theta^T Theta, B = (Theta^T dx)^T, q = sum(dx^2) per seed, and
theta the free parameters: Xi itself, or beta (+ const) with
vec(Xi) = Mmap @ theta for the equivariance-constrained path.

Layout: seeds on sublanes (padded to 8), parameter/vec axes on lanes (padded
to 128). All state lives in VMEM scratch for the kernel's lifetime.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@dataclasses.dataclass(frozen=True)
class PLBFGSConfig:
    d: int                  # output dims of Xi
    p: int                  # library terms
    n_params: int           # free parameters (d*p unconstrained; q[+d] constrained)
    num_epochs: int = 100
    inner_iters: int = 20
    history: int = 32       # curvature pairs (torch default 100; 32 is plenty for <=64 params)
    lr: float = 1.0
    w_x: float = 1.0
    w_reg: float = 0.0
    reg_l1: bool = True
    st_freq: int = 100
    threshold: float = 1e-2
    tol: float = 1e-3
    # lanes [0, n_beta) and [n_beta, n_params) are separate torch Parameters
    # (beta, const): the reference's convergence delta sums PER-PARAMETER
    # norms (train.py: sum(norm(p - p_prev))), not one concatenated norm.
    # None = single parameter group.
    n_beta: Optional[int] = None


def _kernel(cfg: PLBFGSConfig, T_ref, Bvec_ref, q_ref, theta0_ref, mmap_ref,
            theta_out, mask_out, stop_out,
            # scratch
            s_hist, y_hist, rho_hist):
    d, p, n = cfg.d, cfg.p, cfg.n_params
    n_vec = d * p
    m = cfg.history
    seeds = theta0_ref.shape[0]
    f32 = jnp.float32

    # T[s, j, :] is row j of the per-seed block-diagonal quadratic-form matrix
    # (I_d x S_s), laid out at full lane width (built on host) so the matvec
    # below is n_vec full-width FMAs — no lane slicing/concatenation, which
    # Mosaic cannot lower for unaligned small vectors.
    T = T_ref[:]            # (seeds, n_vec, LANES)
    Bvec = Bvec_ref[:]      # (seeds, LANES)
    q = q_ref[:]            # (seeds, LANES): col 0 = q, col 1 = 1/(N d)
    Mmap = mmap_ref[:]      # (LANES, LANES) rows=vec index, cols=params
    inv_nd = q[:, 1:2]      # (seeds, 1)
    qv = q[:, 0:1]

    theta = theta0_ref[:]   # (seeds, LANES) lanes >= n
    param_mask = (jax.lax.broadcasted_iota(jnp.int32, (seeds, LANES), 1) < n).astype(f32)
    vec_valid = (jax.lax.broadcasted_iota(jnp.int32, (seeds, LANES), 1) < n_vec).astype(f32)
    mask = vec_valid        # (seeds, LANES): mask over vec(Xi), starts all-ones

    def vec_of(theta):
        # vec(Xi) = theta @ Mmap^T : (seeds, LANES) @ (LANES, LANES)
        return jnp.dot(theta, Mmap.T, preferred_element_type=f32)

    def quad_grad_vec(xv_masked):
        # (I_d x S) xv as n_vec full-width broadcast-FMAs
        out = jnp.zeros((seeds, LANES), f32)
        for j in range(n_vec):
            out = out + xv_masked[:, j][:, None] * T[:, j, :]
        return out

    def loss_and_grad(theta, mask):
        xv = vec_of(theta)
        xm = xv * mask
        Sx = quad_grad_vec(xm)
        mse = (jnp.sum(xm * Sx, axis=1, keepdims=True)
               - 2.0 * jnp.sum(xm * Bvec, axis=1, keepdims=True) + qv) * inv_nd
        loss = cfg.w_x * mse
        g_vec = (2.0 * cfg.w_x) * inv_nd * (Sx - Bvec) * mask
        # chain rule through Mmap: g_theta = g_vec @ Mmap
        g = jnp.dot(g_vec, Mmap, preferred_element_type=f32)
        g = g * param_mask
        if cfg.w_reg > 0.0 and cfg.reg_l1:
            loss = loss + cfg.w_reg * jnp.sum(jnp.abs(theta) * param_mask,
                                              axis=1, keepdims=True)
            g = g + cfg.w_reg * jnp.sign(theta) * param_mask
        return loss, g

    def dotp(a, b):
        return jnp.sum(a * b, axis=1, keepdims=True)  # (seeds, 1)

    zeros_state = jnp.zeros((seeds, LANES), f32)
    s_hist[:] = jnp.zeros_like(s_hist)
    y_hist[:] = jnp.zeros_like(y_hist)
    rho_hist[:] = jnp.zeros_like(rho_hist)

    def lbfgs_direction(g, hist_len, H_diag):
        """Two-loop recursion over the ring buffer (most-recent = slot
        hist_len-1; we compact instead of rotating — see epoch body)."""
        q_ = -g
        alphas = []
        for k in range(m - 1, -1, -1):
            valid = (hist_len > k).astype(f32)  # (seeds, 1)
            sk = s_hist[k]
            yk = y_hist[k]
            rk = rho_hist[k][:, 0:1]
            a = rk * dotp(sk, q_) * valid
            q_ = q_ - a * yk
            alphas.append((a, valid))
        r = q_ * H_diag
        for k in range(m):
            a, valid = alphas[m - 1 - k]
            yk = y_hist[k]
            sk = s_hist[k]
            rk = rho_hist[k][:, 0:1]
            beta = rk * dotp(yk, r) * valid
            r = r + sk * (a - beta) * valid
        return r

    TOL_GRAD = 1e-7    # torch LBFGS tolerance_grad
    TOL_CHANGE = 1e-9  # torch LBFGS tolerance_change

    def inner_iter(i, carry):
        (theta, mask, prev_g, prev_loss, d_dir, hist_len, H_diag, n_iter,
         ep_froz, frozen) = carry
        loss, g = loss_and_grad(theta, mask)

        # torch break conditions, evaluated at the top of the iteration
        # against the previous iteration's step (equivalent placement: torch
        # checks after the closure eval that follows the step).
        at_start = (i == 0).astype(f32)  # scalar: first eval of this epoch
        g_max = jnp.max(jnp.abs(g) * param_mask, axis=1, keepdims=True)
        opt_cond = (g_max <= TOL_GRAD).astype(f32)
        step_small = (jnp.max(jnp.abs(d_dir), axis=1, keepdims=True)
                      <= TOL_CHANGE).astype(f32)
        # torch's |loss - prev_loss| < 1e-9 in practice fires via f32
        # quantization: once the per-iteration improvement drops below one
        # ulp of the loss, consecutive float(closure()) values are EQUAL and
        # the diff is exactly 0 (verified on the reference: dosc seed 7
        # stalls at loss 0.13636276 with improvement ~1.5e-8/iter).  Our
        # quadratic-form loss carries cancellation jitter of the same scale,
        # so exact equality would never trigger; model the quantization
        # explicitly with a one-ulp relative threshold.
        ulp = jnp.abs(loss) * (2.0 ** -23)
        loss_small = (jnp.abs(loss - prev_loss)
                      < jnp.maximum(TOL_CHANGE, ulp)).astype(f32)
        new_freeze = jnp.maximum(
            opt_cond,
            (1.0 - at_start) * jnp.maximum(step_small, loss_small))
        ep_froz = jnp.maximum(ep_froz, new_freeze)
        active = (1.0 - ep_froz) * (1.0 - frozen)  # (seeds, 1)

        is_first = (n_iter == 0).astype(f32)  # (seeds, 1)
        # curvature update (torch lbfgs.py: y = g - prev_g, s = d * t)
        y = g - prev_g
        s = d_dir  # d_dir already scaled by t from the previous step
        ys = dotp(y, s)
        do_update = (active * (1.0 - is_first) * (ys > 1e-10).astype(f32))

        # shift-in update: drop slot 0, append at the end when full
        full = (hist_len >= m).astype(f32)
        # compacting shift only when full and updating
        shift = do_update * full
        for k in range(m - 1):
            s_hist[k] = s_hist[k] * (1 - shift) + s_hist[k + 1] * shift
            y_hist[k] = y_hist[k] * (1 - shift) + y_hist[k + 1] * shift
            rho_hist[k] = rho_hist[k] * (1 - shift) + rho_hist[k + 1] * shift
        write_pos = jnp.minimum(hist_len, m - 1)  # (seeds, 1) int
        rho_new = jnp.where(ys != 0, 1.0 / jnp.where(ys != 0, ys, 1.0), 0.0)
        for k in range(m):
            wk = (write_pos == k).astype(f32) * do_update
            s_hist[k] = s_hist[k] * (1 - wk) + s * wk
            y_hist[k] = y_hist[k] * (1 - wk) + y * wk
            rho_hist[k] = rho_hist[k] * (1 - wk) + rho_new * jnp.ones((1, LANES), f32) * wk
        hist_len = hist_len + (do_update * (1 - full)).astype(jnp.int32)
        yy = dotp(y, y)
        H_new = jnp.where(yy > 0, ys / jnp.where(yy > 0, yy, 1.0), 1.0)
        H_diag = jnp.where(do_update > 0, H_new, H_diag)

        direction = lbfgs_direction(g, hist_len, H_diag)
        # first iteration after a reset: steepest descent, scaled step
        direction = jnp.where(is_first > 0, -g, direction)
        g1 = jnp.sum(jnp.abs(g), axis=1, keepdims=True)
        t_first = jnp.minimum(1.0, 1.0 / jnp.maximum(g1, 1e-30)) * cfg.lr
        t = jnp.where(is_first > 0, t_first, cfg.lr)

        # torch: break (without stepping) when the directional derivative is
        # not sufficiently negative; state updates before the check stand.
        gtd = dotp(g, direction)
        gtd_break = (gtd > -TOL_CHANGE).astype(f32)

        step = direction * t * active * (1.0 - gtd_break)
        theta = theta + step
        # per-seed state advances only on active iterations (a broken seed
        # must resume next epoch exactly where torch's saved state would be)
        prev_g = jnp.where(active > 0, g, prev_g)
        prev_loss = jnp.where(active > 0, loss, prev_loss)
        d_dir = jnp.where(active > 0, direction * t, d_dir)
        n_iter = n_iter + active.astype(jnp.int32)
        ep_froz = jnp.maximum(ep_froz, gtd_break * active)
        return (theta, mask, prev_g, prev_loss, d_dir, hist_len, H_diag,
                n_iter, ep_froz, frozen)

    def epoch_body(e, state):
        (theta, mask, prev, pprev, iters_since_thresh, done, stop_epoch,
         prev_g, prev_loss, d_dir, hist_len, H_diag, n_iter) = state

        frozen = done  # (seeds, 1) f32 in {0, 1}
        ep_froz = jnp.zeros_like(done)  # per-epoch torch break flag
        carry = (theta, mask, prev_g, prev_loss, d_dir, hist_len, H_diag,
                 n_iter, ep_froz, frozen)
        carry = jax.lax.fori_loop(0, cfg.inner_iters, inner_iter, carry)
        (new_theta, _, prev_g, prev_loss, d_dir, hist_len, H_diag, n_iter,
         _, _) = carry
        new_theta = jnp.where(frozen > 0, theta, new_theta)

        # all flags as f32 {0,1}: Mosaic cannot carry i1 vectors through scf.for
        nan = jnp.max(jnp.isnan(new_theta).astype(f32), axis=1, keepdims=True)

        def param_delta(a, b):
            # reference convergence metric: SUM of per-Parameter norms
            # (train.py computes sum(norm(p - p_prev) for p in parameters);
            # beta and const are separate nn.Parameters in the constrained
            # regressor, so sqrt(||db||^2 + ||dc||^2) would under-count by up
            # to sqrt(2) and converge/threshold one state early)
            dd = a - b
            if cfg.n_beta is None:
                return jnp.sqrt(dotp(dd, dd))
            lane = jax.lax.broadcasted_iota(jnp.int32, (seeds, LANES), 1)
            bmask = (lane < cfg.n_beta).astype(f32)
            cmask = (lane >= cfg.n_beta).astype(f32) * (lane < n).astype(f32)
            db = dd * bmask
            dc = dd * cmask
            return jnp.sqrt(dotp(db, db)) + jnp.sqrt(dotp(dc, dc))

        delta = param_delta(new_theta, prev)
        conv = (delta < cfg.tol).astype(f32)
        delta2 = param_delta(new_theta, pprev)
        final_conv = conv * (delta2 < cfg.tol).astype(f32)

        iters_since_thresh = iters_since_thresh + 1
        if cfg.st_freq > 0:
            st_hit = ((iters_since_thresh % cfg.st_freq) == 0).astype(f32)
        else:
            st_hit = jnp.zeros_like(conv)
        # NaN seeds stop BEFORE thresholding (reference train.py:697-699
        # breaks on the NaN check first; |NaN| > threshold would zero the mask)
        tf = ((1.0 - done) * (1.0 - nan) * (1.0 - final_conv)
              * jnp.maximum(conv, st_hit))

        xv = vec_of(new_theta)
        new_mask = jnp.where(
            tf > 0,
            (jnp.abs(xv) > cfg.threshold).astype(f32) * mask,
            mask)
        # optimizer reset on thresholding: clear history and n_iter
        hist_len = jnp.where(tf > 0, 0, hist_len).astype(jnp.int32)
        n_iter = jnp.where(tf > 0, 0, n_iter)
        H_diag = jnp.where(tf > 0, jnp.ones_like(H_diag), H_diag)
        prev_g = prev_g * (1 - tf)
        d_dir = d_dir * (1 - tf)
        conv_thresh = tf * conv
        pprev = jnp.where(conv_thresh > 0, new_theta, pprev)
        iters_since_thresh = jnp.where(tf > 0, 0, iters_since_thresh)

        newly_done = (1.0 - done) * jnp.maximum(final_conv, nan)
        stop_epoch = jnp.where(newly_done > 0, e, stop_epoch)
        done = jnp.maximum(done, newly_done)

        return (new_theta, new_mask, new_theta, pprev, iters_since_thresh,
                done, stop_epoch, prev_g, prev_loss, d_dir, hist_len, H_diag,
                n_iter)

    seeds_i = theta0_ref.shape[0]
    init = (
        theta, mask, theta, theta,
        jnp.zeros((seeds_i, 1), jnp.int32),
        jnp.zeros((seeds_i, 1), jnp.float32),
        jnp.full((seeds_i, 1), cfg.num_epochs, jnp.int32),
        zeros_state,
        jnp.full((seeds_i, 1), 1e30, f32),  # prev_loss (unset, like torch)
        zeros_state,
        jnp.zeros((seeds_i, 1), jnp.int32),
        jnp.ones((seeds_i, 1), f32),
        jnp.zeros((seeds_i, 1), jnp.int32),
    )
    final = jax.lax.fori_loop(0, cfg.num_epochs, epoch_body, init)
    theta_f, mask_f, stop = final[0], final[1], final[6]
    theta_out[:] = theta_f
    mask_out[:] = mask_f
    stop_out[:] = stop * jnp.ones((1, LANES), jnp.int32)


def pallas_lbfgs_sweep(
    cfg: PLBFGSConfig,
    S: jnp.ndarray,        # (seeds, p, p)
    B: jnp.ndarray,        # (seeds, d, p)  == (Theta^T dx)^T rows
    q: jnp.ndarray,        # (seeds,) sum(dx^2)
    n_elems: jnp.ndarray,  # (seeds,) N*d per seed
    theta0: jnp.ndarray,   # (seeds, n_params)
    Mmap: Optional[np.ndarray] = None,  # (d*p, n_params); None = identity
    interpret: bool = False,
):
    """Run the fused sweep. Returns (theta, mask (seeds, d*p), stop_epoch)."""
    seeds = S.shape[0]
    d, p, n = cfg.d, cfg.p, cfg.n_params
    n_vec = d * p
    sub = max(8, seeds)

    # Expanded block-diagonal quadratic-form rows at full lane width:
    # T[s, i*p + j, i*p + r] = S[s, j, r]
    T = jnp.zeros((seeds, n_vec, LANES), jnp.float32)
    for i in range(d):
        T = T.at[:, i * p:(i + 1) * p, i * p:(i + 1) * p].set(S.astype(jnp.float32))
    T = _pad_to(T, sub, 0)
    Bvec = jnp.zeros((seeds, LANES), jnp.float32)
    for i in range(d):
        Bvec = Bvec.at[:, i * p:(i + 1) * p].set(B[:, i, :].astype(jnp.float32))
    Bvec = _pad_to(Bvec, sub, 0)
    qcol = jnp.zeros((sub, LANES), jnp.float32)
    qcol = qcol.at[:seeds, 0].set(q.astype(jnp.float32))
    qcol = qcol.at[:seeds, 1].set(1.0 / n_elems.astype(jnp.float32))
    th0 = _pad_to(_pad_to(theta0.astype(jnp.float32), LANES, 1), sub, 0)
    if Mmap is None:
        Mmap = np.eye(n_vec, dtype=np.float32)
    mm = jnp.zeros((LANES, LANES), jnp.float32)
    mm = mm.at[:n_vec, :n].set(jnp.asarray(Mmap, jnp.float32))

    kernel = functools.partial(_kernel, cfg)
    out_shapes = (
        jax.ShapeDtypeStruct((sub, LANES), jnp.float32),  # theta
        jax.ShapeDtypeStruct((sub, LANES), jnp.float32),  # mask(vec)
        jax.ShapeDtypeStruct((sub, LANES), jnp.int32),    # stop epoch
    )
    theta_f, mask_f, stop = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((cfg.history, sub, LANES), jnp.float32),
            pltpu.VMEM((cfg.history, sub, LANES), jnp.float32),
            pltpu.VMEM((cfg.history, sub, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(T, Bvec, qcol, th0, mm)
    return (theta_f[:seeds, :n], mask_f[:seeds, :n_vec].reshape(seeds, d, p),
            stop[:seeds, 0])
