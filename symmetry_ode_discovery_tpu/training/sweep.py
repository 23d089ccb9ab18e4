"""Multi-seed discovery sweeps as single batched TPU programs.

The reference runs 50 seeds as a sequential bash loop, each seed a full
process relaunch (reference run_scripts/*.sh). Here a sweep is `vmap` over a
seed axis (optionally `shard_map`-ed over the device mesh, parallel/mesh.py):
per-seed data subsampling, parameter init, the full L-BFGS/STLSQ/WSINDy fit,
and the evaluation against ground truth all happen on device in one jit.

Per-seed protocol parity:
- SINDy/EquivSINDy (LBFGS): seed -> random permutation subset of
  lbfgs_subsample * N samples (reference main.py:36-38 DataLoader shuffle) +
  random param init -> train_SIGED_lbfgs -> eval (main.py:119-138).
- WSINDy: seed -> one random trajectory, random 80%-length window
  (reference main_wsindy.py:34-43) -> iterated weak solve -> eval.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sindy import SINDyConfig, init_sindy, get_Xi, solve_sindy
from ..models.wsindy import make_wsindy_matrices, solve_wsindy
from ..training.siged import LBFGSHParams, train_sindy_lbfgs
from ..parallel.mesh import make_mesh, shard_sweep


def eval_coefficients_jnp(coef: jnp.ndarray, mask: jnp.ndarray, truth: jnp.ndarray):
    """On-device version of evaluation/eval_eq.eval_sindy_coefficients
    (reference eval_eq.py:7-34): returns (correct_form (d,), mse (d,))."""
    mask_b = mask > 0
    coef = jnp.where(mask_b, coef, 0.0)
    truth_mask = truth != 0
    correct_form = jnp.all(mask_b == truth_mask, axis=1).astype(jnp.float32)
    tm = truth_mask.astype(coef.dtype)
    diff2 = (coef - truth) ** 2 * tm
    mse = jnp.sum(diff2, axis=1) / jnp.sum(tm, axis=1)
    return correct_form, mse


@dataclasses.dataclass
class SweepResult:
    Xi: np.ndarray  # (n_seeds, d, p)
    mask: np.ndarray
    correct_form: np.ndarray  # (n_seeds, d)
    mse: np.ndarray

    def results_list(self):
        """Per-seed dicts in the reference npz schema, for aggregate_results."""
        out = []
        for i in range(self.Xi.shape[0]):
            out.append({
                "coefficients": self.Xi[i] * self.mask[i],
                "correct_form": self.correct_form[i],
                "mse": self.mse[i],
                "correct_form_all": np.all(self.correct_form[i] > 0),
                "mse_all": np.mean(self.mse[i]),
            })
        return out


def _finalize(Xi, mask, truth) -> SweepResult:
    cf, mse = jax.vmap(lambda c, m: eval_coefficients_jnp(c, m, jnp.asarray(truth)))(Xi, mask)
    return SweepResult(
        Xi=np.asarray(Xi), mask=np.asarray(mask),
        correct_form=np.asarray(cf), mse=np.asarray(mse),
    )


def _maybe_shard(run_one, seeds, n_mesh_devices: Optional[int]):
    n_dev = len(jax.devices()) if n_mesh_devices in (None, 0) else n_mesh_devices
    n_dev = min(n_dev, len(jax.devices()))
    if n_dev > 1 and len(seeds) % n_dev == 0:
        mesh = make_mesh(n_dev)
        return shard_sweep(run_one, mesh)(seeds)
    if n_dev > 1:
        # don't let the user believe the mesh is in use
        print(f"sweep: {len(seeds)} seeds not divisible by {n_dev} devices; "
              "running single-device vmap")
    return jax.jit(jax.vmap(run_one))(seeds)


def sweep_sindy_lbfgs(
    cfg: SINDyConfig,
    Q: Optional[np.ndarray],
    x: jnp.ndarray,
    dx: jnp.ndarray,
    truth: np.ndarray,
    hp: LBFGSHParams,
    seeds: np.ndarray,
    lbfgs_subsample: float = 1.0,
    n_mesh_devices: Optional[int] = None,
    backend: str = "auto",
    subsample_idx: Optional[np.ndarray] = None,
) -> SweepResult:
    """Vmapped/sharded SINDy or EquivSINDy-c discovery sweep (LBFGS path).

    backend: 'optax' (zoom-linesearch L-BFGS, one HLO per op), 'pallas' (the
    fused on-core kernel, ops/pallas_lbfgs.py — torch-style fixed-lr L-BFGS,
    ~500x faster on TPU), or 'auto' (pallas on TPU when the protocol has no
    symmetry penalty / latent space, else optax).

    subsample_idx: optional (n_seeds, k) externally-supplied per-seed
    subsample indices (torch-RNG cross-check mode; see _prep_normal_eq).
    """
    n = x.shape[0]
    k = int(n * lbfgs_subsample)
    Qj = jnp.asarray(Q) if Q is not None else None
    if subsample_idx is not None:
        assert subsample_idx.shape == (len(seeds), k), (
            f"subsample_idx {subsample_idx.shape} != ({len(seeds)}, {k})")

    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "optax"
    if hp.linesearch and backend == "pallas":
        # the fused kernel implements torch-style fixed-lr L-BFGS only; a
        # zoom-linesearch request must not silently run a different optimizer
        backend = "optax"

    if backend == "pallas":
        mesh = None
        if n_mesh_devices and n_mesh_devices > 1:
            if len(seeds) % n_mesh_devices == 0:
                mesh = make_mesh(n_mesh_devices)
            else:
                print(f"sweep: {len(seeds)} seeds not divisible by "
                      f"{n_mesh_devices} devices; single-device kernel")
        return _pallas_lbfgs_sweep(cfg, Q, x, dx, truth, hp, seeds, k,
                                   subsample_idx=subsample_idx, mesh=mesh)

    def run_one(seed, idx_row=None):
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, seed)
        kperm, kinit = jax.random.split(key)
        idx = (jax.random.permutation(kperm, n)[:k] if idx_row is None
               else idx_row)
        res = train_sindy_lbfgs(cfg, Qj, x[idx], dx[idx], hp, kinit)
        return res.Xi, res.mask

    if subsample_idx is not None:
        if n_mesh_devices and n_mesh_devices > 1:
            print("sweep: external subsample_idx path is vmap-only; "
                  f"ignoring --mesh_devices {n_mesh_devices} (optax backend)")
        Xi, mask = jax.jit(jax.vmap(run_one))(jnp.asarray(seeds),
                                              jnp.asarray(subsample_idx))
    else:
        Xi, mask = _maybe_shard(run_one, jnp.asarray(seeds), n_mesh_devices)
    return _finalize(Xi, mask, truth)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _prep_normal_eq(cfg, k, n_params, x, dx, seeds, idx=None):
    """Per-seed subsample + normal-equation reduction, jit-cached on
    (cfg, k, n_params, shapes) so repeated sweeps don't recompile.

    idx: optional (n_seeds, k) int array of externally-supplied subsample
    indices (e.g. the reference's actual torch-DataLoader draws, dumped by
    tools/refrun_dump_subsample.py) replacing the jax per-seed permutation —
    the param init stays the per-seed jax draw (the L-BFGS fit converges to
    the subsample's lstsq optimum, so init does not steer outcomes)."""
    n = x.shape[0]
    lib = cfg.library

    def prep(seed, idx_row):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        kperm, kinit = jax.random.split(key)
        if idx_row is None:
            idx_row = jax.random.permutation(kperm, n)[:k]
        th = lib(x[idx_row])
        dxi = dx[idx_row]
        S = th.T @ th
        B = (th.T @ dxi).T
        q = jnp.sum(dxi ** 2)
        th0 = jax.random.normal(kinit, (n_params,))
        return S, B, q, jnp.asarray(float(dxi.size)), th0

    if idx is None:
        return jax.vmap(lambda s: prep(s, None))(seeds)
    return jax.vmap(prep)(seeds, jnp.asarray(idx))


def _pallas_setup(cfg, Q, hp):
    """Shared kernel config: (pcfg, Mmap, n_params) for a protocol.

    Mmap = [Q | const columns]; theta = [beta, const] (reference
    sindy.py:58-60 init, 169-176 reconstruction; row-major Q)."""
    from ..ops.pallas_lbfgs import PLBFGSConfig

    d, p = cfg.latent_dim, cfg.n_terms
    if cfg.constraint:
        n_free = Q.shape[1]
        cols = [np.asarray(Q, np.float32)]
        if cfg.allow_constant:
            cc = np.zeros((d * p, d), np.float32)
            for i in range(d):
                cc[i * p, i] = 1.0
            cols.append(cc)
        elif cfg.dangling_const:
            # bug-compat (reference sindy.py:59): const stays a parameter —
            # ZERO Mmap columns (it never reaches Xi) but it still feeds the
            # kernel's L1 term and the per-group convergence delta
            cols.append(np.zeros((d * p, d), np.float32))
        Mmap = np.concatenate(cols, axis=1)
        n_params = Mmap.shape[1]
    else:
        Mmap = None
        n_params = d * p

    has_const = cfg.constraint and (cfg.allow_constant or cfg.dangling_const)
    pcfg = PLBFGSConfig(
        d=d, p=p, n_params=n_params, num_epochs=hp.num_epochs,
        inner_iters=hp.inner_iters, lr=hp.lr_sindy, w_x=hp.w_sindy_x,
        w_reg=hp.w_sindy_reg, reg_l1=(hp.sindy_reg_type == "l1"),
        st_freq=hp.st_freq, threshold=hp.threshold, tol=hp.tol,
        # beta and const are separate torch Parameters: the convergence
        # delta must sum their norms separately (reference train.py)
        n_beta=(n_free if has_const else None),
    )
    return pcfg, Mmap, n_params


def _pallas_kernel_launch(pcfg, Mmap, interpret, mesh=None):
    """The (optionally mesh-sharded) fused-kernel launch.

    With a mesh, the seed axis is sharded over its devices via shard_map:
    each device runs the SAME fused kernel on its local seed shard — the
    v5e-8 deployment shape of the bench sweep (embarrassingly parallel, no
    collectives; seeds must divide by the mesh size)."""
    from ..ops.pallas_lbfgs import pallas_lbfgs_sweep

    def launch(S, B, q, ne, th0):
        return pallas_lbfgs_sweep(pcfg, S, B, q, ne, th0, Mmap=Mmap,
                                  interpret=interpret)

    if mesh is None:
        # jit the whole launch: eager execution dispatches every padding /
        # block-diagonal expansion op in pallas_lbfgs_sweep separately —
        # ~2.5 s/launch of tunnel round-trips vs ~70 ms fused (round 5)
        return jax.jit(launch)
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return jax.jit(jax.shard_map(launch, mesh=mesh, in_specs=P(axis),
                                 out_specs=P(axis), check_vma=False))


def _pallas_lbfgs_sweep(cfg, Q, x, dx, truth, hp, seeds, k, interpret=False,
                        subsample_idx=None, mesh=None):
    """Fused-kernel sweep: per-seed normal-equation reduction on device, then
    one kernel launch for the whole protocol."""
    d, p = cfg.latent_dim, cfg.n_terms
    pcfg, Mmap, n_params = _pallas_setup(cfg, Q, hp)
    S, B, q, ne, th0 = _prep_normal_eq(cfg, k, n_params, x, dx,
                                       jnp.asarray(seeds), subsample_idx)
    launch = _pallas_kernel_launch(pcfg, Mmap, interpret, mesh)
    th, mask, _ = launch(S, B, q, ne, th0)
    Xi = (jnp.asarray(th) @ jnp.asarray(Mmap).T if Mmap is not None
          else jnp.asarray(th)).reshape(len(seeds), d, p)
    from ..utils.watchdog import beat

    beat()
    return _finalize(Xi, mask, truth)


def sweep_sindy_lbfgs_stacked(
    cfg: SINDyConfig,
    Q: Optional[np.ndarray],
    xs,   # sequence of L arrays (N, d) — e.g. one dataset per noise level
    dxs,  # sequence of L arrays (N, d)
    truth: np.ndarray,
    hp: LBFGSHParams,
    seeds: np.ndarray,
    lbfgs_subsample: float = 1.0,
    interpret: bool = False,
    mesh=None,
):
    """Datasets x seeds SINDy/EquivSINDy-c sweep in one device program.

    The dataset axis (e.g. noise level) becomes a second sweep axis of the
    fused Pallas kernel: L datasets x len(seeds) seeds = L*S independent
    L-BFGS protocols (BASELINE.md's "all noise levels" sweep). The kernel
    compiles once and is launched back-to-back per dataset — the L-BFGS
    curvature-history VMEM scratch is what bounds lanes per launch, and
    launches pipeline asynchronously, so this costs the same as one giant
    launch. Per-(dataset, seed) lanes use exactly the per-seed protocol of
    sweep_sindy_lbfgs (same PRNG fold-in), so each dataset's results are
    identical to running its own sweep. Returns a list of L SweepResult.

    mesh: optional seed-axis mesh — each per-dataset launch is shard_map-ed
    over it (the v5e-8 shape of the bench sweep; len(seeds) must divide).
    """
    d, p = cfg.latent_dim, cfg.n_terms
    pcfg, Mmap, n_params = _pallas_setup(cfg, Q, hp)
    seeds_j = jnp.asarray(seeds)
    n_seeds = len(seeds)
    launch = _pallas_kernel_launch(pcfg, Mmap, interpret, mesh)

    # The per-seed subsample draw depends only on (seed, N): when every
    # dataset has the same N (the bench's 11 noise levels do), the 2M-row
    # permutation sort — the most expensive prep op at ~0.5 s/level — is
    # computed ONCE and shared, with per-seed results identical to the
    # per-level recompute (same kperm fold-in; verified by test_sweep).
    ns = {int(x.shape[0]) for x in xs}
    shared_idx = None
    if len(ns) == 1:
        n = ns.pop()
        k = int(n * lbfgs_subsample)

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def _idx_rows(seeds, n, k):
            def one(seed):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
                kperm, _ = jax.random.split(key)
                return jax.random.permutation(kperm, n)[:k]
            return jax.vmap(one)(seeds)

        shared_idx = _idx_rows(seeds_j, n, k)

    # Per-dataset prep + launch, all async: one jitted prep program and one
    # compiled kernel, each dispatched L times with no host round-trips.
    ths, masks = [], []
    for x, dx in zip(xs, dxs):
        S, B, q, ne, th0 = _prep_normal_eq(
            cfg, int(x.shape[0] * lbfgs_subsample), n_params,
            jnp.asarray(x), jnp.asarray(dx), seeds_j, shared_idx)
        th, mask, _ = launch(S, B, q, ne, th0)
        ths.append(th)
        masks.append(mask)

    # Fused finalize: one jitted program over the stacked (L, seeds) results
    # and ONE device->host fetch, instead of 4 small fetches per level (each
    # a tunnel round-trip; dominated the wall clock under congestion).
    @jax.jit
    def _finalize_all(ths, masks):
        TH = jnp.stack(ths)            # (L, seeds, n_params)
        MKr = jnp.stack(masks)         # (L, seeds, d, p) — kernel pre-trims
        Xi = (TH @ jnp.asarray(Mmap).T if Mmap is not None else TH
              ).reshape(len(ths), n_seeds, d, p)
        cf, mse = jax.vmap(jax.vmap(
            lambda c, m: eval_coefficients_jnp(c, m, jnp.asarray(truth))))(Xi, MKr)
        return Xi, MKr, cf, mse

    Xi, MKr, cf, mse = jax.device_get(_finalize_all(ths, masks))
    return [SweepResult(Xi=Xi[i], mask=MKr[i], correct_form=cf[i], mse=mse[i])
            for i in range(len(ths))]


def sweep_sindy_stlsq(
    cfg: SINDyConfig,
    Q: Optional[np.ndarray],
    x: jnp.ndarray,
    dx: jnp.ndarray,
    truth: np.ndarray,
    seeds: np.ndarray,
    w_sindy_reg: float = 0.0,
    threshold: float = 5e-2,
    subsample: float = 1.0,
    max_iter: int = 5,
    n_mesh_devices: Optional[int] = None,
) -> SweepResult:
    """Direct STLSQ sweep (reference train_SINDy, train.py:872-887)."""
    n = x.shape[0]
    k = int(n * subsample)

    def run_one(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        kperm, kinit = jax.random.split(key)
        idx = jax.random.permutation(kperm, n)[:k]
        state = init_sindy(kinit, cfg, Q)
        state, _ = solve_sindy(cfg, state, x[idx], dx[idx], w_sindy_reg, threshold, max_iter)
        return get_Xi(cfg, state), state.mask

    Xi, mask = _maybe_shard(run_one, jnp.asarray(seeds), n_mesh_devices)
    return _finalize(Xi, mask, truth)


def sweep_wsindy(
    cfg: SINDyConfig,
    x_trajs: jnp.ndarray,  # (n_ics, n_steps, dim)
    dt: float,
    truth: np.ndarray,
    seeds: np.ndarray,
    w_sindy_reg: float = 0.0,
    threshold: float = 5e-2,
    num_epochs: int = 10,
    num_test_funcs: int = 50,
    n_mesh_devices: Optional[int] = None,
    subsample_rng: str = "jax",
) -> SweepResult:
    """WSINDy sweep: per seed a random trajectory + random 80% window
    (reference main_wsindy.py:33-43).

    subsample_rng: 'jax' (default, per-seed fold-in) or 'ref' — reproduce
    the reference's EXACT window draws: main_wsindy.py seeds the legacy
    numpy RandomState (np.random.seed(seed), main_wsindy.py:27) and draws
    start then trajectory with np.random.randint (main_wsindy.py:36-37);
    numpy's MT19937 here IS the reference's, so no instrumented run is
    needed — the draws are recomputed on the host."""
    n_ics, n_steps, _ = x_trajs.shape
    w = int(0.8 * n_steps)
    t = jnp.arange(w) * dt
    t_max = w * dt
    mats = make_wsindy_matrices(t, float(t_max), num_test_funcs=num_test_funcs)

    windows = None
    if subsample_rng == "ref":
        draws = []
        for s in np.asarray(seeds):
            rs = np.random.RandomState(int(s))
            draws.append((rs.randint(0, n_steps - w), rs.randint(0, n_ics)))
        windows = jnp.asarray(np.asarray(draws, np.int32))

    def run_one(seed, window=None):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k1, k2, k3 = jax.random.split(key, 3)
        if window is None:
            start = jax.random.randint(k1, (), 0, n_steps - w)
            traj_idx = jax.random.randint(k2, (), 0, n_ics)
        else:
            start, traj_idx = window[0], window[1]
        traj = jax.lax.dynamic_slice_in_dim(x_trajs[traj_idx], start, w, axis=0)
        state = init_sindy(k3, cfg)
        state, _ = solve_wsindy(cfg, state, mats, traj, w_sindy_reg, threshold, num_epochs)
        return get_Xi(cfg, state), state.mask

    if windows is not None:
        Xi, mask = jax.jit(jax.vmap(run_one))(jnp.asarray(seeds), windows)
    else:
        Xi, mask = _maybe_shard(run_one, jnp.asarray(seeds), n_mesh_devices)
    return _finalize(Xi, mask, truth)
