"""Dataset classes + task dispatch: load-or-generate cached trajectories.

Counterpart of reference dataset.py. Same surface:
- `get_dataset(args)` dispatches on args['task'] and injects input_dim /
  mt_data / flatten (reference dataset.py:16-58);
- `ODEDataset` caches per-(system, mode, noise, smoothing) arrays under
  DATA_PATH with the reference's file-stem convention
  `{name}-{mode}-noise{int(100*noise):02d}[-smoothing]` (dataset.py:176-186)
  but as .npy (no torch dependency on the load path);
- `MTODEDataset` exposes strided multi-timestep windows (dataset.py:203-244)
  — materialized with numpy stride tricks, not a Python loop;
- `ReactionDiffusionDataset` reads the SINDy-AE reaction_diffusion.mat
  (dataset.py:60-114) and, when the .mat is absent, regenerates the same
  lambda-omega system natively (rd_solver.py);
- `SimpleLinear` synthetic sanity dataset (dataset.py:316-340);
- `ode_dt_dict`: effective sample spacing of the cached datasets
  (dataset.py:161-167).
"""

from __future__ import annotations

import os

import numpy as np

from .systems import SYSTEMS

__all__ = [
    "DATA_PATH", "ode_dt_dict", "get_dataset", "ODEDataset", "MTODEDataset",
    "ReactionDiffusionDataset", "MultiTimestepReactionDiffusionDataset",
    "SimpleLinear",
]

DATA_PATH = os.environ.get("SODT_DATA_PATH", "./data")

# effective dt of cached data = default_dt * default_subsample_rate
# (reference dataset.py:161-167, verbatim)
ode_dt_dict = {
    "lv": 0.002,
    "selkov": 0.002,
    "dosc": 0.2,
    "growth": 0.02,
    "rd": 0.05,
}


def _cache_stem(name: str, mode: str, noise: float, smoothing) -> str:
    s = f"-{smoothing}" if smoothing is not None else ""
    return f"{name}-{mode}-noise{int(100 * noise):02d}{s}"


def load_or_generate(name: str, mode: str, noise: float = 0.0, smoothing=None,
                     path: str = None, n_ics: int = None):
    """Return (x, dx) of shape (n_ics, n_steps, dim) from the .npy cache,
    generating (and caching) with the system's reference protocol on miss
    (reference dataset.py:174-186)."""
    import jax
    import jax.numpy as jnp

    path = DATA_PATH if path is None else path
    stem = os.path.join(path, _cache_stem(name, mode, noise, smoothing))
    try:
        x = np.load(f"{stem}-x.npy")
        dx = np.load(f"{stem}-dx.npy")
        return jnp.asarray(x), jnp.asarray(dx)
    except FileNotFoundError:
        pass

    xd = _load_pt_cache(stem)
    if xd is not None:
        return jnp.asarray(xd[0]), jnp.asarray(xd[1])

    from .generate import gen_data

    system = SYSTEMS[name]
    if n_ics is None:
        n_ics = default_n_ics(system, mode)
    print(f"Generating {name} {mode} data (noise={noise}, smoothing={smoothing})...")
    x, dx = gen_data(system, cache_prng_key(mode, noise), n_ics=n_ics,
                     noise=noise,
                     multiplicative_noise=system.multiplicative_noise,
                     smoothing=smoothing)
    save_cache(stem, x, dx)
    return x, dx


def _load_pt_cache(stem: str):
    """Read the reference's torch cache files ({stem}-{x,dx}.pt, written by
    its data_utils CLIs, e.g. data_utils/lotka.py:45-64) so a user switching
    from the PyTorch codebase reuses existing datasets without regeneration.
    Returns (x, dx) float32 numpy arrays, or None when absent/unreadable."""
    if not (os.path.exists(f"{stem}-x.pt") and os.path.exists(f"{stem}-dx.pt")):
        return None
    try:
        import torch
    except ImportError:
        return None
    out = []
    for part in ("x", "dx"):
        try:
            t = torch.load(f"{stem}-{part}.pt", map_location="cpu",
                           weights_only=True)
        except Exception:  # truncated/corrupt cache: fall back to regeneration
            return None
        out.append(np.asarray(t.detach().numpy(), np.float32))
    return tuple(out)


def cache_prng_key(mode: str, noise: float):
    """The PRNG key of a cached dataset draw — ONE recipe shared by the
    loader's cache-miss regeneration and the data/gen.py CLI, so CLI-written
    caches are always the same draw a cache miss would produce."""
    import jax  # lazy, like the rest of this module

    return jax.random.fold_in(
        jax.random.PRNGKey(0 if "train" in mode else 1), int(100 * noise))


def default_n_ics(system, mode: str) -> int:
    return system.default_n_train if "train" in mode else system.default_n_val


def save_cache(stem: str, x, dx) -> None:
    os.makedirs(os.path.dirname(stem) or ".", exist_ok=True)
    np.save(f"{stem}-x.npy", np.asarray(x, np.float32))
    np.save(f"{stem}-dx.npy", np.asarray(dx, np.float32))


class ODEDataset:
    """Flattened (n_ics * n_steps, dim) samples of one cached system
    (reference dataset.py:170-200)."""

    def __init__(self, x, dx):
        import jax.numpy as jnp

        x = jnp.asarray(x, jnp.float32)
        dx = jnp.asarray(dx, jnp.float32)
        self.n_ics, self.n_steps, self.input_dim = x.shape
        self.trajs_x, self.trajs_dx = x, dx
        self.x = x.reshape(-1, self.input_dim)
        self.dx = dx.reshape(-1, self.input_dim)

    @classmethod
    def make(cls, name: str, mode: str = "train", noise: float = 0.0,
             smoothing=None, path: str = None, n_ics: int = None):
        return cls(*load_or_generate(name, mode, noise, smoothing, path, n_ics))

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        return self.x[idx], self.dx[idx]


class MTODEDataset(ODEDataset):
    """Multi-timestep windows x[i, j : j + n_timesteps*interval : interval]
    (reference dataset.py:203-244). The reference materializes ~2M windows in
    a Python double loop; here `materialize()` is two numpy stride-trick views
    + one copy (measured 0.28 s for the LV train split)."""

    def __init__(self, x, dx, n_timesteps: int = 2, interval: int = 10):
        super().__init__(x, dx)
        if n_timesteps < 2:
            raise ValueError("n_timesteps must be greater than 1")
        self.n_timesteps = n_timesteps
        self.interval = interval
        # reference window count: n_steps - n_timesteps*interval per IC
        self.n_windows = self.n_steps - n_timesteps * interval
        self._windows = None

    @classmethod
    def make(cls, name: str, mode: str = "train", noise: float = 0.0,
             smoothing=None, path: str = None, n_ics: int = None,
             n_timesteps: int = 2, interval: int = 10):
        x, dx = load_or_generate(name, mode, noise, smoothing, path, n_ics)
        return cls(x, dx, n_timesteps=n_timesteps, interval=interval)

    def _window_view(self, a: np.ndarray) -> np.ndarray:
        n_ics, n_steps, d = a.shape
        s0, s1, s2 = a.strides
        shape = (n_ics, self.n_windows, self.n_timesteps, d)
        strides = (s0, s1, s1 * self.interval, s2)
        view = np.lib.stride_tricks.as_strided(a, shape=shape, strides=strides)
        return view.reshape(n_ics * self.n_windows, self.n_timesteps, d)

    def materialize(self):
        """(x, dx) window arrays, shape (n_ics*n_windows, n_timesteps, dim)."""
        if self._windows is None:
            import jax.numpy as jnp

            xw = self._window_view(np.asarray(self.trajs_x))
            dxw = self._window_view(np.asarray(self.trajs_dx))
            self._windows = (jnp.asarray(xw), jnp.asarray(dxw))
        return self._windows

    def __len__(self):
        return self.n_ics * self.n_windows

    def __getitem__(self, idx):
        xw, dxw = self.materialize()
        return xw[idx], dxw[idx]


def _rd_split(n_samples: int, mode: str) -> np.ndarray:
    """Consecutive 80/10/10 split over time samples (dataset.py:76-89)."""
    if mode == "train":
        return np.arange(int(0.8 * n_samples))
    if mode == "val":
        return np.arange(int(0.8 * n_samples), int(0.9 * n_samples))
    if mode == "test":
        return np.arange(int(0.9 * n_samples), n_samples)
    raise ValueError(f"unknown RD split mode {mode!r}")


def _load_rd(path=None):
    """Load (or natively regenerate) the SINDy-AE reaction-diffusion data."""
    import scipy.io as sio

    path = os.path.join(DATA_PATH, "reaction_diffusion.mat") if path is None else path
    if not os.path.exists(path):
        from .rd_solver import generate_rd_mat

        print("reaction_diffusion.mat absent; regenerating natively "
              "(data/rd_solver.py)...")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        generate_rd_mat(path)
    return sio.loadmat(path)


def _rd_snapshots(data: dict, mode: str):
    """Shared RD preamble: 1e-6 jitter (reference dataset.py:66-67, fixed
    rng), consecutive split, (n_sel, N) time-major snapshot matrices.
    Returns (xs, dxs, samples, N)."""
    n_samples = data["t"].size
    n = data["x"].size
    N = n * n
    rng = np.random.default_rng(0)
    uf = data["uf"] + 1e-6 * rng.standard_normal(data["uf"].shape)
    duf = data["duf"] + 1e-6 * rng.standard_normal(data["duf"].shape)
    samples = _rd_split(n_samples, mode)
    xs = uf[:, :, samples].reshape(N, -1).T
    dxs = duf[:, :, samples].reshape(N, -1).T
    return xs, dxs, samples, N


class ReactionDiffusionDataset:
    """Per-snapshot RD samples: x = uf fields flattened over the grid
    (reference dataset.py:60-114)."""

    def __init__(self, data: dict, mode: str = "train"):
        import jax.numpy as jnp

        xs, dxs, samples, N = _rd_snapshots(data, mode)
        self.t = data["t"].reshape(-1)[samples]
        self.y1 = data["x"].reshape(-1)
        self.y2 = data["y"].reshape(-1)
        self.x = jnp.asarray(xs, jnp.float32)
        self.dx = jnp.asarray(dxs, jnp.float32)
        self.input_dim = N

    @classmethod
    def make(cls, mode: str = "train", path: str = None):
        return cls(_load_rd(path), mode=mode)

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        return self.x[idx], self.dx[idx], self.dx[idx]


class MultiTimestepReactionDiffusionDataset:
    """Windows of n_timesteps consecutive RD snapshots
    (reference dataset.py:116-159)."""

    def __init__(self, data: dict, mode: str = "train", n_timesteps: int = 2):
        import jax.numpy as jnp

        xs, dxs, samples, N = _rd_snapshots(data, mode)
        self.n_timesteps = n_timesteps
        # reference windows: samples[i-n_timesteps:i] for i in [n_timesteps, len)
        idx = np.arange(n_timesteps, len(samples))
        win = np.stack([xs[i - n_timesteps:i] for i in idx])
        dwin = np.stack([dxs[i - n_timesteps:i] for i in idx])
        self.x = jnp.asarray(win, jnp.float32)     # (W, n_timesteps, N)
        self.dx = jnp.asarray(dwin, jnp.float32)
        self.input_dim = N

    @classmethod
    def make(cls, mode: str = "train", path: str = None, n_timesteps: int = 2):
        return cls(_load_rd(path), mode=mode, n_timesteps=n_timesteps)

    def materialize(self):
        return self.x, self.dx

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        return self.x[idx], self.dx[idx]


class SimpleLinear:
    """dx = coeff @ x with tiny observation noise (reference dataset.py:316-340)."""

    def __init__(self, n_samples: int, coeff=None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        coeff = jnp.eye(2) if coeff is None else jnp.asarray(coeff, jnp.float32)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.x = jax.random.normal(k1, (n_samples, 2)) * 10.0
        self.dx = self.x @ coeff.T
        self.x = self.x + 1e-3 * jax.random.normal(k2, self.x.shape)
        self.dx = self.dx + 1e-3 * jax.random.normal(k3, self.dx.shape)
        self.input_dim = 2

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        return self.x[idx], self.dx[idx]


def get_dataset(args: dict):
    """Task dispatch (reference dataset.py:16-58). Mutates and returns args
    with input_dim (+ mt_data / flatten where applicable)."""
    task = args["task"]
    noise = args.get("noise", 0.0)
    smoothing = args.get("smoothing")

    if task == "rd":
        train_ds = ReactionDiffusionDataset.make(mode="train")
        val_ds = ReactionDiffusionDataset.make(mode="val")
        args["flatten"] = False
    elif task == "mt_rd":
        train_ds = MultiTimestepReactionDiffusionDataset.make(mode="train")
        val_ds = MultiTimestepReactionDiffusionDataset.make(mode="val")
        args["mt_data"] = True
    elif task.startswith("mt_"):
        name = task[3:]
        if name not in SYSTEMS:
            raise NotImplementedError(f"unknown task {task!r}")
        # mt_selkov uses interval 50 (reference dataset.py:41-44); others 10
        interval = 50 if name == "selkov" else 10
        train_ds = MTODEDataset.make(name, "train", noise, smoothing,
                                     interval=interval)
        val_ds = MTODEDataset.make(name, "val", noise, smoothing,
                                   interval=interval)
        args["mt_data"] = True
    elif task in SYSTEMS:
        train_ds = ODEDataset.make(task, "train", noise, smoothing)
        val_ds = ODEDataset.make(task, "val", noise, smoothing)
    else:
        raise NotImplementedError(f"unknown task {task!r}")

    args["input_dim"] = train_ds.input_dim
    return train_ds, val_ds, args
