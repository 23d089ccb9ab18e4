"""Cross-framework loss parity for the LV isymreg protocol.

The reference's EquivSINDy-r L-BFGS fit is too expensive to replicate
statistically on a 1-CPU box (measured >= 2 min/epoch in torch -> >3.5 h per
seed, see PARITY.md), so the cross-check is semantic instead of statistical:
convert our LaLiGAN checkpoint to the reference's torch state dicts
(tools/convert_ckpt_to_ref.py), then evaluate the reference's ACTUAL closure
loss (reference train.py:617-690: MSE + w_sym_reg * symmreg_i with the Euler
rollout, model_utils.py:8-67) and our fast-path loss on identical (x, dx, Xi).
Measured agreement: penalty rel diff 9e-8, MSE rel diff 1e-7 (PARITY.md).

Usage (requires /tmp/refrun — a copy of the reference + wandb stub — and a
trained saved_models/laligan-noise99-lv):
    python tools/ref_parity_isymreg.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFRUN = os.environ.get("SODT_REFRUN", "/tmp/refrun")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast

    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=512,
                            latent_dim=2, n_layers=5, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    params, bstats = ae_def.init(jax.random.PRNGKey(0))
    spec = lg.parse_repr("(2,1,2)", "0")
    g0 = lg.init_generator(jax.random.PRNGKey(1), spec)
    bundle = {"ae": params, "d": {}, "g": g0}
    bundle, bstats = ckpt.load_laligan("laligan-noise99-lv", bundle, bstats)

    cfg, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    rng = np.random.default_rng(3)
    x = np.load(f"{REPO}/data/lv-train-noise99-gp-x.npy").reshape(-1, 2)
    dx = np.load(f"{REPO}/data/lv-train-noise99-gp-dx.npy").reshape(-1, 2)
    idx = rng.choice(len(x), 2000, replace=False)
    xs, dxs = x[idx].astype(np.float32), dx[idx].astype(np.float32)
    Xi = (0.1 * rng.standard_normal((2, cfg.n_terms))).astype(np.float32)

    prep, pen = make_symmreg_i_fast(ae_def, bundle["ae"], bstats, spec,
                                    bundle["g"], 0.1, 0.01)
    ctx = prep(jnp.asarray(xs))
    fwd = lambda q: cfg.library(q) @ jnp.asarray(Xi).T
    mse_ours = float(jnp.mean((fwd(jnp.asarray(xs)) - dxs) ** 2))
    pen_ours = float(pen(fwd, jnp.asarray(xs), ctx))

    os.chdir(REFRUN)
    sys.path.insert(0, REFRUN)
    from autoencoder import AutoEncoder
    from gan import LieGenerator
    from sindy import SINDyRegression
    from train import make_symmreg_pttrain
    from model_utils import odeint as ref_odeint

    ae = AutoEncoder(ae_arch="mlp", input_dim=2, hidden_dim=512, latent_dim=2,
                     n_layers=5, n_comps=2, activation="ReLU",
                     activation_args=[], batch_norm=True, ortho_ae=True,
                     device="cpu")
    ae.load_state_dict(torch.load("saved_models/laligan-noise99-lv/autoencoder.pt"))
    ae.device = "cpu"
    gen = LieGenerator(repr="(2,1,2)", group_idx="0", coef_dist="normal",
                       sigma_init=1.0, uniform_max=1.0, int_param=False,
                       int_param_max=2, int_param_noise=0.1, gan_st_thres=0.3,
                       keep_center=False, latent_dim=2, n_comps=2,
                       device="cpu", g_init="random", task="lv")
    sd = torch.load("saved_models/laligan-noise99-lv/generator.pt")
    for k, v in gen.state_dict().items():
        sd.setdefault(k, v)
    gen.load_state_dict(sd)
    gen.masks = torch.load("saved_models/laligan-noise99-lv/generator_mask.pt")
    reg = SINDyRegression(latent_dim=2, poly_order=2, include_sine=False,
                          include_exp=True, device="cpu", threshold=0.15,
                          constrain_constant=False)
    with torch.no_grad():
        reg.Xi.copy_(torch.from_numpy(Xi))
    ae.eval()
    gen.eval()
    xt, dxt = torch.from_numpy(xs), torch.from_numpy(dxs)
    symm_loss = make_symmreg_pttrain(ae, gen)

    def forward_step(q):
        return ref_odeint(reg, q, 0.1, 0.01)

    fx = forward_step(xt)
    pen_ref = float(symm_loss(torch.stack([xt, fx], dim=1), f=forward_step))
    mse_ref = float(torch.nn.functional.mse_loss(reg(xt), dxt))
    rel_p = abs(pen_ours - pen_ref) / max(pen_ours, 1e-12)
    rel_m = abs(mse_ours - mse_ref) / max(mse_ours, 1e-12)
    print(f"mse  ours {mse_ours:.6f}  ref {mse_ref:.6f}  rel {rel_m:.2e}")
    print(f"pen  ours {pen_ours:.6f}  ref {pen_ref:.6f}  rel {rel_p:.2e}")
    assert rel_p < 1e-5 and rel_m < 1e-5
    print("PARITY OK")


if __name__ == "__main__":
    main()
