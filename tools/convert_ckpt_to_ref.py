"""Convert the TPU framework's LaLiGAN npz checkpoint into the reference's
torch state dicts, so the reference isymreg/symreg pipelines can be cross-run
with the IDENTICAL learned symmetry.

Usage: python convert_ckpt.py <src_npz_dir> <dst_save_dir_name> --task lv
"""

import argparse
import sys

import numpy as np
import torch

sys.path.insert(0, "/tmp/refrun")


def load_npz(path):
    d = np.load(path)
    return {k: d[k] for k in d.keys()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--hidden_dim", type=int, default=512)
    ap.add_argument("--n_layers", type=int, default=5)
    ap.add_argument("--latent_dim", type=int, default=2)
    ap.add_argument("--input_dim", type=int, default=2)
    ap.add_argument("--n_comps", type=int, default=2)
    ap.add_argument("--repr", default="(2,1,2)")
    ap.add_argument("--group_idx", default="0")
    args = ap.parse_args()

    from autoencoder import AutoEncoder
    from gan import LieGenerator

    kw = dict(ae_arch="mlp", input_dim=args.input_dim, hidden_dim=args.hidden_dim,
              latent_dim=args.latent_dim, n_layers=args.n_layers,
              n_comps=args.n_comps, activation="ReLU", activation_args=[],
              batch_norm=True, ortho_ae=True, device="cpu")
    ae = AutoEncoder(**kw)
    d = load_npz(f"{args.src}/autoencoder.npz")

    def P(name):
        return torch.from_numpy(np.asarray(d[name], np.float32))

    def enc_key(fmt, i):
        return fmt.format(i)

    with torch.no_grad():
        # encoder: seq idx 0 = Linear0; 2 = BN0; hidden blocks 5..(5+n_layers-2)
        # are Sequential(Linear@0, BN@2); 9 = ortho Linear; 11 = bn_final
        def eset(idx, sub, t):
            mods = dict(ae.encoder.named_modules())
            m = mods[f"{idx}.{sub}"] if sub else mods[str(idx)]
            return m

        e = "['params']/['encoder']/['{}']/['{}']"
        bs = "['batch_stats']/['encoder']/['{}']/['{}']"
        lin0 = ae.encoder[0]
        lin0.weight.copy_(P(e.format("Dense_0", "kernel")).T)
        lin0.bias.copy_(P(e.format("Dense_0", "bias")))
        bn0 = ae.encoder[2]
        bn0.weight.copy_(P(e.format("BatchNorm_0", "scale")))
        bn0.bias.copy_(P(e.format("BatchNorm_0", "bias")))
        bn0.running_mean.copy_(P(bs.format("BatchNorm_0", "mean")))
        bn0.running_var.copy_(P(bs.format("BatchNorm_0", "var")))
        for i in range(1, args.n_layers):
            blk = ae.encoder[4 + i]
            blk[0].weight.copy_(P(e.format(f"Dense_{i}", "kernel")).T)
            blk[0].bias.copy_(P(e.format(f"Dense_{i}", "bias")))
            blk[2].weight.copy_(P(e.format(f"BatchNorm_{i}", "scale")))
            blk[2].bias.copy_(P(e.format(f"BatchNorm_{i}", "bias")))
            blk[2].running_mean.copy_(P(bs.format(f"BatchNorm_{i}", "mean")))
            blk[2].running_var.copy_(P(bs.format(f"BatchNorm_{i}", "var")))
        # orthogonal final layer: weight assignment routes through
        # right_inverse of the parametrization
        V = np.asarray(d[e.format("OrthoDense_0", "V")], np.float32)  # (hid, lat)
        Q, R = np.linalg.qr(V)
        Q = Q * np.sign(np.diag(R))[None, :]
        idx_ortho = 4 + args.n_layers
        ae.encoder[idx_ortho].weight = torch.from_numpy(Q.T.copy())
        ae.encoder[idx_ortho].bias.copy_(P(e.format("OrthoDense_0", "bias")))
        bnf = ae.encoder[idx_ortho + 2]
        bnf.weight.copy_(P(e.format("bn_final", "scale")))
        bnf.bias.copy_(P(e.format("bn_final", "bias")))
        bnf.running_mean.copy_(P(bs.format("bn_final", "mean")))
        bnf.running_var.copy_(P(bs.format("bn_final", "var")))

        # decoder: 0 Linear, blocks 2..(n_layers), final Linear
        dd = "['params']/['decoder']/['{}']/['{}']"
        ae.decoder[0].weight.copy_(P(dd.format("Dense_0", "kernel")).T)
        ae.decoder[0].bias.copy_(P(dd.format("Dense_0", "bias")))
        for i in range(1, args.n_layers):
            blk = ae.decoder[1 + i]
            blk[0].weight.copy_(P(dd.format(f"Dense_{i}", "kernel")).T)
            blk[0].bias.copy_(P(dd.format(f"Dense_{i}", "bias")))
        ae.decoder[1 + args.n_layers].weight.copy_(
            P(dd.format(f"Dense_{args.n_layers}", "kernel")).T)
        ae.decoder[1 + args.n_layers].bias.copy_(
            P(dd.format(f"Dense_{args.n_layers}", "bias")))

    gkw = dict(repr=args.repr, group_idx=args.group_idx, coef_dist="normal",
               sigma_init=1.0, uniform_max=1.0, int_param=False,
               int_param_max=2, int_param_noise=0.1, gan_st_thres=0.3,
               keep_center=False, latent_dim=args.latent_dim,
               n_comps=args.n_comps, device="cpu", g_init="random", task="lv")
    gen = LieGenerator(**gkw)
    g = load_npz(f"{args.src}/generator.npz")
    m = load_npz(f"{args.src}/generator_mask.npz")
    with torch.no_grad():
        Li = torch.from_numpy(np.asarray(g["['Li']/[0]"], np.float32))
        if Li.shape != gen.Li[0].shape:
            Li = Li.reshape(gen.Li[0].shape)
        gen.Li[0].copy_(Li)
    masks = [torch.from_numpy(np.asarray(m["[0]"], np.float32))]

    import os

    out = f"saved_models/{args.dst}"
    os.makedirs(out, exist_ok=True)
    torch.save(ae.state_dict(), f"{out}/autoencoder.pt")
    torch.save(gen.state_dict(), f"{out}/generator.pt")
    torch.save(masks, f"{out}/generator_mask.pt")
    print(f"wrote {out}/{{autoencoder,generator,generator_mask}}.pt")

    # sanity: encoder forward parity on random input
    x = torch.randn(8, args.n_comps, args.input_dim)
    ae.eval()
    z = ae.encode(x)
    print("encode sample:", z.reshape(8, -1)[0].tolist())


if __name__ == "__main__":
    main()
