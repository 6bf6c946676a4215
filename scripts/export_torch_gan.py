"""Export a framework GAN checkpoint back to reference torch .pth files
(the inverse of scripts/port_torch_gan.py; porter module
s2i_tpu/port/stackgan_torch.py).

Writes ``netG.pth`` (and ``netD{64,128,256}.pth``) in the reference's
StackGAN-v2 state_dict layout so a generator trained HERE can be sampled,
evaluated, or finetuned by the reference's own torch tooling. ``netG`` is
the Polyak-averaged (EMA) copy by default — what the sampler serves — or
the raw trained weights with ``--raw``. Roundtrip and strict torch-load
equality tested in tests/test_port.py.

Usage:
  python scripts/export_torch_gan.py --cfg <run>/config.yml \\
      --ckpt <run>/ckpt --out <dir> [--raw]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from s2i_tpu import cli


def main() -> None:
    p = cli.base_parser(__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint directory")
    p.add_argument("--out", required=True, help="output directory (created)")
    p.add_argument(
        "--raw",
        action="store_true",
        help="export the raw trained G instead of the EMA (Polyak) copy",
    )
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)

    import jax
    import torch

    from s2i_tpu.data.synthetic import SyntheticSpeechDataset
    from s2i_tpu.port import export_dnet, export_gnet
    from s2i_tpu.train import gan
    from s2i_tpu.utils.checkpoint import CheckpointManager

    joint = bool(cfg.TRAIN.JOINT_FT)
    models = gan.build_models(cfg, joint=joint)
    top = 64 * 2 ** (int(cfg.TREE.BRANCH_NUM) - 1)
    batch = {"images": (np.zeros((2, top, top, 3), np.float32),)}
    if joint:
        sp = SyntheticSpeechDataset(
            num_classes=2,
            examples_per_class=2,
            max_frames=int(cfg.AUDIO.MAX_FRAMES),
            n_mels=int(cfg.AUDIO.N_MELS),
            emb_dim=int(cfg.TEXT.DIMENSION),
        )
        sb = sp.batch(np.arange(2))
        batch.update(feats=sb["feats"], feat_mask=sb["feat_mask"])
    template = gan.init_state(cfg, models, jax.random.key(0), batch)
    mgr = CheckpointManager(args.ckpt)
    restored = mgr.restore_latest(template)
    mgr.close()
    if restored is None:
        raise FileNotFoundError(f"{args.ckpt}: no checkpoint found")
    state, step = restored

    if args.raw or not state.ema_g:
        g_params = {"ca": state.g_params["ca"], "g": state.g_params["g"]}
        which = "raw"
    else:
        g_params = state.ema_g
        which = "ema"
    os.makedirs(args.out, exist_ok=True)
    sd = export_gnet(g_params, {"g": state.g_stats["g"]})
    netg = os.path.join(args.out, "netG.pth")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, netg)
    print(f"netG ({which}, step {step}, {len(sd)} tensors) -> {netg}")
    for i, (dp, ds) in enumerate(zip(state.d_params, state.d_stats)):
        scale = 64 * 2**i
        sd = export_dnet(dp, ds)
        path = os.path.join(args.out, f"netD{scale}.pth")
        torch.save(
            {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path
        )
        print(f"netD{scale} ({len(sd)} tensors) -> {path}")


if __name__ == "__main__":
    main()
