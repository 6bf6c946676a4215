"""Port reference torch GAN checkpoints (netG.pth, optional netD*.pth) into
a framework checkpoint (SURVEY.md §2 "Generator (multi-stage)" /
"Discriminators ×3"; porter: s2i_tpu/port/stackgan_torch.py).

The output directory holds a step-0 full-train-state checkpoint: sample from
it directly (``scripts/sample.py --set TRAIN.NET_G=<out>``), or warm-start a
training run (``main.py --set TRAIN.NET_G=<out>``; pass every per-scale netD
too if the run should continue the adversarial game rather than restart it
against fresh discriminators). Architecture hyperparameters (GF_DIM, Z_DIM,
EMBEDDING_DIM, TEXT.DIMENSION, BRANCH_NUM, R_NUM, DF_DIM) are inferred from
the checkpoint's tensor shapes and OVERRIDE the loaded cfg — the ported
weights define the model.

Ported checkpoints are the frozen-embedding mode (the reference's separate
speech-encoder checkpoint is not portable — its internals are [?]-tagged in
SURVEY.md §2; see docs/MIGRATION.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from s2i_tpu import cli


def main() -> None:
    p = cli.base_parser(__doc__)
    p.add_argument("--netg", required=True, help="reference netG .pth")
    p.add_argument(
        "--netd",
        nargs="*",
        default=[],
        help="per-scale netD .pth files (any order; scale is inferred)",
    )
    p.add_argument(
        "--out", required=True, help="output checkpoint directory (created)"
    )
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)

    import jax

    from s2i_tpu.port import (
        load_torch_state_dict,
        port_dnet,
        port_gnet,
    )
    from s2i_tpu.train import gan
    from s2i_tpu.utils.checkpoint import CheckpointManager
    from s2i_tpu import config

    g_params_sub, g_stats_sub, meta = port_gnet(
        load_torch_state_dict(args.netg)
    )
    print(f"netG: {args.netg} -> {meta}")
    cfg.GAN.GF_DIM = int(meta["gf_dim"])
    cfg.GAN.Z_DIM = int(meta["z_dim"])
    cfg.GAN.EMBEDDING_DIM = int(meta["c_dim"])
    cfg.TEXT.DIMENSION = int(meta["t_dim"])
    cfg.TREE.BRANCH_NUM = int(meta["branch_num"])
    if meta["r_num"] is not None:
        cfg.GAN.R_NUM = int(meta["r_num"])
    cfg.TRAIN.JOINT_FT = False

    ported_ds = {}
    for path in args.netd:
        params, stats, dmeta = port_dnet(load_torch_state_dict(path))
        print(f"netD: {path} -> {dmeta}")
        if dmeta["ef_dim"] != cfg.GAN.EMBEDDING_DIM:
            raise ValueError(
                f"{path}: condition dim {dmeta['ef_dim']} != netG's "
                f"{cfg.GAN.EMBEDDING_DIM}"
            )
        if dmeta["scale"] in ported_ds:
            raise ValueError(f"duplicate netD for scale {dmeta['scale']}")
        ported_ds[dmeta["scale"]] = (params, stats, dmeta)
    if ported_ds:
        df_dims = {m["df_dim"] for _, _, m in ported_ds.values()}
        if len(df_dims) > 1:
            raise ValueError(f"netDs disagree on df_dim: {sorted(df_dims)}")
        cfg.GAN.DF_DIM = int(df_dims.pop())

    models = gan.build_models(cfg)
    top = 64 * 2 ** (int(cfg.TREE.BRANCH_NUM) - 1)
    batch = {"images": (np.zeros((2, top, top, 3), np.float32),)}
    state = gan.init_state(
        cfg, models, jax.random.key(int(cfg.SEED)), batch
    )

    def swap(dst, src, what):
        if jax.tree.structure(dst) != jax.tree.structure(src):
            raise ValueError(
                f"{what}: ported tree does not match the model tree "
                "(architecture mismatch?)"
            )
        bad = [
            f"{jax.tree_util.keystr(p)}: {a.shape} vs {b.shape}"
            for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(src),
                jax.tree_util.tree_leaves_with_path(dst),
            )
            if a.shape != b.shape
        ]
        if bad:
            raise ValueError(f"{what}: shape mismatches: {bad[:5]}")
        return src

    g_params = dict(state.g_params)
    g_params["ca"] = swap(g_params["ca"], g_params_sub["ca"], "CA net")
    g_params["g"] = swap(g_params["g"], g_params_sub["g"], "netG params")
    g_stats = dict(state.g_stats)
    g_stats["g"] = swap(g_stats["g"], g_stats_sub["g"], "netG stats")
    d_params = list(state.d_params)
    d_stats = list(state.d_stats)
    for scale, (params, stats, _) in ported_ds.items():
        i = {64: 0, 128: 1, 256: 2}[scale]
        if i >= len(d_params):
            raise ValueError(
                f"netD{scale} has no slot at BRANCH_NUM={cfg.TREE.BRANCH_NUM}"
            )
        d_params[i] = swap(d_params[i], params, f"netD{scale} params")
        d_stats[i] = swap(d_stats[i], stats, f"netD{scale} stats")
    ema = state.ema_g
    if ema:
        ema = {
            "ca": jax.tree.map(np.copy, g_params["ca"]),
            "g": jax.tree.map(np.copy, g_params["g"]),
        }
    state = state.replace(
        g_params=g_params,
        g_stats=g_stats,
        d_params=type(state.d_params)(d_params),
        d_stats=type(state.d_stats)(d_stats),
        ema_g=ema,
    )

    os.makedirs(args.out, exist_ok=True)
    mgr = CheckpointManager(args.out)
    mgr.save(0, state, force=True)
    mgr.wait()
    mgr.close()
    config.dump_cfg(cfg, os.path.join(args.out, "ported_config.yml"))
    missing = [s for s in (64, 128, 256)[: len(d_params)] if s not in ported_ds]
    note = (
        f" (fresh-init Ds at scales {missing}; fine for sampling)"
        if missing
        else ""
    )
    print(f"ported checkpoint written to {args.out} at step 0{note}")
    print(
        f"sample: python scripts/sample.py --cfg "
        f"{os.path.join(args.out, 'ported_config.yml')} "
        f"--set TRAIN.NET_G={args.out}"
    )


if __name__ == "__main__":
    main()
