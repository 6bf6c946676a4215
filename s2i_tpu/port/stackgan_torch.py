"""Port reference torch GAN checkpoints (``netG.pth`` / ``netD{64,128,256}
.pth``) into the Flax parameter/stat trees of :mod:`s2i_tpu.models`.

The reference generator/discriminators are the StackGAN-v2 lineage topology
(SURVEY.md §2 rows "Generator (multi-stage)" / "Discriminators ×3", both
[K]-tagged), whose torch module naming is public and stable:

  G:  ca_net.fc.{weight,bias}
      h_net1.fc.{0,1}.*, h_net1.upsample{1..4}.{1,2}.*
      h_net{2,3}.jointConv.{0,1}.*, .residual.{i}.block.{0,1,3,4}.*,
      .upsample.{1,2}.*
      img_net{1,2,3}.img.0.weight
  D:  img_code_s16.{0,2,3,5,6,8,9}.*, img_code_s32[.0/.1], img_code_s32_1,
      img_code_s64, img_code_s64_{1,2},
      logits.jointConv.{0,1}.*, logits.outlogits.0.*,
      uncond_logits.outlogits.0.*

Cross-validated end-to-end against a torch reference implementation of that
topology (tests/_torch_stackgan.py, tests/test_port.py): ported eval-mode
outputs match torch at every scale, including running BN statistics.

Layout transforms performed (torch → here):
  - conv weights [O,I,kh,kw] → NHWC HWIO [kh,kw,I,O]
  - linear weights [O,I] → [I,O]
  - the init stage's fc output is viewed (C,4,4) by torch but (4,4,C) here:
    the fc kernel's output columns and the following BatchNorm1d vectors are
    permuted accordingly (per GLU half)
  - concat-order fixups: torch concatenates (c, z) into the init fc and
    (c, h) into each next-stage joint conv; this framework uses (z, c) and
    (h, c), so the corresponding kernel input rows/channels are permuted.
    D heads concatenate (code, c) in both.

If a checkpoint deviates from this naming (a fork, renamed modules), the
porter raises listing every unmatched key rather than silently dropping
weights.

Out of scope: the reference *speech encoder* checkpoint — SURVEY.md tags its
internal architecture [?] (exact conv stack unknown), so no faithful porter
can be written offline; retrain via scripts/pretrain_encoder.py instead
(docs/MIGRATION.md).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "port_gnet",
    "port_dnet",
    "port_dnet_scale",
    "export_gnet",
    "export_dnet",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def load_torch_state_dict(path: str) -> dict:
    """``torch.load`` a checkpoint and normalize it to a flat state_dict:
    unwraps a ``{'state_dict': ...}`` container and strips the ``module.``
    prefix ``nn.DataParallel`` (the reference's multi-GPU wrapper) adds."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in obj.items()
    }


class _Taker:
    """Tracks consumed keys so naming drift fails loudly, not silently."""

    def __init__(self, sd: dict):
        self.sd = {k: v for k, v in sd.items()}
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"checkpoint is missing {key!r} — not a StackGAN-v2-layout "
                "state_dict? (see s2i_tpu/port/stackgan_torch.py docstring)"
            )
        self.used.add(key)
        return _np(self.sd[key])

    def finish(self, what: str) -> None:
        leftovers = [
            k
            for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]
        if leftovers:
            shown = sorted(leftovers)[:8]
            more = ", ..." if len(leftovers) > len(shown) else ""
            raise ValueError(
                f"{what}: {len(leftovers)} unrecognized checkpoint keys "
                f"(naming drift?): {shown}{more}"
            )


def _conv(t: _Taker, key: str) -> np.ndarray:
    return t.take(key).transpose(2, 3, 1, 0)  # [O,I,kh,kw] -> [kh,kw,I,O]


def _bn(t: _Taker, prefix: str) -> tuple[dict, dict]:
    params = {"scale": t.take(f"{prefix}.weight"), "bias": t.take(f"{prefix}.bias")}
    stats = {
        "mean": t.take(f"{prefix}.running_mean"),
        "var": t.take(f"{prefix}.running_var"),
    }
    return params, stats


def _bn_block(t: _Taker, prefix: str) -> tuple[dict, dict]:
    """Our BatchNorm wrapper nests GroupedBatchNorm as BatchNorm_0."""
    p, s = _bn(t, prefix)
    return {"BatchNorm_0": p}, {"BatchNorm_0": s}


def _upblock(t: _Taker, prefix: str) -> tuple[dict, dict]:
    """torch upBlock = Sequential(Upsample, conv3x3, BN, GLU) → UpBlockGLU."""
    bn_p, bn_s = _bn_block(t, f"{prefix}.2")
    params = {
        "UpConv3x3_0": {"kernel": _conv(t, f"{prefix}.1.weight")},
        "BatchNorm_0": bn_p,
    }
    return params, {"BatchNorm_0": bn_s}


def _conv3x3_block(t: _Taker, conv_key: str, bn_prefix: str) -> tuple[dict, dict]:
    """torch Sequential(conv3x3, BN, act) → {Conv3x3_0, BatchNorm_0} blocks
    (Block3x3GLU / Block3x3LeakyReLU both use this tree shape)."""
    bn_p, bn_s = _bn_block(t, bn_prefix)
    params = {
        "Conv3x3_0": {"Conv_0": {"kernel": _conv(t, conv_key)}},
        "BatchNorm_0": bn_p,
    }
    return params, {"BatchNorm_0": bn_s}


def _swap_in_channels(k: np.ndarray, n_first_torch: int) -> np.ndarray:
    """Move the torch-leading ``n_first_torch`` input channels to the end:
    torch concatenated (c, h); this framework concatenates (h, c)."""
    return np.concatenate(
        [k[:, :, n_first_torch:, :], k[:, :, :n_first_torch, :]], axis=2
    )


def port_gnet(sd: dict) -> tuple[dict, dict, dict]:
    """Port a reference ``netG`` state_dict.

    Returns ``(g_params, g_stats, meta)`` where ``g_params`` is the
    ``{'ca': ..., 'g': ...}`` subtree of ``GanTrainState.g_params``,
    ``g_stats`` the ``{'g': ...}`` subtree of ``g_stats``, and ``meta`` the
    architecture dims inferred from the tensor shapes (validate them against
    the target cfg: GAN.GF_DIM, GAN.Z_DIM, GAN.EMBEDDING_DIM,
    TEXT.DIMENSION, TREE.BRANCH_NUM, GAN.R_NUM)."""
    t = _Taker(sd)

    # --- dims from shapes ---
    fc_w = t.take("h_net1.fc.0.weight")  # [ngf16*32, c_dim + z_dim]
    ca_w = t.take("ca_net.fc.weight")  # [4*c_dim, t_dim]
    n_out = fc_w.shape[0]
    ngf16 = n_out // 32  # ngf16 = 16*GF_DIM; fc emits ngf16*4*4*2
    c_dim = ca_w.shape[0] // 4
    z_dim = fc_w.shape[1] - c_dim
    branch_num = 1 + sum(f"h_net{i}.jointConv.0.weight" in sd for i in (2, 3))
    r_num = sum(
        k.startswith("h_net2.residual.") and k.endswith(".block.0.weight")
        for k in sd
    )
    meta = {
        "gf_dim": ngf16 // 16,
        "z_dim": z_dim,
        "c_dim": c_dim,
        "t_dim": ca_w.shape[1],
        "branch_num": branch_num,
        "r_num": r_num if branch_num > 1 else None,
    }

    # --- CA net ---
    ca_params = {
        "Dense_0": {"kernel": ca_w.T.copy(), "bias": t.take("ca_net.fc.bias")}
    }

    # --- init stage fc: input rows (c,z)→(z,c); output columns and the
    # BatchNorm1d vectors get the (C,4,4)→(4,4,C) view permutation, applied
    # per GLU half (the split point is the midpoint on both sides) ---
    perm_in = np.concatenate([np.arange(c_dim, c_dim + z_dim), np.arange(c_dim)])
    half = n_out // 2
    f = np.arange(half)
    perm_half = (f % ngf16) * 16 + (f // ngf16)  # ours[f'] = torch[c*16+s]
    perm_out = np.concatenate([perm_half, perm_half + half])
    dense_kernel = fc_w.T[perm_in][:, perm_out].copy()
    bn1_p, bn1_s = _bn(t, "h_net1.fc.1")
    bn1_p = {k: v[perm_out] for k, v in bn1_p.items()}
    bn1_s = {k: v[perm_out] for k, v in bn1_s.items()}

    init_params: dict[str, Any] = {
        "Dense_0": {"kernel": dense_kernel},
        "BatchNorm_0": {"BatchNorm_0": bn1_p},
    }
    init_stats: dict[str, Any] = {"BatchNorm_0": {"BatchNorm_0": bn1_s}}
    for i in range(4):
        p, s = _upblock(t, f"h_net1.upsample{i + 1}")
        init_params[f"UpBlockGLU_{i}"] = p
        init_stats[f"UpBlockGLU_{i}"] = s

    g_params: dict[str, Any] = {"init": init_params}
    g_stats: dict[str, Any] = {"init": init_stats}

    # --- next stages ---
    for i in range(1, branch_num):
        tp = f"h_net{i + 1}"
        jp, js = _conv3x3_block(t, f"{tp}.jointConv.0.weight", f"{tp}.jointConv.1")
        # torch concatenated (c, h); we concatenate (h, c)
        jp["Conv3x3_0"]["Conv_0"]["kernel"] = _swap_in_channels(
            jp["Conv3x3_0"]["Conv_0"]["kernel"], c_dim
        )
        stage_p: dict[str, Any] = {"Block3x3GLU_0": jp}
        stage_s: dict[str, Any] = {"Block3x3GLU_0": js}
        for r in range(r_num):
            rp = f"{tp}.residual.{r}.block"
            bn0_p, bn0_s = _bn_block(t, f"{rp}.1")
            bn1p, bn1s = _bn_block(t, f"{rp}.4")
            stage_p[f"ResBlockGLU_{r}"] = {
                "Conv3x3_0": {"Conv_0": {"kernel": _conv(t, f"{rp}.0.weight")}},
                "BatchNorm_0": bn0_p,
                "Conv3x3_1": {"Conv_0": {"kernel": _conv(t, f"{rp}.3.weight")}},
                "BatchNorm_1": bn1p,
            }
            stage_s[f"ResBlockGLU_{r}"] = {
                "BatchNorm_0": bn0_s,
                "BatchNorm_1": bn1s,
            }
        up_p, up_s = _upblock(t, f"{tp}.upsample")
        stage_p["UpBlockGLU_0"] = up_p
        stage_s["UpBlockGLU_0"] = up_s
        g_params[f"next{i}"] = stage_p
        g_stats[f"next{i}"] = stage_s

    # --- to-RGB heads ---
    for i in range(branch_num):
        g_params[f"to_rgb{i}"] = {
            "Conv3x3_0": {
                "Conv_0": {"kernel": _conv(t, f"img_net{i + 1}.img.0.weight")}
            }
        }

    t.finish("netG")
    return {"ca": ca_params, "g": g_params}, {"g": g_stats}, meta


def port_dnet_scale(sd: dict) -> int:
    """Infer which per-scale D a ``netD`` state_dict belongs to."""
    if "img_code_s64_2.0.weight" in sd:
        return 256
    if "img_code_s32_1.0.weight" in sd:
        return 128
    return 64


def port_dnet(sd: dict) -> tuple[dict, dict, dict]:
    """Port a reference per-scale ``netD`` state_dict.

    Returns ``(params, stats, meta)`` matching one entry of
    ``GanTrainState.d_params`` / ``d_stats`` (DNet64/128/256 per
    ``port_dnet_scale``)."""
    t = _Taker(sd)
    scale = port_dnet_scale(sd)
    ndf = t.take("img_code_s16.0.weight").shape[0]
    joint_in = t.take("logits.jointConv.0.weight").shape[1]
    meta = {"scale": scale, "df_dim": ndf, "ef_dim": joint_in - ndf * 8}

    trunk_p: dict[str, Any] = {
        "DownBlock_0": {"Conv_0": {"kernel": _conv(t, "img_code_s16.0.weight")}}
    }
    trunk_s: dict[str, Any] = {}
    # encode_image_by_16times indices: convs at 2/5/8, BNs at 3/6/9
    for n, (ci, bi) in enumerate(((2, 3), (5, 6), (8, 9)), start=1):
        bn_p, bn_s = _bn_block(t, f"img_code_s16.{bi}")
        trunk_p[f"DownBlock_{n}"] = {
            "Conv_0": {"kernel": _conv(t, f"img_code_s16.{ci}.weight")},
            "BatchNorm_0": bn_p,
        }
        trunk_s[f"DownBlock_{n}"] = {"BatchNorm_0": bn_s}
    extra = {256: ("img_code_s32", "img_code_s64"), 128: ("img_code_s32",)}.get(
        scale, ()
    )
    for n, prefix in enumerate(extra, start=4):
        bn_p, bn_s = _bn_block(t, f"{prefix}.1")
        trunk_p[f"DownBlock_{n}"] = {
            "Conv_0": {"kernel": _conv(t, f"{prefix}.0.weight")},
            "BatchNorm_0": bn_p,
        }
        trunk_s[f"DownBlock_{n}"] = {"BatchNorm_0": bn_s}
    squeezes = {
        256: ("img_code_s64_1", "img_code_s64_2"),
        128: ("img_code_s32_1",),
    }.get(scale, ())
    for n, prefix in enumerate(squeezes):
        p, s = _conv3x3_block(t, f"{prefix}.0.weight", f"{prefix}.1")
        trunk_p[f"Block3x3LeakyReLU_{n}"] = p
        trunk_s[f"Block3x3LeakyReLU_{n}"] = s

    joint_p, joint_s = _conv3x3_block(
        t, "logits.jointConv.0.weight", "logits.jointConv.1"
    )
    heads_p = {
        "joint": joint_p,
        "cond_logit": {
            "kernel": _conv(t, "logits.outlogits.0.weight"),
            "bias": t.take("logits.outlogits.0.bias"),
        },
        "uncond_logit": {
            "kernel": _conv(t, "uncond_logits.outlogits.0.weight"),
            "bias": t.take("uncond_logits.outlogits.0.bias"),
        },
    }
    t.finish(f"netD{scale}")
    params = {"trunk": trunk_p, "heads": heads_p}
    stats = {"trunk": trunk_s, "heads": {"joint": joint_s}}
    return params, stats, meta


# ---------------------------------------------------------------------------
# Reverse direction: Flax trees → reference torch state_dicts, the exact
# inverse of port_gnet/port_dnet (bitwise roundtrip, tests/test_port.py).
# Lets a generator trained HERE be evaluated/finetuned by the reference's
# own torch tooling.
# ---------------------------------------------------------------------------


def _conv_out(k) -> np.ndarray:
    return _np(k).transpose(3, 2, 0, 1)  # [kh,kw,I,O] -> [O,I,kh,kw]


def _bn_out(sd: dict, prefix: str, p: dict, s: dict) -> None:
    """p/s: our inner GroupedBatchNorm param/stat dicts ({scale,bias} /
    {mean,var}) — the inverse of _bn."""
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(s["mean"])
    sd[f"{prefix}.running_var"] = _np(s["var"])


def _bn_block_out(sd: dict, prefix: str, p: dict, s: dict) -> None:
    _bn_out(sd, prefix, p["BatchNorm_0"], s["BatchNorm_0"])


def _upblock_out(sd: dict, prefix: str, p: dict, s: dict) -> None:
    sd[f"{prefix}.1.weight"] = _conv_out(p["UpConv3x3_0"]["kernel"])
    _bn_block_out(sd, f"{prefix}.2", p["BatchNorm_0"], s["BatchNorm_0"])


def _conv3x3_block_out(
    sd: dict,
    conv_key: str,
    bn_prefix: str,
    p: dict,
    s: dict,
    swap_c: int | None = None,
) -> None:
    """``swap_c``: move our trailing ``swap_c`` input channels (the condition)
    to the torch-leading position before the layout transpose — needed where
    torch concatenates ``(c, h)`` but we concatenate ``(h, c)``."""
    k = p["Conv3x3_0"]["Conv_0"]["kernel"]
    if swap_c is not None:
        k = _swap_in_channels_out(_np(k), swap_c)
    sd[conv_key] = _conv_out(k)
    _bn_block_out(sd, bn_prefix, p["BatchNorm_0"], s["BatchNorm_0"])


def _swap_in_channels_out(k: np.ndarray, n_last_ours: int) -> np.ndarray:
    """Inverse of _swap_in_channels: our trailing ``n_last_ours`` input
    channels (the condition) become the torch-leading ones."""
    return np.concatenate(
        [k[:, :, -n_last_ours:, :], k[:, :, :-n_last_ours, :]], axis=2
    )


def export_gnet(g_params: dict, g_stats: dict) -> dict:
    """Inverse of :func:`port_gnet`: the ``{'ca','g'}`` / ``{'g'}`` subtrees
    of ``GanTrainState.g_params``/``g_stats`` (or the EMA copy plus
    ``g_stats``) → a reference-layout ``netG`` state_dict of numpy arrays
    (pass through ``torch.save`` after ``torch.from_numpy`` if a .pth file
    is needed — scripts/port_torch_gan.py --reverse does exactly that)."""
    ca, g = g_params["ca"], g_params["g"]
    gs = g_stats["g"]
    sd: dict[str, np.ndarray] = {}

    ca_kernel = _np(ca["Dense_0"]["kernel"])  # [t_dim, 4*c_dim]
    c_dim = ca_kernel.shape[1] // 4
    sd["ca_net.fc.weight"] = ca_kernel.T.copy()
    sd["ca_net.fc.bias"] = _np(ca["Dense_0"]["bias"])

    init_p, init_s = g["init"], gs["init"]
    dense = _np(init_p["Dense_0"]["kernel"])  # [z+c, ngf16*32] ours
    n_out = dense.shape[1]
    ngf16 = n_out // 32
    z_dim = dense.shape[0] - c_dim
    # inverse input-row permutation: ours (z, c) -> torch (c, z)
    perm_in = np.concatenate([np.arange(z_dim, z_dim + c_dim), np.arange(z_dim)])
    # inverse output-column permutation: torch[c*16+s] = ours[s*ngf16+c]
    half = n_out // 2
    f = np.arange(half)
    inv_half = (f % 16) * ngf16 + (f // 16)  # torch[f] = ours[inv_half[f]]
    inv = np.concatenate([inv_half, inv_half + half])
    sd["h_net1.fc.0.weight"] = dense[perm_in][:, inv].T.copy()
    bn_p = init_p["BatchNorm_0"]["BatchNorm_0"]
    bn_s = init_s["BatchNorm_0"]["BatchNorm_0"]
    sd["h_net1.fc.1.weight"] = _np(bn_p["scale"])[inv]
    sd["h_net1.fc.1.bias"] = _np(bn_p["bias"])[inv]
    sd["h_net1.fc.1.running_mean"] = _np(bn_s["mean"])[inv]
    sd["h_net1.fc.1.running_var"] = _np(bn_s["var"])[inv]
    for i in range(4):
        _upblock_out(
            sd,
            f"h_net1.upsample{i + 1}",
            init_p[f"UpBlockGLU_{i}"],
            init_s[f"UpBlockGLU_{i}"],
        )

    branch_num = 1 + sum(f"next{i}" in g for i in (1, 2))
    for i in range(1, branch_num):
        tp, sp, ss = f"h_net{i + 1}", g[f"next{i}"], gs[f"next{i}"]
        _conv3x3_block_out(
            sd,
            f"{tp}.jointConv.0.weight",
            f"{tp}.jointConv.1",
            sp["Block3x3GLU_0"],
            ss["Block3x3GLU_0"],
            swap_c=c_dim,
        )
        r = 0
        while f"ResBlockGLU_{r}" in sp:
            rp, rs = sp[f"ResBlockGLU_{r}"], ss[f"ResBlockGLU_{r}"]
            pre = f"{tp}.residual.{r}.block"
            sd[f"{pre}.0.weight"] = _conv_out(rp["Conv3x3_0"]["Conv_0"]["kernel"])
            _bn_block_out(sd, f"{pre}.1", rp["BatchNorm_0"], rs["BatchNorm_0"])
            sd[f"{pre}.3.weight"] = _conv_out(rp["Conv3x3_1"]["Conv_0"]["kernel"])
            _bn_block_out(sd, f"{pre}.4", rp["BatchNorm_1"], rs["BatchNorm_1"])
            r += 1
        _upblock_out(sd, f"{tp}.upsample", sp["UpBlockGLU_0"], ss["UpBlockGLU_0"])

    for i in range(branch_num):
        sd[f"img_net{i + 1}.img.0.weight"] = _conv_out(
            g[f"to_rgb{i}"]["Conv3x3_0"]["Conv_0"]["kernel"]
        )
    return sd


def export_dnet(params: dict, stats: dict) -> dict:
    """Inverse of :func:`port_dnet` for one per-scale D."""
    trunk_p, trunk_s = params["trunk"], stats["trunk"]
    heads_p, heads_s = params["heads"], stats["heads"]
    n_down = sum(k.startswith("DownBlock_") for k in trunk_p)
    scale = {4: 64, 5: 128, 6: 256}[n_down]
    sd: dict[str, np.ndarray] = {}

    sd["img_code_s16.0.weight"] = _conv_out(trunk_p["DownBlock_0"]["Conv_0"]["kernel"])
    for n, (ci, bi) in enumerate(((2, 3), (5, 6), (8, 9)), start=1):
        db, dbs = trunk_p[f"DownBlock_{n}"], trunk_s[f"DownBlock_{n}"]
        sd[f"img_code_s16.{ci}.weight"] = _conv_out(db["Conv_0"]["kernel"])
        _bn_block_out(sd, f"img_code_s16.{bi}", db["BatchNorm_0"], dbs["BatchNorm_0"])
    extra = {256: ("img_code_s32", "img_code_s64"), 128: ("img_code_s32",)}.get(
        scale, ()
    )
    for n, prefix in enumerate(extra, start=4):
        db, dbs = trunk_p[f"DownBlock_{n}"], trunk_s[f"DownBlock_{n}"]
        sd[f"{prefix}.0.weight"] = _conv_out(db["Conv_0"]["kernel"])
        _bn_block_out(sd, f"{prefix}.1", db["BatchNorm_0"], dbs["BatchNorm_0"])
    squeezes = {
        256: ("img_code_s64_1", "img_code_s64_2"),
        128: ("img_code_s32_1",),
    }.get(scale, ())
    for n, prefix in enumerate(squeezes):
        _conv3x3_block_out(
            sd,
            f"{prefix}.0.weight",
            f"{prefix}.1",
            trunk_p[f"Block3x3LeakyReLU_{n}"],
            trunk_s[f"Block3x3LeakyReLU_{n}"],
        )

    _conv3x3_block_out(
        sd,
        "logits.jointConv.0.weight",
        "logits.jointConv.1",
        heads_p["joint"],
        heads_s["joint"],
    )
    sd["logits.outlogits.0.weight"] = _conv_out(heads_p["cond_logit"]["kernel"])
    sd["logits.outlogits.0.bias"] = _np(heads_p["cond_logit"]["bias"])
    sd["uncond_logits.outlogits.0.weight"] = _conv_out(
        heads_p["uncond_logit"]["kernel"]
    )
    sd["uncond_logits.outlogits.0.bias"] = _np(heads_p["uncond_logit"]["bias"])
    return sd
