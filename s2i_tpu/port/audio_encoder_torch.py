"""Best-effort port of reference torch speech-encoder checkpoints
(``audio_encoder/`` lineage) into :class:`s2i_tpu.models.encoder.SpeechEncoder`
trees — same contract as the GAN porter (:mod:`s2i_tpu.port.stackgan_torch`):
dims inferred from tensor shapes, ``module.`` DataParallel prefixes stripped,
and LOUD failure on anything that does not map.

SURVEY.md §2 tags the reference encoder's internals [?] (exact module
naming unknown — the mount has been empty every session), so unlike the GAN
porter this one cannot key on a published naming scheme. Instead it matches
the checkpoint STRUCTURALLY against the [?]-documented topology (strided
Conv1d stack + BatchNorm1d + (bi)GRU + Linear head(s), SURVEY §2 "Speech
encoder"): tensors are classified by shape/suffix and grouped by module
prefix in the state_dict's insertion order (torch preserves module
definition order). Any parameter that cannot be classified, any
architecture that deviates from the topology (conv bias, LSTM, second RNN,
channel-chain mismatch), raises with the offending keys — never a silent
partial load.

Gate math note: torch ``nn.GRU`` and this framework's GRU are the SAME
formulation — gates packed (r|z|n), and the candidate gate applies the
recurrent bias INSIDE the reset gate (``n = tanh(x_n + r*(h@W_hn + b_hn))``,
ops/gru_kernel._gates) — so weights port by transpose alone. Conv window
ALIGNMENT differs between Flax "SAME" and torch's symmetric ``padding=k//2``
at even lengths: build the target model with ``conv_padding="torch"``
(the ported meta says so; cross-validated in tests/test_port_encoder.py
against a torch reference implementation, eval-mode embeddings equal).

    import torch
    from s2i_tpu.port.audio_encoder_torch import port_encoder
    tree, meta = port_encoder(torch.load("audio_encoder.pth",
                                         map_location="cpu"))
    model = SpeechEncoder(**meta)          # conv_padding="torch" included
    emb = model.apply(tree, feats, mask, train=False)

Because the reference layout is [?], ported results MUST be validated
against source-model outputs before use (docs/MIGRATION.md "Speech
encoder"); the loud-failure contract makes a layout mismatch a hard error
rather than a wrong-numbers hazard.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

__all__ = ["port_encoder"]


def _normalize(state_dict) -> dict[str, Any]:
    """Accept a path or an in-memory state_dict; unwrap a
    ``{'state_dict': ...}`` container and strip DataParallel's ``module.``
    prefix (same normalization as stackgan_torch.load_torch_state_dict)."""
    if isinstance(state_dict, str):
        from s2i_tpu.port.stackgan_torch import load_torch_state_dict

        return load_torch_state_dict(state_dict)
    obj = state_dict
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"expected a state_dict, got {type(obj)}")
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in obj.items()
    }

_GRU_RE = re.compile(
    r"(?P<mod>.*?)(?P<kind>weight_ih|weight_hh|bias_ih|bias_hh)"
    r"_l(?P<layer>\d+)(?P<rev>_reverse)?$"
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def port_encoder(
    state_dict: dict[str, Any],
    conv_stride: int = 2,
    emb_dim: int | None = None,
) -> tuple[dict, dict]:
    """torch state_dict → (Flax variables, SpeechEncoder kwargs).

    ``conv_stride`` is the one hyperparameter shapes cannot carry (torch
    stores it in code, not the checkpoint) — pass the source model's value.
    ``emb_dim`` disambiguates which Linear is the embedding head when the
    checkpoint has two (head + auxiliary class head) and neither output
    dimension is 1024; with one Linear, or when exactly one matches
    ``emb_dim`` (default 1024 = cfg.TEXT.DIMENSION), it is inferred.

    Returns ``({"params": ..., "batch_stats": ...}, meta)`` where ``meta``
    are constructor kwargs for :class:`SpeechEncoder` (conv_channels,
    conv_kernel, conv_stride, conv_padding="torch", rnn_hidden, rnn_layers,
    bidirectional, pool, emb_dim, n_classes).
    """
    sd = _normalize(state_dict)
    sd = {
        k: _np(v)
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    }

    convs: list[tuple[str, np.ndarray]] = []  # (prefix, [O,I,K])
    bns: dict[str, dict[str, np.ndarray]] = {}
    gru: dict[tuple[int, bool], dict[str, np.ndarray]] = {}
    linears: list[tuple[str, np.ndarray, np.ndarray | None]] = []
    bn_order: list[str] = []
    unmatched: list[str] = []
    lin_bias: dict[str, np.ndarray] = {}
    conv_bias: list[str] = []

    for key, v in sd.items():
        m = _GRU_RE.match(key)
        if m is not None:
            layer = int(m.group("layer"))
            rev = m.group("rev") is not None
            gru.setdefault((layer, rev), {})[m.group("kind")] = v
            continue
        mod, _, leaf = key.rpartition(".")
        if leaf == "weight" and v.ndim == 3:
            convs.append((mod, v))
        elif leaf == "bias" and v.ndim == 1 and any(
            c == mod for c, _ in convs
        ):
            conv_bias.append(key)
        elif leaf in ("weight", "bias", "running_mean", "running_var") and (
            v.ndim == 1
        ):
            if mod not in bns:
                bn_order.append(mod)
            bns.setdefault(mod, {})[leaf] = v
        elif leaf == "weight" and v.ndim == 2:
            linears.append((mod, v, None))
        else:
            unmatched.append(key)

    # attach linear biases to their module
    for key, v in list(sd.items()):
        mod, _, leaf = key.rpartition(".")
        if leaf == "bias" and any(mod == lm for lm, _, _ in linears):
            lin_bias[mod] = v
    linears = [(m, w, lin_bias.get(m)) for m, w, _ in linears]
    # 1-dim biases of linear modules were swept into the BN bucket above;
    # reclaim them (a true BN group has running stats)
    for m, _, _ in linears:
        if m in bns and set(bns[m]) <= {"weight", "bias"}:
            bn_order.remove(m)
            del bns[m]

    problems: list[str] = []
    if conv_bias:
        problems.append(
            f"conv layers carry biases ({conv_bias[:3]}...) but the target "
            "conv stack is bias-free (BN absorbs it)"
        )
    if unmatched:
        problems.append(f"unclassifiable keys: {sorted(unmatched)[:8]}")
    for mod in bn_order:
        missing = {"weight", "bias", "running_mean", "running_var"} - set(
            bns[mod]
        )
        if missing:
            problems.append(f"BatchNorm {mod!r} missing {sorted(missing)}")
    if len(bns) != len(convs):
        problems.append(
            f"{len(convs)} convs vs {len(bns)} BatchNorms — topology is "
            "conv+BN pairs"
        )
    if not gru:
        problems.append("no GRU weights (weight_ih_l0 etc.) found")
    if problems:
        raise ValueError(
            "state_dict does not match the SpeechEncoder topology: "
            + "; ".join(problems)
        )

    # ---- conv/BN chain (insertion order == definition order) ----
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    conv_channels = []
    in_ch = convs[0][1].shape[1]
    kernel = convs[0][1].shape[2]
    prev = in_ch
    for i, ((cmod, w), bmod) in enumerate(zip(convs, bn_order)):
        o, c, k = w.shape
        if c != prev:
            problems.append(
                f"conv {cmod!r} expects {c} in-channels, previous stage "
                f"emits {prev}"
            )
        if k != kernel:
            problems.append(
                f"conv {cmod!r} kernel {k} != first conv's {kernel} "
                "(the target stack uses one kernel size)"
            )
        if bns[bmod]["weight"].shape[0] != o:
            problems.append(
                f"BatchNorm {bmod!r} width {bns[bmod]['weight'].shape[0]} "
                f"!= conv {cmod!r} out {o}"
            )
        params[f"conv{i}"] = {"kernel": w.transpose(2, 1, 0)}  # [K,I,O]
        params[f"bn{i}"] = {
            "scale": bns[bmod]["weight"],
            "bias": bns[bmod]["bias"],
        }
        stats[f"bn{i}"] = {
            "mean": bns[bmod]["running_mean"],
            "var": bns[bmod]["running_var"],
        }
        conv_channels.append(o)
        prev = o

    # ---- GRU layers ----
    layers = sorted({l for l, _ in gru})
    if layers != list(range(len(layers))):
        problems.append(f"non-contiguous GRU layers {layers}")
    bidirectional = (0, True) in gru
    hidden = gru[(0, False)]["weight_hh"].shape[1]
    bigru: dict[str, Any] = {}
    for layer in layers:
        dirs = [(False, f"fwd{layer}")] + (
            [(True, f"bwd{layer}")] if bidirectional else []
        )
        expect_in = prev if layer == 0 else hidden * (2 if bidirectional else 1)
        for rev, name in dirs:
            g = gru.get((layer, rev))
            if g is None or set(g) != {
                "weight_ih", "weight_hh", "bias_ih", "bias_hh",
            }:
                problems.append(
                    f"GRU layer {layer} {'reverse' if rev else 'forward'} "
                    f"incomplete: has {sorted(g or {})}"
                )
                continue
            if g["weight_ih"].shape != (3 * hidden, expect_in):
                problems.append(
                    f"GRU l{layer}{'_reverse' if rev else ''} weight_ih "
                    f"{g['weight_ih'].shape} != {(3 * hidden, expect_in)}"
                )
                continue
            bigru[name] = {
                "input_proj": {
                    "kernel": g["weight_ih"].T,  # [in, 3H]
                    "bias": g["bias_ih"],
                },
                "recurrent_kernel": g["weight_hh"].T,  # [H, 3H]
                "recurrent_bias": g["bias_hh"],
            }
    params["BiGRU_0"] = bigru

    # ---- heads: pool mode falls out of the Linear input width ----
    rnn_out = hidden * (2 if bidirectional else 1)
    pools = {rnn_out: "mean", 2 * rnn_out: "mean_max"}
    widths = {w.shape[1] for _, w, _ in linears}
    if len(widths) != 1 or next(iter(widths)) not in pools:
        problems.append(
            f"Linear input widths {sorted(widths)} do not match a pooled "
            f"GRU output (expected {sorted(pools)} for hidden={hidden}, "
            f"bidirectional={bidirectional})"
        )
        pool = "mean"
    else:
        pool = pools[next(iter(widths))]
        # NOTE [?]: width rnn_out is 'mean' OR 'max' — indistinguishable
        # from shapes; 'mean' assumed, validate outputs (module docstring).

    head = cls = None
    if len(linears) == 1:
        head = linears[0]
    else:
        want = 1024 if emb_dim is None else int(emb_dim)
        match = [t for t in linears if t[1].shape[0] == want]
        if len(linears) == 2 and len(match) == 1:
            head = match[0]
            cls = next(t for t in linears if t is not head)
        else:
            problems.append(
                f"cannot identify the embedding head among "
                f"{[(m, w.shape) for m, w, _ in linears]} — pass emb_dim="
            )
    if problems:
        raise ValueError(
            "state_dict does not match the SpeechEncoder topology: "
            + "; ".join(problems)
        )
    for name, lin in (("head", head), ("cls", cls)):
        if lin is None:
            continue
        mod, w, b = lin
        if b is None:
            raise ValueError(f"Linear {mod!r} has no bias (target has one)")
        params[name] = {"kernel": w.T, "bias": b}

    meta = {
        "emb_dim": int(head[1].shape[0]),
        "conv_channels": tuple(int(c) for c in conv_channels),
        "conv_kernel": int(kernel),
        "conv_stride": int(conv_stride),
        "conv_padding": "torch",
        "rnn_hidden": int(hidden),
        "rnn_layers": len(layers),
        "bidirectional": bool(bidirectional),
        "pool": pool,
        "n_classes": int(cls[1].shape[0]) if cls is not None else 0,
    }
    return {"params": params, "batch_stats": stats}, meta
