"""Speech-encoder porter (s2i_tpu/port/audio_encoder_torch.py): a torch
reference implementation of the [?]-documented topology (strided Conv1d+BN
stack → (bi)GRU → mean+max pool → Linear head(s), SURVEY.md §2 "Speech
encoder") is built in torch, its state_dict ported, and eval-mode outputs
must match — the same cross-validation the GAN porter gets from
tests/_torch_stackgan.py. Plus the loud-failure contract: unmatched keys,
conv biases, and ambiguous heads raise instead of part-loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from s2i_tpu.models.encoder import SpeechEncoder
from s2i_tpu.port.audio_encoder_torch import port_encoder


class _TorchSpeechEncoder(tnn.Module):
    """Reference-topology torch encoder (conv padding k//2, GRU, mean+max
    pooling) — the architecture SURVEY §2 documents, in torch naming."""

    def __init__(self, n_mels=8, channels=(16, 32), k=5, stride=2,
                 hidden=12, layers=1, bidirectional=True, emb_dim=20,
                 n_classes=0):
        super().__init__()
        convs, bns = [], []
        prev = n_mels
        for ch in channels:
            convs.append(
                tnn.Conv1d(prev, ch, k, stride=stride, padding=k // 2,
                           bias=False)
            )
            bns.append(tnn.BatchNorm1d(ch))
            prev = ch
        self.convs = tnn.ModuleList(convs)
        self.bns = tnn.ModuleList(bns)
        self.rnn = tnn.GRU(prev, hidden, num_layers=layers,
                           batch_first=True, bidirectional=bidirectional)
        out = hidden * (2 if bidirectional else 1)
        self.head = tnn.Linear(2 * out, emb_dim)
        self.cls = tnn.Linear(2 * out, n_classes) if n_classes else None

    def forward(self, x):  # [B, T, M], full-length utterances
        h = x.transpose(1, 2)
        for c, b in zip(self.convs, self.bns):
            h = torch.relu(b(c(h)))
        h = h.transpose(1, 2)
        y, _ = self.rnn(h)
        pooled = torch.cat([y.mean(1), y.max(1).values], -1)
        e = self.head(pooled)
        return (e, self.cls(pooled)) if self.cls is not None else e


def _randomized(model: _TorchSpeechEncoder, seed: int = 0):
    """Random weights AND random BN running stats (fresh 0/1 stats would
    mask a running_mean/var mapping bug)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
    return model.eval()


def _compare(tm, n_mels, t_len, n_classes=0, seed=1):
    tree, meta = port_encoder(tm.state_dict())
    assert meta["conv_padding"] == "torch"
    assert meta["pool"] == "mean_max"
    assert meta["n_classes"] == n_classes
    fm = SpeechEncoder(**meta)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((4, t_len, n_mels)).astype(np.float32)
    mask = np.ones((4, t_len), bool)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = fm.apply(tree, jnp.asarray(x), jnp.asarray(mask), train=False)
    if n_classes:
        np.testing.assert_allclose(
            np.asarray(got[0]), want[0].numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), want[1].numpy(), atol=2e-5
        )
    else:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)
    return tree, meta, fm


def test_port_encoder_matches_torch_bigru():
    tm = _randomized(_TorchSpeechEncoder(bidirectional=True))
    # odd T exercises the padding-alignment case where Flax "SAME" and
    # torch k//2 windows would NOT coincide without conv_padding="torch"
    _compare(tm, n_mels=8, t_len=37)


def test_port_encoder_matches_torch_unidirectional_two_layers():
    tm = _randomized(
        _TorchSpeechEncoder(bidirectional=False, layers=2, hidden=10)
    )
    tree, meta, _ = _compare(tm, n_mels=8, t_len=24)
    assert meta["rnn_layers"] == 2 and not meta["bidirectional"]
    assert "bwd0" not in tree["params"]["BiGRU_0"]


def test_port_encoder_cls_head_and_dataparallel_prefix():
    tm = _randomized(_TorchSpeechEncoder(emb_dim=20, n_classes=7))
    # emb_dim disambiguates head vs cls among two Linears
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    tree, meta = port_encoder(sd, emb_dim=20)
    assert meta["emb_dim"] == 20 and meta["n_classes"] == 7
    fm = SpeechEncoder(**meta)
    x = np.random.default_rng(2).standard_normal((2, 40, 8)).astype(np.float32)
    with torch.no_grad():
        want_e, want_c = tm(torch.from_numpy(x))
    got_e, got_c = fm.apply(
        tree, jnp.asarray(x), jnp.ones((2, 40), bool), train=False
    )
    np.testing.assert_allclose(np.asarray(got_e), want_e.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=2e-5)


def test_ported_tree_is_dropin_for_model_init():
    """The ported variables must be structurally identical to the model's
    own init (same tree paths, same shapes) — the restore-template
    contract every checkpoint consumer relies on."""
    tm = _randomized(_TorchSpeechEncoder())
    tree, meta, fm = _compare(tm, n_mels=8, t_len=32)
    init = fm.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 8), jnp.float32),
        jnp.ones((1, 32), bool),
        train=False,
    )
    paths = lambda t: {  # noqa: E731
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree.leaves_with_path(t)
    }
    assert paths(init) == paths(tree)


def test_port_encoder_fails_loudly():
    tm = _randomized(_TorchSpeechEncoder())
    sd = dict(tm.state_dict())

    # unknown tensor → raise naming it
    bad = dict(sd)
    bad["attention.in_proj_weight"] = torch.zeros(6, 4, 2, 2)
    with pytest.raises(ValueError, match="attention.in_proj_weight"):
        port_encoder(bad)

    # conv bias → topology mismatch
    bad = dict(sd)
    bad["convs.0.bias"] = torch.zeros(16)
    with pytest.raises(ValueError, match="bias"):
        port_encoder(bad)

    # two heads, neither at the default 1024 → must demand emb_dim
    tm2 = _randomized(_TorchSpeechEncoder(emb_dim=20, n_classes=7))
    with pytest.raises(ValueError, match="emb_dim"):
        port_encoder(tm2.state_dict())

    # no GRU at all
    nogru = {k: v for k, v in sd.items() if "_l0" not in k}
    with pytest.raises(ValueError, match="GRU"):
        port_encoder(nogru)
