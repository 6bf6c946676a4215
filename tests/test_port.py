"""Torch GAN checkpoint porter: end-to-end cross-validation.

A torch G_NET / D_NET{64,128,256} with the reference's StackGAN-v2 topology
and parameter naming (tests/_torch_stackgan.py) is randomly initialized, its
BN running stats are moved off their init values by train-mode forwards, and
its state_dict is ported (s2i_tpu/port/stackgan_torch.py). Eval-mode outputs
must match between torch (NCHW) and the Flax models (NHWC) at every scale —
whole-model parity, not just per-block (SURVEY.md §2 G/D rows)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from s2i_tpu.models.ca_net import CANet  # noqa: E402
from s2i_tpu.models.discriminator import DNet64, DNet128, DNet256  # noqa: E402
from s2i_tpu.models.generator import GNet  # noqa: E402
from s2i_tpu.port import port_dnet, port_dnet_scale, port_gnet  # noqa: E402
from tests import _torch_stackgan as ts  # noqa: E402

GF, TDIM, CDIM, ZDIM, RNUM, B = 8, 32, 16, 12, 2, 4


def _warm_bn(model, *inputs, steps=2):
    """Train-mode forwards move BN running stats off their (0, 1) init so
    the test actually exercises running-stat porting."""
    model.train()
    with torch.no_grad():
        for _ in range(steps):
            model(*inputs)
    model.eval()


@pytest.fixture(scope="module")
def torch_g():
    torch.manual_seed(0)
    g = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=3, r_num=RNUM)
    z = torch.randn(B, ZDIM)
    c = torch.randn(B, CDIM)
    _warm_bn(g, z, c)
    return g


def test_port_gnet_matches_torch(torch_g):
    g_params, g_stats, meta = port_gnet(
        {k: v for k, v in torch_g.state_dict().items()}
    )
    assert meta == {
        "gf_dim": GF,
        "z_dim": ZDIM,
        "c_dim": CDIM,
        "t_dim": TDIM,
        "branch_num": 3,
        "r_num": RNUM,
    }

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(B, TDIM)).astype(np.float32)
    z = rng.normal(size=(B, ZDIM)).astype(np.float32)

    # CA: eval-mode c_code is mu; compare (mu, logvar)
    tmu, tlogvar = torch_g.ca_net.encode(torch.from_numpy(emb))
    ca = CANet(c_dim=CDIM)
    c, mu, logvar = ca.apply(
        {"params": g_params["ca"]}, jnp.asarray(emb), train=False
    )
    np.testing.assert_allclose(np.asarray(mu), tmu.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(logvar), tlogvar.detach().numpy(), atol=2e-6
    )

    with torch.no_grad():
        torch_imgs = torch_g(torch.from_numpy(z), tmu)

    gnet = GNet(gf_dim=GF, branch_num=3, num_res=RNUM, up_mode="naive")
    imgs = gnet.apply(
        {"params": g_params["g"], "batch_stats": g_stats["g"]},
        jnp.asarray(z),
        mu,
        train=False,
    )
    assert len(imgs) == len(torch_imgs) == 3
    for i, (ours, theirs) in enumerate(zip(imgs, torch_imgs)):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.numpy().transpose(0, 2, 3, 1),
            atol=3e-5,
            err_msg=f"stage {i}",
        )


def test_port_gnet_tree_matches_init(torch_g):
    """The ported tree is EXACTLY the tree GNet/CANet initialize — same
    structure, same shapes — so it drops into GanTrainState unchanged."""
    g_params, g_stats, _ = port_gnet(torch_g.state_dict())
    gnet = GNet(gf_dim=GF, branch_num=3, num_res=RNUM)
    ref = gnet.init(
        jax.random.key(0),
        jnp.zeros((2, ZDIM)),
        jnp.zeros((2, CDIM)),
        train=False,
    )
    ca_ref = CANet(c_dim=CDIM).init(
        jax.random.key(0), jnp.zeros((2, TDIM)), train=False
    )
    for ported, init in (
        (g_params["g"], ref["params"]),
        (g_stats["g"], ref["batch_stats"]),
        (g_params["ca"], ca_ref["params"]),
    ):
        a = jax.tree_util.tree_flatten_with_path(ported)[0]
        b = jax.tree_util.tree_flatten_with_path(init)[0]
        assert [(p, v.shape) for p, v in a] == [
            (p, v.shape) for p, v in b
        ]


@pytest.mark.parametrize(
    "tcls, ours, size",
    [
        (ts.D_NET64, DNet64, 64),
        (ts.D_NET128, DNet128, 128),
        (ts.D_NET256, DNet256, 256),
    ],
)
def test_port_dnet_matches_torch(tcls, ours, size):
    torch.manual_seed(size)
    d = tcls(ndf=8, nef=CDIM)
    x = torch.randn(B, 3, size, size)
    c = torch.randn(B, CDIM)
    _warm_bn(d, x, c)

    sd = d.state_dict()
    assert port_dnet_scale(sd) == size
    params, stats, meta = port_dnet(sd)
    assert meta == {"scale": size, "df_dim": 8, "ef_dim": CDIM}

    with torch.no_grad():
        t_cond, t_uncond = d(x, c)

    dnet = ours(df_dim=8, ef_dim=CDIM)
    cond, uncond = dnet.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(c.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(cond), t_cond.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(uncond), t_uncond.numpy(), atol=3e-5)


def test_port_cli_checkpoint_roundtrip(tmp_path, monkeypatch):
    """scripts/port_torch_gan.py: .pth files -> step-0 checkpoint that
    restores into the trainer's state template and drives the sampler."""
    import importlib

    torch.manual_seed(7)
    g = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=2, r_num=RNUM)
    d64 = ts.D_NET64(ndf=8, nef=CDIM)
    z = torch.randn(B, ZDIM)
    c = torch.randn(B, CDIM)
    _warm_bn(g, z, c)
    _warm_bn(d64, torch.randn(B, 3, 64, 64), c)
    netg = tmp_path / "netG.pth"
    netd = tmp_path / "netD64.pth"
    torch.save(g.state_dict(), netg)
    # DataParallel-style prefixes must be stripped by the loader
    torch.save(
        {f"module.{k}": v for k, v in d64.state_dict().items()}, netd
    )

    out = tmp_path / "ported"
    monkeypatch.setattr(
        "sys.argv",
        [
            "port_torch_gan.py",
            "--netg", str(netg),
            "--netd", str(netd),
            "--out", str(out),
            "--set", "GAN.DF_DIM=8", "TRAIN.EMA_G=0.999",
        ],
    )
    mod = importlib.import_module("scripts.port_torch_gan")
    mod.main()

    from s2i_tpu import config
    from s2i_tpu.train import gan
    from s2i_tpu.utils.checkpoint import CheckpointManager

    cfg = config.cfg_from_file(str(out / "ported_config.yml"))
    assert int(cfg.TREE.BRANCH_NUM) == 2
    assert int(cfg.GAN.GF_DIM) == GF
    models = gan.build_models(cfg)
    batch = {"images": (np.zeros((2, 128, 128, 3), np.float32),)}
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    mgr = CheckpointManager(str(out))
    restored, step = mgr.restore_latest(state)
    mgr.close()
    assert step == 0

    # the restored G must be the torch G: compare an eval-mode forward
    rng = np.random.default_rng(3)
    zz = rng.normal(size=(B, ZDIM)).astype(np.float32)
    emb = rng.normal(size=(B, TDIM)).astype(np.float32)
    tmu, _ = g.ca_net.encode(torch.from_numpy(emb))
    with torch.no_grad():
        t_imgs = g(torch.from_numpy(zz), tmu)
    gnet = GNet(gf_dim=GF, branch_num=2, num_res=RNUM, up_mode="naive")
    imgs = gnet.apply(
        {
            "params": restored.g_params["g"],
            "batch_stats": restored.g_stats["g"],
        },
        jnp.asarray(zz),
        jnp.asarray(tmu.detach().numpy()),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(imgs[-1]),
        t_imgs[-1].numpy().transpose(0, 2, 3, 1),
        atol=3e-5,
    )

    # EMA was seeded with the ported weights, so the sampler (use_ema) runs
    # the ported G end-to-end
    sample = jax.jit(gan.make_sample_fn(cfg, models))
    out_imgs = sample(restored, jnp.asarray(emb), jax.random.key(0))
    assert out_imgs[-1].shape == (B, 128, 128, 3)
    assert all(np.isfinite(np.asarray(im)).all() for im in out_imgs)


def test_export_gnet_bitwise_roundtrip(torch_g):
    """torch sd -> port -> export is the identity, key for key, bit for bit."""
    from s2i_tpu.port import export_gnet

    sd = {k: v.numpy() for k, v in torch_g.state_dict().items()}
    g_params, g_stats, _ = port_gnet(sd)
    back = export_gnet(g_params, g_stats)
    expect = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    assert sorted(back) == sorted(expect)
    for k in expect:
        np.testing.assert_array_equal(back[k], expect[k], err_msg=k)


def test_export_gnet_loads_into_torch_strict():
    """A generator that ORIGINATED here exports to a state_dict torch loads
    strictly and computes the same images — the reverse migration path."""
    from s2i_tpu.port import export_gnet

    gnet = GNet(gf_dim=GF, branch_num=3, num_res=RNUM, up_mode="naive")
    v = gnet.init(
        jax.random.key(5), jnp.zeros((2, ZDIM)), jnp.zeros((2, CDIM)),
        train=False,
    )
    ca = CANet(c_dim=CDIM)
    ca_v = ca.init(jax.random.key(6), jnp.zeros((2, TDIM)), train=False)
    g_params = {"ca": ca_v["params"], "g": v["params"]}
    g_stats = {"g": v["batch_stats"]}

    sd = {k: torch.from_numpy(x) for k, x in export_gnet(g_params, g_stats).items()}
    tg = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=3, r_num=RNUM)
    missing, unexpected = tg.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing)
    tg.eval()

    rng = np.random.default_rng(9)
    emb = rng.normal(size=(B, TDIM)).astype(np.float32)
    z = rng.normal(size=(B, ZDIM)).astype(np.float32)
    _, mu, _ = ca.apply({"params": g_params["ca"]}, jnp.asarray(emb), train=False)
    tmu, _ = tg.ca_net.encode(torch.from_numpy(emb))
    np.testing.assert_allclose(tmu.detach().numpy(), np.asarray(mu), atol=2e-6)
    imgs = gnet.apply(
        {"params": g_params["g"], "batch_stats": g_stats["g"]},
        jnp.asarray(z), mu, train=False,
    )
    with torch.no_grad():
        t_imgs = tg(torch.from_numpy(z), torch.from_numpy(np.asarray(mu)))
    for ours, theirs in zip(imgs, t_imgs):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=3e-5
        )


@pytest.mark.parametrize(
    "gf, branch, rnum, zd, cd",
    [(4, 1, 2, 8, 8), (16, 2, 1, 100, 128), (8, 3, 3, 20, 24)],
)
def test_port_gnet_roundtrip_dims_sweep(gf, branch, rnum, zd, cd):
    """Dims inference + both directions across generator geometries
    (branch 1 has no next stages; r_num varies the residual count)."""
    from s2i_tpu.port import export_gnet

    torch.manual_seed(gf * branch)
    g = ts.G_NET(gf, TDIM, cd, zd, branch_num=branch, r_num=rnum)
    sd = {k: v.numpy() for k, v in g.state_dict().items()}
    g_params, g_stats, meta = port_gnet(sd)
    assert meta["gf_dim"] == gf and meta["branch_num"] == branch
    assert meta["z_dim"] == zd and meta["c_dim"] == cd
    assert meta["r_num"] == (rnum if branch > 1 else None)
    gnet = GNet(gf_dim=gf, branch_num=branch, num_res=rnum)
    ref = gnet.init(
        jax.random.key(0), jnp.zeros((2, zd)), jnp.zeros((2, cd)), train=False
    )
    assert jax.tree.structure(g_params["g"]) == jax.tree.structure(
        ref["params"]
    )
    back = export_gnet(g_params, g_stats)
    expect = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    assert sorted(back) == sorted(expect)
    for k in expect:
        np.testing.assert_array_equal(back[k], expect[k], err_msg=k)


def test_export_dnet_bitwise_roundtrip():
    from s2i_tpu.port import export_dnet

    torch.manual_seed(11)
    d = ts.D_NET256(ndf=8, nef=CDIM)
    _warm_bn(d, torch.randn(B, 3, 256, 256), torch.randn(B, CDIM))
    sd = {k: v.numpy() for k, v in d.state_dict().items()}
    params, stats, _ = port_dnet(sd)
    back = export_dnet(params, stats)
    expect = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    assert sorted(back) == sorted(expect)
    for k in expect:
        np.testing.assert_array_equal(back[k], expect[k], err_msg=k)


def test_export_cli_joint_checkpoint(tmp_path, monkeypatch):
    """scripts/export_torch_gan.py restores a JOINT-FT checkpoint (the
    template carries the encoder subtree) and the exported netG loads
    strictly into torch."""
    import importlib

    from s2i_tpu import config
    from s2i_tpu.data.synthetic import SyntheticGanDataset, SyntheticSpeechDataset
    from s2i_tpu.train import gan
    from s2i_tpu.utils.checkpoint import CheckpointManager

    cfg = config.default_cfg()
    cfg.TRAIN.JOINT_FT = True
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TREE.BRANCH_NUM = 2
    cfg.GAN.GF_DIM = GF
    cfg.GAN.Z_DIM = ZDIM
    cfg.GAN.EMBEDDING_DIM = CDIM
    cfg.TEXT.DIMENSION = TDIM
    cfg.ENCODER.CONV_CHANNELS = [8, 8]
    cfg.ENCODER.RNN_HIDDEN = 8
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 16
    models = gan.build_models(cfg, joint=True)
    img = SyntheticGanDataset(
        num_classes=2, examples_per_class=2, branch_num=2, emb_dim=TDIM
    ).batch(np.arange(2))
    sp = SyntheticSpeechDataset(
        num_classes=2, examples_per_class=2, max_frames=16, n_mels=8,
        emb_dim=TDIM,
    ).batch(np.arange(2))
    batch = {
        "images": img["images"],
        "feats": sp["feats"],
        "feat_mask": sp["feat_mask"],
    }
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    ckpt_dir = tmp_path / "ckpt"
    mgr = CheckpointManager(str(ckpt_dir))
    mgr.save(0, state, force=True)
    mgr.wait()
    mgr.close()
    cfg_path = tmp_path / "config.yml"
    config.dump_cfg(cfg, str(cfg_path))

    out = tmp_path / "torch"
    monkeypatch.setattr(
        "sys.argv",
        [
            "export_torch_gan.py",
            "--cfg", str(cfg_path),
            "--ckpt", str(ckpt_dir),
            "--out", str(out),
        ],
    )
    importlib.import_module("scripts.export_torch_gan").main()

    sd = torch.load(out / "netG.pth", map_location="cpu", weights_only=True)
    tg = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=2, r_num=RNUM)
    missing, unexpected = tg.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing)
    for scale in (64, 128):
        assert (out / f"netD{scale}.pth").exists()


def test_export_cli_raw_flag_and_ema_fallback(tmp_path, monkeypatch):
    """The two export paths the joint-checkpoint test does not reach:
    ``--raw`` (trained weights instead of the Polyak copy) and the
    automatic raw fallback when the checkpoint carries no EMA
    (TRAIN.EMA_G=0) — scripts/export_torch_gan.py lines 69-74."""
    import importlib

    from s2i_tpu import config
    from s2i_tpu.train import gan
    from s2i_tpu.utils.checkpoint import CheckpointManager

    def make_cfg(ema):
        cfg = config.default_cfg()
        cfg.TRAIN.BATCH_SIZE = 2
        cfg.TRAIN.EMA_G = ema
        cfg.TREE.BRANCH_NUM = 2
        cfg.GAN.GF_DIM = GF
        cfg.GAN.Z_DIM = ZDIM
        cfg.GAN.EMBEDDING_DIM = CDIM
        cfg.TEXT.DIMENSION = TDIM
        return cfg

    def save_run(cfg, subdir):
        """Init, then double every trained G weight so raw != EMA (the EMA
        copy keeps the init values); exact-in-fp32 perturbation."""
        models = gan.build_models(cfg)
        batch = {"images": (np.zeros((2, 128, 128, 3), np.float32),)}
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        state = state.replace(
            g_params={
                **state.g_params,
                "g": jax.tree.map(lambda x: x * 2.0, state.g_params["g"]),
            }
        )
        run = tmp_path / subdir
        mgr = CheckpointManager(str(run / "ckpt"))
        mgr.save(0, state, force=True)
        mgr.wait()
        mgr.close()
        config.dump_cfg(cfg, str(run / "config.yml"))
        return run

    def export(run, out, *extra):
        monkeypatch.setattr(
            "sys.argv",
            [
                "export_torch_gan.py",
                "--cfg", str(run / "config.yml"),
                "--ckpt", str(run / "ckpt"),
                "--out", str(out),
                *extra,
            ],
        )
        importlib.import_module("scripts.export_torch_gan").main()
        return torch.load(
            out / "netG.pth", map_location="cpu", weights_only=True
        )

    run = save_run(make_cfg(0.999), "ema_run")
    sd_ema = export(run, tmp_path / "out_ema")
    sd_raw = export(run, tmp_path / "out_raw", "--raw")
    probe = "img_net1.img.0.weight"
    np.testing.assert_array_equal(
        sd_raw[probe].numpy(), 2.0 * sd_ema[probe].numpy()
    )

    # EMA disabled: ema_g == {} and the default (no --raw) export must fall
    # back to the trained weights — identical tensors to the --raw export.
    run0 = save_run(make_cfg(0.0), "noema_run")
    sd_fb = export(run0, tmp_path / "out_fb")
    assert set(sd_fb) == set(sd_raw)
    for k in sd_raw:
        np.testing.assert_array_equal(sd_fb[k].numpy(), sd_raw[k].numpy())

    # and it still torch-loads strictly
    tg = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=2, r_num=RNUM)
    missing, unexpected = tg.load_state_dict(sd_fb, strict=False)
    assert not unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing)


def test_port_rejects_naming_drift(torch_g):
    sd = dict(torch_g.state_dict())
    sd["h_net1.someday.weight"] = sd["img_net1.img.0.weight"]
    with pytest.raises(ValueError, match="unrecognized"):
        port_gnet(sd)
    del sd["h_net1.someday.weight"], sd["ca_net.fc.bias"]
    with pytest.raises(KeyError, match="ca_net.fc.bias"):
        port_gnet(sd)
