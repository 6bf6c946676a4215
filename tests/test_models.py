"""L2 model tests: shape goldens at all scales, GRU-scan correctness vs a
hand-rolled per-step oracle, CA KL math (SURVEY.md §4 "Unit"/"Golden")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2i_tpu.models import (
    SpeechEncoder,
    CANet,
    GNet,
    DNet64,
    DNet128,
    DNet256,
    build_discriminators,
)
from s2i_tpu.models.ca_net import kl_divergence
from s2i_tpu.models.encoder import GRULayer


def test_canet_shapes_and_kl():
    m = CANet(c_dim=128)
    emb = jnp.ones((4, 1024))
    params = m.init(jax.random.key(0), emb, jax.random.key(1))
    c, mu, logvar = m.apply(params, emb, jax.random.key(2))
    assert c.shape == mu.shape == logvar.shape == (4, 128)
    # eval mode: deterministic, c == mu
    c_eval, mu_eval, _ = m.apply(params, emb, train=False)
    np.testing.assert_allclose(np.asarray(c_eval), np.asarray(mu_eval))
    # KL of a standard normal posterior is 0
    zero = jnp.zeros((4, 128))
    assert float(kl_divergence(zero, zero)) == pytest.approx(0.0)
    # KL is positive elsewhere
    assert float(kl_divergence(jnp.ones((4, 128)), zero)) > 0


@pytest.mark.parametrize("branch_num", [1, 2, 3])
def test_gnet_multiscale_shapes(branch_num):
    g = GNet(gf_dim=16, branch_num=branch_num, num_res=2)
    z = jnp.ones((2, 100))
    c = jnp.ones((2, 128))
    variables = g.init(jax.random.key(0), z, c)
    imgs, _ = g.apply(variables, z, c, mutable=["batch_stats"])
    assert len(imgs) == branch_num
    for i, img in enumerate(imgs):
        s = 64 * 2**i
        assert img.shape == (2, s, s, 3)
        assert img.dtype == jnp.float32
        x = np.asarray(img)
        assert x.min() >= -1.0 and x.max() <= 1.0


def test_discriminator_shapes():
    c = jnp.ones((2, 128))
    for size, cls in [(64, DNet64), (128, DNet128), (256, DNet256)]:
        d = cls(df_dim=16, ef_dim=128)
        img = jnp.ones((2, size, size, 3))
        variables = d.init(jax.random.key(0), img, c)
        (cond, uncond), _ = d.apply(variables, img, c, mutable=["batch_stats"])
        assert cond.shape == (2,) and uncond.shape == (2,)
        # unconditional-only call
        (cond_n, uncond2), _ = d.apply(variables, img, None, mutable=["batch_stats"])
        assert cond_n is None and uncond2.shape == (2,)


def test_build_discriminators():
    ds = build_discriminators(3, df_dim=8)
    assert [type(d) for d in ds] == [DNet64, DNet128, DNet256]


def test_gru_scan_matches_manual_loop():
    rng = np.random.default_rng(0)
    b, t, c, h = 2, 7, 5, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 7, [1] * 4 + [0] * 3], dtype=bool))
    layer = GRULayer(hidden=h)
    params = layer.init(jax.random.key(0), x, mask)
    ys = layer.apply(params, x, mask)
    assert ys.shape == (b, t, h)

    # Manual per-step recomputation with numpy
    p = jax.tree.map(np.asarray, params["params"])
    wi, bi = p["input_proj"]["kernel"], p["input_proj"]["bias"]
    wh, bh = p["recurrent_kernel"], p["recurrent_bias"]
    xw = np.asarray(x) @ wi + bi
    hprev = np.zeros((b, h), np.float32)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for step in range(t):
        hw = hprev @ wh + bh
        xr, xz, xn = np.split(xw[:, step], 3, axis=-1)
        hr, hz, hn = np.split(hw, 3, axis=-1)
        r, z = sig(xr + hr), sig(xz + hz)
        n = np.tanh(xn + r * hn)
        hnew = (1 - z) * n + z * hprev
        m = np.asarray(mask)[:, step : step + 1]
        hprev = np.where(m, hnew, hprev)
        np.testing.assert_allclose(
            np.asarray(ys[:, step]), hprev, rtol=1e-5, atol=1e-5
        )

    # Masked tail must not change the last valid hidden state
    ys_np = np.asarray(ys)
    np.testing.assert_allclose(ys_np[1, 4], ys_np[1, 6], rtol=1e-6)


def test_speech_encoder_shapes_and_mask_invariance():
    enc = SpeechEncoder(
        emb_dim=1024, conv_channels=(8, 16), rnn_hidden=32, n_classes=10
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 64, 40)).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 64, [1] * 32 + [0] * 32], dtype=bool))
    variables = enc.init(jax.random.key(0), feats, mask)
    (emb, logits), _ = enc.apply(variables, feats, mask, mutable=["batch_stats"])
    assert emb.shape == (2, 1024) and logits.shape == (2, 10)

    # Padding-content invariance: junk in masked frames must not leak.
    feats2 = np.asarray(feats).copy()
    feats2[1, 32:] = 99.0
    (emb2, _), _ = enc.apply(
        variables, jnp.asarray(feats2), mask, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(emb[1]), np.asarray(emb2[1]), rtol=2e-3, atol=2e-3
    )

    # An ALL-masked row (wav shorter than one window / padding row in a
    # partial batch) must pool to a sane embedding, not blow up through the
    # -1e30 masked-max sentinel (regression: the guard used the clamped
    # denominator, which is never 0).
    mask3 = jnp.asarray(np.array([[1] * 64, [0] * 64], dtype=bool))
    (emb3, _), _ = enc.apply(variables, feats, mask3, mutable=["batch_stats"])
    emb3 = np.asarray(emb3)
    assert np.isfinite(emb3).all()
    assert np.abs(emb3[1]).max() < 1e6, "all-masked row leaked -1e30 sentinel"


def test_gru_matches_torch_oracle():
    """Cross-check the scan GRU against torch.nn.GRU with transplanted
    weights (SURVEY.md §4: torch CPU as an independent second
    implementation)."""
    import torch

    rng = np.random.default_rng(3)
    b, t, c, h = 3, 11, 6, 5
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    mask = jnp.ones((b, t), dtype=bool)

    layer = GRULayer(hidden=h)
    params = layer.init(jax.random.key(1), jnp.asarray(x), mask)
    ys = np.asarray(layer.apply(params, jnp.asarray(x), mask))

    p = jax.tree.map(np.asarray, params["params"])
    wi, bi = p["input_proj"]["kernel"], p["input_proj"]["bias"]
    wh, bh = p["recurrent_kernel"], p["recurrent_bias"]

    tg = torch.nn.GRU(c, h, batch_first=True)
    with torch.no_grad():
        # torch gate order is (r, z, n) like ours; layouts are [3H, in]
        tg.weight_ih_l0.copy_(torch.from_numpy(wi.T.copy()))
        tg.weight_hh_l0.copy_(torch.from_numpy(wh.T.copy()))
        tg.bias_ih_l0.copy_(torch.from_numpy(bi.copy()))
        tg.bias_hh_l0.copy_(torch.from_numpy(bh.copy()))
        out, _ = tg(torch.from_numpy(x))
    np.testing.assert_allclose(ys, out.numpy(), rtol=1e-4, atol=1e-5)


def test_downblock_matches_torch_conv():
    """Cross-check the NHWC 4x4/stride-2 D conv against torch's NCHW conv
    with transplanted weights (padding/orientation fidelity)."""
    import torch
    from s2i_tpu.models.layers import DownBlock

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    blk = DownBlock(features=8, use_bn=False)
    v = blk.init(jax.random.key(0), jnp.asarray(x), train=False)
    out = np.asarray(blk.apply(v, jnp.asarray(x), train=False))

    w = np.asarray(v["params"]["Conv_0"]["kernel"])  # HWIO
    tc = torch.nn.Conv2d(3, 8, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ty = torch.nn.functional.leaky_relu(tc(tx), 0.2)
    np.testing.assert_allclose(
        out, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def _bn_eval_torch(bn, scale, bias, mean, var):
    import torch

    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.eval()
    return bn


def test_upblock_glu_matches_torch():
    """UpBlockGLU (nearest x2 + conv3x3 + BN + GLU) vs the equivalent torch
    NCHW stack with transplanted weights (eval-mode BN)."""
    import torch
    from s2i_tpu.models.layers import UpBlockGLU

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    blk = UpBlockGLU(features=4)
    v = blk.init(jax.random.key(0), jnp.asarray(x), train=True)
    # fabricate non-trivial BN stats so eval mode is a real test
    stats = jax.tree.map(np.asarray, v["batch_stats"])
    stats["BatchNorm_0"]["BatchNorm_0"]["mean"] = (
        rng.standard_normal(8).astype(np.float32) * 0.1
    )
    stats["BatchNorm_0"]["BatchNorm_0"]["var"] = (
        1.0 + 0.1 * rng.standard_normal(8).astype(np.float32) ** 2
    )
    v = {"params": v["params"], "batch_stats": jax.tree.map(jnp.asarray, stats)}
    out = np.asarray(blk.apply(v, jnp.asarray(x), train=False))

    p = jax.tree.map(np.asarray, v["params"])
    bnp = jax.tree.map(np.asarray, v["batch_stats"])
    w = p["UpConv3x3_0"]["kernel"]  # HWIO, out=8
    bn_tree = bnp["BatchNorm_0"]["BatchNorm_0"]
    bn_params = p["BatchNorm_0"]["BatchNorm_0"]

    conv = torch.nn.Conv2d(6, 8, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
    bn = _bn_eval_torch(
        torch.nn.BatchNorm2d(8, eps=1e-5),
        bn_params["scale"], bn_params["bias"], bn_tree["mean"], bn_tree["var"],
    )
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ty = torch.nn.functional.interpolate(tx, scale_factor=2, mode="nearest")
        ty = bn(conv(ty))
        ty = torch.nn.functional.glu(ty, dim=1)
    np.testing.assert_allclose(
        out, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_resblock_glu_matches_torch():
    import torch
    from s2i_tpu.models.layers import ResBlockGLU

    rng = np.random.default_rng(1)
    c = 4
    x = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
    blk = ResBlockGLU(features=c)
    v = blk.init(jax.random.key(0), jnp.asarray(x), train=True)
    out = np.asarray(blk.apply(v, jnp.asarray(x), train=False))

    p = jax.tree.map(np.asarray, v["params"])
    s = jax.tree.map(np.asarray, v["batch_stats"])

    def torch_conv(key_conv, cin, cout):
        w = p[key_conv]["Conv_0"]["kernel"]  # HWIO
        conv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
        return conv

    def torch_bn(key_bn, ch):
        return _bn_eval_torch(
            torch.nn.BatchNorm2d(ch, eps=1e-5),
            p[key_bn]["BatchNorm_0"]["scale"],
            p[key_bn]["BatchNorm_0"]["bias"],
            s[key_bn]["BatchNorm_0"]["mean"],
            s[key_bn]["BatchNorm_0"]["var"],
        )

    conv_keys = ["Conv3x3_0", "Conv3x3_1"]
    bn_keys = ["BatchNorm_0", "BatchNorm_1"]
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        r = torch_bn(bn_keys[0], 2 * c)(torch_conv(conv_keys[0], c, 2 * c)(tx))
        r = torch.nn.functional.glu(r, dim=1)
        r = torch_bn(bn_keys[1], c)(torch_conv(conv_keys[1], c, c)(r))
        ty = tx + r
    np.testing.assert_allclose(
        out, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_d_heads_match_torch():
    """Conditional+unconditional D heads vs torch NCHW with transplanted
    weights: condition tiling, channel concat, 3x3 BN block, 4x4 VALID conv."""
    import torch
    from s2i_tpu.models.discriminator import _Heads

    rng = np.random.default_rng(2)
    code = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    cvec = rng.standard_normal((2, 6)).astype(np.float32)
    heads = _Heads(df_dim=2, b_condition=True)  # joint block -> 16 channels
    v = heads.init(jax.random.key(0), jnp.asarray(code), jnp.asarray(cvec),
                   train=True)
    cond, uncond = heads.apply(
        v, jnp.asarray(code), jnp.asarray(cvec), train=False
    )

    p = jax.tree.map(np.asarray, v["params"])
    s = jax.tree.map(np.asarray, v["batch_stats"])

    def t_conv(w, cin, cout, k, stride=1, padding=0, bias=None):
        conv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                               bias=bias is not None)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
            if bias is not None:
                conv.bias.copy_(torch.from_numpy(bias))
        return conv

    tcode = torch.from_numpy(code.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # unconditional: 4x4 VALID conv (has bias in flax default)
        wu = p["uncond_logit"]["kernel"]
        cu = t_conv(wu, 16, 1, 4, stride=4, bias=p["uncond_logit"]["bias"])
        t_uncond = cu(tcode).reshape(2)

        # conditional: tile cvec over 4x4, concat channels, 3x3 BN LReLU, 4x4
        tc = torch.from_numpy(cvec).reshape(2, 6, 1, 1).expand(2, 6, 4, 4)
        x = torch.cat([tcode, tc], dim=1)
        wj = p["joint"]["Conv3x3_0"]["Conv_0"]["kernel"]
        x = t_conv(wj, 22, 16, 3, padding=1)(x)
        bn = _bn_eval_torch(
            torch.nn.BatchNorm2d(16, eps=1e-5),
            p["joint"]["BatchNorm_0"]["BatchNorm_0"]["scale"],
            p["joint"]["BatchNorm_0"]["BatchNorm_0"]["bias"],
            s["joint"]["BatchNorm_0"]["BatchNorm_0"]["mean"],
            s["joint"]["BatchNorm_0"]["BatchNorm_0"]["var"],
        )
        x = torch.nn.functional.leaky_relu(bn(x), 0.2)
        wc = p["cond_logit"]["kernel"]
        t_cond = t_conv(wc, 16, 1, 4, stride=4, bias=p["cond_logit"]["bias"])(
            x
        ).reshape(2)

    np.testing.assert_allclose(np.asarray(uncond), t_uncond.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cond), t_cond.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "mode", ["fused", "fused4", "transpose", "transpose_cvjp"]
)
def test_upconv3x3_modes_match_naive(mode):
    """Every UpConv3x3 formulation (GAN.UPSAMPLE_MODE) is the same math as
    nearest-2x upsample + 3x3 SAME conv: outputs AND gradients agree on the
    shared [3,3,Cin,Cout] kernel, including odd sizes/boundaries."""
    from s2i_tpu.models.layers import UpConv3x3

    rng = np.random.default_rng(7)
    for h, w, cin, cout in [(4, 4, 16, 8), (8, 6, 5, 12)]:
        x = jnp.asarray(rng.standard_normal((3, h, w, cin)).astype(np.float32))
        fused = UpConv3x3(cout, mode=mode)
        naive = UpConv3x3(cout, mode="naive")
        v = fused.init(jax.random.key(0), x)
        y_f = fused.apply(v, x)
        y_n = naive.apply(v, x)
        assert y_f.shape == (3, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_n), rtol=2e-5, atol=2e-5
        )

        def make_loss(mod):
            def f(params, x):
                return jnp.sum(mod.apply({"params": params}, x) ** 2)

            return f

        gf = jax.grad(make_loss(fused), argnums=(0, 1))(v["params"], x)
        gn = jax.grad(make_loss(naive), argnums=(0, 1))(v["params"], x)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gn)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


def test_space_to_depth_roundtrip_and_layout():
    from s2i_tpu.models.layers import depth_to_space, space_to_depth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 5)).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 3, 4, 20)
    # phase-major channel layout: out[..., (2p+q)*C + c] = x[b, 2i+p, 2j+q, c]
    np.testing.assert_array_equal(
        np.asarray(y[0, 1, 2, (2 * 1 + 0) * 5 + 3]), np.asarray(x[0, 3, 4, 3])
    )
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))


def test_upconv3x3_s2d_mode_is_s2d_of_naive():
    """UpConv3x3 's2d' output == space_to_depth of the naive output on the
    shared kernel — values and gradients (the GAN.S2D up-block core)."""
    from s2i_tpu.models.layers import UpConv3x3, space_to_depth

    rng = np.random.default_rng(7)
    for h, w, cin, cout in [(4, 4, 16, 8), (8, 6, 5, 12)]:
        x = jnp.asarray(rng.standard_normal((3, h, w, cin)).astype(np.float32))
        s2d = UpConv3x3(cout, mode="s2d")
        naive = UpConv3x3(cout, mode="naive")
        v = s2d.init(jax.random.key(0), x)
        y_s = s2d.apply(v, x)
        assert y_s.shape == (3, h, w, 4 * cout)
        y_n = space_to_depth(naive.apply(v, x))
        np.testing.assert_allclose(
            np.asarray(y_s), np.asarray(y_n), rtol=2e-5, atol=2e-5
        )
        gs = jax.grad(lambda p, x: jnp.sum(s2d.apply({"params": p}, x) ** 2),
                      argnums=(0, 1))(v["params"], x)
        gn = jax.grad(
            lambda p, x: jnp.sum(
                space_to_depth(naive.apply({"params": p}, x)) ** 2
            ),
            argnums=(0, 1),
        )(v["params"], x)
        for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gn)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


def test_upblock_glu_s2d_out_matches_normal():
    """UpBlockGLU(s2d_out=True) == space_to_depth(UpBlockGLU(...)) with the
    SAME param tree, in train mode — outputs and updated BN running stats
    (phase→width fold makes the BN statistics identical)."""
    from s2i_tpu.models.layers import UpBlockGLU, space_to_depth

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 10)).astype(np.float32))
    normal = UpBlockGLU(8, mode="naive")
    s2d = UpBlockGLU(8, mode="naive", s2d_out=True)
    v = normal.init(jax.random.key(0), x)
    y_n, vars_n = normal.apply(v, x, train=True, mutable=["batch_stats"])
    y_s, vars_s = s2d.apply(v, x, train=True, mutable=["batch_stats"])
    assert y_s.shape == (4, 6, 6, 32)
    np.testing.assert_allclose(
        np.asarray(y_s), np.asarray(space_to_depth(y_n)), rtol=2e-5, atol=2e-5
    )
    for a, b in zip(
        jax.tree.leaves(vars_n["batch_stats"]),
        jax.tree.leaves(vars_s["batch_stats"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_conv3x3_s2d_matches_normal():
    """Conv3x3(s2d=True) on the s2d input == s2d of the normal conv (same
    kernel param at the same path) — the GAN.S2D to-RGB head."""
    from s2i_tpu.models.layers import Conv3x3, space_to_depth

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 6)).astype(np.float32))
    normal = Conv3x3(4)
    s2d = Conv3x3(4, s2d=True)
    v = normal.init(jax.random.key(0), x)
    y_n = space_to_depth(normal.apply(v, x))
    y_s = s2d.apply(v, space_to_depth(x))
    assert y_s.shape == y_n.shape
    np.testing.assert_allclose(
        np.asarray(y_s), np.asarray(y_n), rtol=2e-5, atol=2e-5
    )


def test_downblock_s2d_in_matches_normal():
    """DownBlock(s2d_in=True) on the s2d image == the normal 4×4 stride-2
    DownBlock on the interleaved image, same params (GAN.S2D D-input)."""
    from s2i_tpu.models.layers import DownBlock, space_to_depth

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 3)).astype(np.float32))
    normal = DownBlock(8, use_bn=False)
    s2d = DownBlock(8, use_bn=False, s2d_in=True)
    v = normal.init(jax.random.key(0), x)
    y_n = normal.apply(v, x, train=True)
    y_s = s2d.apply(v, space_to_depth(x), train=True)
    assert y_s.shape == y_n.shape == (2, 8, 6, 8)
    np.testing.assert_allclose(
        np.asarray(y_s), np.asarray(y_n), rtol=2e-5, atol=2e-5
    )


def test_gnet_s2d_top_matches_normal():
    """Full generator forward is invariant to GAN.S2D when the caller asks
    for standard-layout output (sampling path), same param tree."""
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    g_s = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="transpose", s2d_top=True)
    g_n = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="transpose")
    v = g_s.init(jax.random.key(1), z, c, train=False)
    outs_s = g_s.apply(v, z, c, train=False)
    outs_n = g_n.apply(v, z, c, train=False)
    for a, b in zip(outs_s, outs_n):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
    # s2d_out=True returns the top image in s2d layout, exactly
    from s2i_tpu.models.layers import space_to_depth

    outs_raw = g_s.apply(v, z, c, train=False, s2d_out=True)
    np.testing.assert_allclose(
        np.asarray(outs_raw[-1]),
        np.asarray(space_to_depth(outs_n[-1])),
        rtol=1e-4,
        atol=1e-4,
    )


def test_gnet_s2d_mid_matches_normal():
    """Full generator forward is invariant to GAN.S2D_MID (middle-stage s2d
    recode; same param tree), alone and stacked with s2d_top."""
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    g_n = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="transpose")
    v = g_n.init(jax.random.key(2), z, c, train=False)
    outs_n = g_n.apply(v, z, c, train=False)
    for kwargs in ({"s2d_mid": True}, {"s2d_mid": True, "s2d_top": True}):
        g_m = GNet(
            gf_dim=8, branch_num=3, num_res=1, up_mode="transpose", **kwargs
        )
        outs_m = g_m.apply(v, z, c, train=False)
        for a, b in zip(outs_m, outs_n):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
    # s2d_out=True returns the MID image in s2d layout, exactly
    from s2i_tpu.models.layers import space_to_depth

    g_m = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="transpose", s2d_mid=True)
    outs_raw = g_m.apply(v, z, c, train=False, s2d_out=True)
    np.testing.assert_allclose(
        np.asarray(outs_raw[1]),
        np.asarray(space_to_depth(outs_n[1])),
        rtol=1e-4,
        atol=1e-4,
    )
    assert outs_raw[-1].shape == outs_n[-1].shape  # top untouched by S2D_MID


def test_gnet_fused_upsample_matches_naive():
    """Full generator forward is invariant to GAN.UPSAMPLE_MODE (same param
    tree, checkpoint-switchable)."""
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    g_f = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="fused")
    g_n = GNet(gf_dim=8, branch_num=3, num_res=1, up_mode="naive")
    v = g_f.init(jax.random.key(1), z, c, train=False)
    outs_f = g_f.apply(v, z, c, train=False)
    outs_n = g_n.apply(v, z, c, train=False)
    for a, b in zip(outs_f, outs_n):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_grouped_batchnorm_matches_flax_batchnorm():
    """GroupedBatchNorm(groups=1) reproduces nn.BatchNorm exactly — outputs
    AND updated running stats, train and eval, fp32 and bf16 — so swapping it
    in under the BatchNorm wrapper changes nothing for existing checkpoints."""
    from flax import linen as nn
    from s2i_tpu.models.layers import GroupedBatchNorm, bn_scale_init

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(jax.random.key(0), (6, 8, 8, 5)).astype(dtype)
        ref = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=dtype, scale_init=bn_scale_init,
        )
        ours = GroupedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype)
        rv = ref.init(jax.random.key(1), x, use_running_average=False)
        ov = ours.init(jax.random.key(1), x, use_running_average=False)
        jax.tree.map(np.testing.assert_array_equal, rv, ov)

        ry, rvars = ref.apply(
            rv, x, use_running_average=False, mutable=["batch_stats"]
        )
        oy, ovars = ours.apply(
            ov, x, use_running_average=False, mutable=["batch_stats"]
        )
        np.testing.assert_array_equal(np.asarray(ry), np.asarray(oy))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            ),
            rvars, ovars,
        )
        # eval path on the updated running stats
        rv2 = {"params": rv["params"], **rvars}
        ov2 = {"params": ov["params"], **ovars}
        ry2 = ref.apply(rv2, x, use_running_average=True)
        oy2 = ours.apply(ov2, x, use_running_average=True)
        np.testing.assert_allclose(
            np.asarray(ry2, np.float32), np.asarray(oy2, np.float32),
            rtol=2e-6, atol=1e-6,
        )


def test_grouped_batchnorm_groups_equal_sequential_calls():
    """groups=G on a stacked batch == G sequential calls on the segments:
    same outputs and same final running stats (sequential momentum folds)."""
    from s2i_tpu.models.layers import GroupedBatchNorm

    m = GroupedBatchNorm()
    a = jax.random.normal(jax.random.key(0), (4, 8, 8, 5))
    b = jax.random.normal(jax.random.key(1), (4, 8, 8, 5)) * 2.0 + 1.0
    v = m.init(jax.random.key(2), a, use_running_average=False)

    ya, v1 = m.apply(v, a, use_running_average=False, mutable=["batch_stats"])
    yb, v2 = m.apply(
        {"params": v["params"], **v1}, b,
        use_running_average=False, mutable=["batch_stats"],
    )
    yg, vg = m.apply(
        v, jnp.concatenate([a, b], axis=0),
        use_running_average=False, groups=2, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(yg[:4]), np.asarray(ya), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(yg[4:]), np.asarray(yb), rtol=1e-6, atol=1e-6
    )
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-6, atol=1e-6
        ),
        v2["batch_stats"], vg["batch_stats"],
    )


def test_d_trunk_batch_matches_sequential_train_logits():
    """trunk_batch=True runs real|fake (and the three head pairings) in one
    dispatch with per-segment BN stats — all six logits and the updated
    batch_stats must match the sequential path."""
    b, scale = 4, 64
    real = jax.random.normal(jax.random.key(0), (b, scale, scale, 3))
    fake = jax.random.normal(jax.random.key(1), (b, scale, scale, 3))
    c = jax.random.normal(jax.random.key(2), (b, 16))
    c_wrong = jnp.roll(c, 1, axis=0)

    d_seq = DNet64(df_dim=8, ef_dim=16, trunk_batch=False)
    d_bat = DNet64(df_dim=8, ef_dim=16, trunk_batch=True)
    v = d_seq.init(jax.random.key(3), real, c)

    logits_seq, vs = d_seq.apply(
        v, real, fake, c, c_wrong, method="train_logits",
        mutable=["batch_stats"],
    )
    logits_bat, vb = d_bat.apply(
        v, real, fake, c, c_wrong, method="train_logits",
        mutable=["batch_stats"],
    )
    for ls, lb in zip(logits_seq, logits_bat):
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lb), rtol=2e-5, atol=2e-5
        )
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=2e-5, atol=2e-5
        ),
        vs["batch_stats"], vb["batch_stats"],
    )
