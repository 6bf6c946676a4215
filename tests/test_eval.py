"""Metric-plumbing tests with stub classifiers (SURVEY.md §4 "Eval"):
FID(X,X)=0, IS of uniform logits = 1, retrieval on identical sets = perfect.
The Inception pass itself is exercised at tiny batch on random weights."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from s2i_tpu.eval import (
    fid_from_stats,
    gaussian_stats,
    inception_score_from_probs,
    retrieval_metrics,
)


def test_fid_identical_sets_is_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    mu, sig = gaussian_stats(x)
    assert fid_from_stats(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_fid_shifted_gaussian_matches_closed_form():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20000, 8))
    y = x + 2.0  # same covariance, shifted mean: FID = ||Δμ||² = 8·4
    f = fid_from_stats(*gaussian_stats(x), *gaussian_stats(y))
    assert f == pytest.approx(32.0, rel=0.01)


def test_fid_detects_scale_difference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20000, 8))
    y = 2.0 * rng.normal(size=(20000, 8))
    # closed form for isotropic: d(tr(1) + tr(4) - 2 tr(sqrt(4·I))) = 8(1+4-4)
    f = fid_from_stats(*gaussian_stats(x), *gaussian_stats(y))
    assert f == pytest.approx(8.0, rel=0.05)


def test_is_uniform_is_one_and_confident_is_high():
    n, c = 1000, 10
    uniform = np.full((n, c), 1.0 / c)
    mean, std = inception_score_from_probs(uniform, splits=10)
    assert mean == pytest.approx(1.0, abs=1e-6)
    # one-hot over evenly used classes: IS == number of classes
    onehot = np.eye(c)[np.arange(n) % c]
    mean2, _ = inception_score_from_probs(onehot, splits=10)
    assert mean2 == pytest.approx(c, rel=1e-3)


def test_retrieval_perfect_and_random():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 32))
    m = retrieval_metrics(x, x)
    assert m["q2t"]["r@1"] == 1.0 and m["t2q"]["r@1"] == 1.0
    y = rng.normal(size=(50, 32))
    m2 = retrieval_metrics(x, y)
    assert m2["q2t"]["r@1"] < 0.5


def test_retrieval_multi_positive_map_closed_form():
    """True AP with several positives per query (10-captions-per-image
    protocol): positives at ranks 1 and 3 → AP = (1/1 + 2/3)/2."""
    from s2i_tpu.eval.retrieval import _rank_metrics

    sim = np.array([[3.0, 2.0, 1.0, 0.0]])
    pos = np.array([[True, False, True, False]])
    m = _rank_metrics(sim, pos, ks=(1, 2))
    assert m["map"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    assert m["mrr"] == 1.0 and m["r@1"] == 1.0 and m["medr"] == 1.0
    # positive only at rank 2: r@1=0, mrr=1/2, AP=1/2
    m2 = _rank_metrics(
        np.array([[3.0, 2.0, 1.0]]), np.array([[False, True, False]]), ks=(1, 2)
    )
    assert m2["map"] == pytest.approx(0.5)
    assert m2["mrr"] == pytest.approx(0.5)
    assert m2["r@1"] == 0.0 and m2["r@2"] == 1.0


def test_retrieval_grouped_ids():
    """Grouped mode: every caption of the query's image counts as a
    positive. Group-prototype embeddings (orthogonal one-hots) rank all
    same-group targets first → perfect mAP both directions."""
    n_groups, per = 6, 4
    ids = np.repeat(np.arange(n_groups), per)
    emb = np.eye(n_groups, 32)[ids] + 0.01 * np.random.default_rng(
        0
    ).normal(size=(n_groups * per, 32))
    m = retrieval_metrics(emb, emb, ks=(1, per), query_ids=ids, target_ids=ids)
    for d in ("q2t", "t2q"):
        assert m[d]["r@1"] == 1.0
        assert m[d]["map"] == pytest.approx(1.0)
    # mismatched-arg validation
    with pytest.raises(ValueError):
        retrieval_metrics(emb, emb, query_ids=ids)
    with pytest.raises(ValueError):
        retrieval_metrics(emb[:5], emb[:4])


def test_retrieval_cli_grouped_vs_flat_pickles(tmp_path, capsys):
    """scripts/eval.py --retrieval with a [N,caps,D] speech pickle against
    an [N,D] image pickle: rows must align by GROUP id, not row count —
    naive min-length truncation strands target groups with no positive
    query and crashes the t2q direction."""
    import importlib.util
    import pickle
    import types

    spec = importlib.util.spec_from_file_location(
        "s2i_eval_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "eval.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    n_img, caps, dim = 6, 10, 16
    rng = np.random.default_rng(3)
    proto = np.eye(n_img, dim)
    speech = proto[:, None, :] + 0.01 * rng.normal(size=(n_img, caps, dim))
    image = proto + 0.01 * rng.normal(size=(n_img, dim))
    qp, tp = str(tmp_path / "q.pkl"), str(tmp_path / "t.pkl")
    with open(qp, "wb") as f:
        pickle.dump(speech.astype(np.float32), f)
    with open(tp, "wb") as f:
        pickle.dump(image.astype(np.float32), f)

    cli.retrieval_main(types.SimpleNamespace(retrieval=[qp, tp]))
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    for d in ("q2t", "t2q"):
        assert m[d]["r@1"] == 1.0


def test_eval_cli_extract_dir_streams_and_normalizes_sizes(tmp_path):
    """scripts/eval.py extract_dir: heterogeneously sized real photo dirs
    (CUB/Oxford) must not crash np.stack — mismatched images are resized to
    the first image's canvas — and decoding must stream per batch chunk
    (the 30k-image protocol is ~24 GB as one float32 stack)."""
    import importlib.util

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "s2i_eval_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "eval.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    rng = np.random.default_rng(0)
    sizes = [(64, 64), (48, 80), (64, 64), (32, 32), (64, 64)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(tmp_path / f"img_{i}.png")

    class FakeExtractor:
        def __init__(self):
            self.batches = []

        def extract(self, images, batch_size):
            self.batches.append(images.shape)
            n = images.shape[0]
            return np.zeros((n, 2048), np.float32), np.zeros((n, 10), np.float32)

    ex = FakeExtractor()
    pool, logits, n = cli.extract_dir(ex, str(tmp_path), batch=2)
    assert n == len(sizes) and pool.shape == (n, 2048)
    # every chunk uniform at the first image's canvas; at most batch-size
    # images were ever materialized at once
    assert all(s[1:] == (64, 64, 3) and s[0] <= 2 for s in ex.batches)
    assert len(ex.batches) == 3

    # explicit canvas override
    ex2 = FakeExtractor()
    cli.extract_dir(ex2, str(tmp_path), batch=5, img_size=32)
    assert ex2.batches[0][1:] == (32, 32, 3)


def test_inception_forward_and_metrics_smoke():
    from s2i_tpu.eval import InceptionFeatures, fid_score, inception_score

    ex = InceptionFeatures(num_classes=16, image_size=75)
    rng = np.random.default_rng(0)
    imgs_a = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    imgs_b = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    pool, logits = ex.extract(imgs_a, batch_size=4)
    assert pool.shape == (8, 2048) and logits.shape == (8, 16)
    assert np.isfinite(pool).all() and np.isfinite(logits).all()
    f_same = fid_score(imgs_a, imgs_a, ex, batch_size=4)
    f_diff = fid_score(imgs_a, imgs_b, ex, batch_size=4)
    assert f_same == pytest.approx(0.0, abs=1e-3)
    assert f_diff >= 0
    mean, std = inception_score(imgs_a, ex, splits=2, batch_size=4)
    assert mean >= 1.0 and np.isfinite(std)


def test_extract_pipelined_identical_to_single_dispatch():
    """The depth-1 dispatch pipeline in InceptionFeatures.extract must be
    a pure scheduling change: multi-batch extraction (with a padded tail)
    returns byte-identical features to a single-dispatch pass."""
    from s2i_tpu.eval import InceptionFeatures

    ex = InceptionFeatures(num_classes=8, image_size=75)
    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (10, 64, 64, 3)).astype(np.float32)
    p_multi, l_multi = ex.extract(imgs, batch_size=4)  # 3 batches, pad=2
    assert p_multi.shape == (10, 2048) and l_multi.shape == (10, 8)
    # serial oracle: the same per-batch program dispatches, forced one at a
    # time (same batch shape → same compiled program → bitwise features;
    # a different batch_size would be a DIFFERENT XLA program whose fusion
    # differs in the last ulp, so that is deliberately not compared here)
    pools, logits = [], []
    for i in range(0, 10, 4):
        b = imgs[i : i + 4]
        pad = 4 - b.shape[0]
        if pad:
            b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
        p, l = ex._fwd(ex.variables, jnp.asarray(b))
        p, l = np.asarray(p), np.asarray(l)
        pools.append(p[: 4 - pad])
        logits.append(l[: 4 - pad])
    np.testing.assert_array_equal(p_multi, np.concatenate(pools))
    np.testing.assert_array_equal(l_multi, np.concatenate(logits))


def test_preprocess_matches_pytorch_fid_protocol():
    """EVAL protocol parity (SURVEY.md §7 hard-part 3): with
    ``quantize_input=True`` the on-device preprocessing must reproduce
    pytorch-fid's canonical path — image saved as uint8 PNG, read back to
    [0,1], bilinearly upscaled to 299 px with align_corners=False, scaled
    to [-1,1] — verified against torch CPU directly."""
    import torch
    import torch.nn.functional as F

    from s2i_tpu.eval.features import preprocess
    from s2i_tpu.utils.images import to_uint8

    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(preprocess(jnp.asarray(imgs), 299, quantize_input=True))

    u8 = to_uint8(imgs)  # what PNG round-tripping quantizes to
    t = torch.from_numpy(u8).permute(0, 3, 1, 2).float() / 255.0
    t = F.interpolate(
        t, size=(299, 299), mode="bilinear", align_corners=False
    )
    want = (2.0 * t - 1.0).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-5)

    # the knob is not a no-op on continuous generator outputs
    exact = np.asarray(preprocess(jnp.asarray(imgs), 299))
    assert np.abs(exact - ours).max() > 1e-4
    # ...but IS a no-op on images already decoded from disk (uint8 source):
    # the dir-based CLI path needs no flag to be protocol-exact
    from_disk = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(
        np.asarray(preprocess(jnp.asarray(from_disk), 299, quantize_input=True)),
        np.asarray(preprocess(jnp.asarray(from_disk), 299)),
        atol=1e-6,
    )


def test_torch_weight_mapper_shapes():
    from s2i_tpu.eval.weights import load_torch_inception

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros((), np.int64),
        "Mixed_5b.branch5x5_1.conv.weight": np.zeros((48, 192, 1, 1), np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),
        "fc.bias": np.zeros((1000,), np.float32),
        "AuxLogits.conv0.conv.weight": np.zeros((128, 768, 1, 1), np.float32),
    }
    out = load_torch_inception(sd)
    p, s = out["params"], out["batch_stats"]
    assert p["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert s["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
    assert p["Mixed_5b"]["branch5x5_1"]["conv"]["kernel"].shape == (1, 1, 192, 48)
    assert p["fc"]["kernel"].shape == (2048, 1000)
    assert "AuxLogits" not in p


def test_inception_finetune_step_learns():
    import jax
    import jax.numpy as jnp
    from s2i_tpu.eval.finetune import (
        init_inception_state,
        make_inception_train_step,
    )

    # tiny images, 2 classes with an obvious color feature
    rng = np.random.default_rng(0)
    n = 16
    labels = np.arange(n) % 2
    imgs = np.zeros((n, 32, 32, 3), np.float32)
    imgs[labels == 0, :, :, 0] = 0.8
    imgs[labels == 1, :, :, 2] = 0.8
    imgs += 0.05 * rng.standard_normal(imgs.shape).astype(np.float32)

    model, state = init_inception_state(
        2, jax.random.key(0), lr=1e-3, image_size=75
    )
    step = make_inception_train_step(model, lr=1e-3, image_size=75)
    for _ in range(6):
        state, mets = step(state, jnp.asarray(imgs), jnp.asarray(labels))
    assert np.isfinite(float(mets["ce"]))
    assert float(mets["acc"]) >= 0.75, float(mets["acc"])


def test_torch_weight_mapper_full_roundtrip():
    """Structural coverage: reverse-generate a torch-layout state_dict from
    the Flax model's own variables, map it back, and require the result to
    be tree-identical — proves the mapper covers EVERY layer of the model
    and uses the right layout transforms."""
    import jax
    import jax.numpy as jnp

    from s2i_tpu.eval.weights import load_torch_inception
    from s2i_tpu.models.inception import InceptionV3

    model = InceptionV3(num_classes=7)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 75, 75, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}

    def walk(ptree, stree, prefix):
        if "conv" in ptree and "bn" in ptree:
            sd[prefix + "conv.weight"] = np.asarray(
                ptree["conv"]["kernel"]
            ).transpose(3, 2, 0, 1)
            sd[prefix + "bn.weight"] = np.asarray(ptree["bn"]["scale"])
            sd[prefix + "bn.bias"] = np.asarray(ptree["bn"]["bias"])
            sd[prefix + "bn.running_mean"] = np.asarray(stree["bn"]["mean"])
            sd[prefix + "bn.running_var"] = np.asarray(stree["bn"]["var"])
            return
        for k in ptree:
            walk(ptree[k], stree.get(k, {}), prefix + k + ".")

    for top in params:
        if top == "fc":
            sd["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
            sd["fc.bias"] = np.asarray(params["fc"]["bias"])
        else:
            walk(params[top], stats.get(top, {}), top + ".")

    # Real torch.Tensor leaves, exactly what torch.load() yields — exercises
    # the tensor->numpy conversion path in the mapper, not just ndarray
    # passthrough.
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    out = load_torch_inception(sd, num_classes=7)

    flat_a = jax.tree.leaves_with_path({"params": params, "batch_stats": stats})
    flat_b = jax.tree.leaves_with_path(out)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, (
        f"missing: {paths_a - paths_b}\nextra: {paths_b - paths_a}"
    )
    key = lambda item: jax.tree_util.keystr(item[0])  # noqa: E731
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=key), sorted(flat_b, key=key)):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(pa)
        )


def test_sharded_inception_extraction_matches_single_device():
    """SPMD eval over the 8-device mesh must produce the same features as
    the single-device path (BASELINE's pod-sharded IS/FID eval)."""
    from s2i_tpu.eval import InceptionFeatures
    from s2i_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    single = InceptionFeatures(num_classes=8, image_size=75)
    sharded = InceptionFeatures(
        variables=single.variables, num_classes=8, image_size=75,
        mesh=make_mesh(),
    )
    p1, l1 = single.extract(imgs, batch_size=8)
    p2, l2 = sharded.extract(imgs, batch_size=8)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)
