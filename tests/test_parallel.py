"""Distributed-without-a-cluster tests (SURVEY.md §4): the same shard_map
code path on the 8-device virtual CPU mesh. Checks pmean correctness on a
closed-form case, replication invariants of the parallel GAN step, and
bitwise determinism across runs."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from s2i_tpu import config
from s2i_tpu.data import SyntheticGanDataset
from s2i_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from s2i_tpu.train import gan


def tiny_cfg():
    c = config.default_cfg()
    c.TREE.BRANCH_NUM = 2
    c.GAN.GF_DIM = 8
    c.GAN.DF_DIM = 8
    c.GAN.Z_DIM = 16
    c.GAN.EMBEDDING_DIM = 16
    c.TEXT.DIMENSION = 32
    c.DTYPE.COMPUTE = "float32"
    return c


def test_mesh_pmean_matches_global_mean():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    x = jnp.arange(32.0).reshape(32, 1)
    xs = shard_batch(x, mesh)

    f = jax.jit(
        jax.shard_map(
            lambda v: jax.lax.pmean(v.mean(), "data"),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(),
        )
    )
    np.testing.assert_allclose(float(f(xs)), float(x.mean()), rtol=1e-6)


def test_parallel_gan_step_runs_and_stays_replicated():
    cfg = tiny_cfg()
    mesh = make_mesh()
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = {k: v for k, v in ds.batch(np.arange(16)).items() if k != "class_id"}
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    sbatch = shard_batch(batch, mesh)
    rng = replicate_state(jax.random.key(1), mesh)

    pstep = make_parallel_train_step(cfg, models, mesh)
    state2, mets = pstep(state, sbatch, rng)
    assert int(state2.step) == 1
    for k, v in mets.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    # Params must remain identical on every device after the update
    # (pmean-ed grads + redundant update = replication invariant).
    leaf = jax.tree.leaves(state2.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_parallel_step_deterministic():
    cfg = tiny_cfg()
    mesh = make_mesh()
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = {k: v for k, v in ds.batch(np.arange(16)).items() if k != "class_id"}

    def run():
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        state = replicate_state(state, mesh)
        sbatch = shard_batch(batch, mesh)
        pstep = make_parallel_train_step(cfg, models, mesh)
        for _ in range(2):
            state, mets = pstep(state, sbatch, jax.random.key(1))
        return jax.tree.leaves(state.g_params)[0]

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("wrong_pair", ["roll", "class_aware"])
def test_parallel_step_matches_single_device(wrong_pair):
    """The promise of the SPMD formulation (SURVEY.md §4 'psum correctness'):
    N steps of the 8-way sharded train step on a global batch equal N steps
    of the plain single-device step on the same batch — same params, same
    metrics. Holds because noise is per-global-example, BN stats are
    cross-device synced, the wrong-pair roll crosses shards via ppermute,
    and grads are pmean-ed.

    Run under plain SGD: param deltas are then the gradients themselves, so
    equality is checked at fp32 reduction-noise level. (Under Adam the
    bias-corrected first step is ~lr·sign(g), which amplifies reduction-order
    noise in near-zero gradient elements to ±2·lr and proves nothing.)
    One step only: measured step-1 agreement is ≤3e-6 on every leaf, but a
    GAN's fp32 reduction-order noise compounds chaotically by step 2."""
    cfg = tiny_cfg()
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.WRONG_PAIR = wrong_pair
    mesh = make_mesh()
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = dict(ds.batch(np.arange(16)))
    if wrong_pair == "roll":
        batch.pop("class_id")
    state0 = gan.init_state(cfg, models, jax.random.key(0), batch)

    step1 = jax.jit(gan.make_train_step(cfg, models))
    s1, m1 = step1(state0, batch, jax.random.key(1))

    s8 = replicate_state(state0, mesh)
    sbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(cfg, models, mesh)
    s8, m8 = pstep(s8, sbatch, jax.random.key(1))

    def assert_tree_close(a, b, what, atol=1e-5, rtol=1e-4):
        la, lb = jax.tree.leaves_with_path(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        for (path, x), y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x),
                np.asarray(y),
                atol=atol,
                rtol=rtol,
                err_msg=f"{what}{jax.tree_util.keystr(path)}",
            )

    assert_tree_close(s1.g_params, s8.g_params, "g_params")
    assert_tree_close(s1.d_params, s8.d_params, "d_params")
    assert_tree_close(s1.g_stats, s8.g_stats, "g_stats")
    assert_tree_close(s1.ema_g, s8.ema_g, "ema_g")
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), atol=1e-5, rtol=1e-5, err_msg=k
        )


def test_parallel_step_matches_single_device_adam_x64():
    """Optimizer-path coverage of the cross-mesh equality (the SGD variant
    above leaves Adam untested): run the same 8-way == 1-device check under
    JAX_ENABLE_X64 with fp64 params/compute, where Adam's sign-like first
    step can no longer amplify reduction-order noise — so the Adam chain
    (pmean-ed grads → m/v update → param delta → EMA) must agree to ~1e-9.
    Runs in a subprocess because jax_enable_x64 is process-global."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        JAX_ENABLE_X64="1",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
    )
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    script = os.path.join(os.path.dirname(__file__), "_x64_adam_equality.py")
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "X64_ADAM_EQUALITY_OK" in proc.stdout


@pytest.mark.slow
def test_multihost_two_process_step_matches_single_device():
    """The DCN-analog branch (SURVEY.md §5 'Distributed comm backend'):
    two OS processes, each with 4 virtual CPU devices, joined through
    ``maybe_initialize_distributed`` into one 8-device global mesh; one GAN
    step on that mesh must equal the single-device step — the cross-process
    counterpart of test_parallel_step_matches_single_device."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, script],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out}"
        assert "MULTIHOST_OK" in out, f"process {pid}:\n{out}"


def test_parallel_step_builder_resolves_auto_levers_per_device():
    """make_parallel_train_step must freeze still-"auto" perf levers from
    the PER-DEVICE batch itself — direct callers have no resolve-first
    ordering contract. Global b96 on an 8-mesh runs b12 kernels per chip:
    "auto" S2D/D_TRUNK_BATCH resolve ON (per-dev 12 < 32/96), where
    global-batch resolution would wrongly leave S2D off (96 ≥ 32)."""
    cfg = tiny_cfg()
    cfg.TRAIN.BATCH_SIZE = 96
    cfg.GAN.S2D = "auto"
    cfg.GAN.D_TRUNK_BATCH = "auto"
    mesh = make_mesh()
    models = gan.build_models(cfg)  # direct caller: no resolve beforehand
    make_parallel_train_step(cfg, models, mesh)
    assert cfg.GAN.S2D is True
    assert cfg.GAN.D_TRUNK_BATCH is True


def test_shard_batch_rejects_indivisible():
    mesh = make_mesh()
    import pytest

    with pytest.raises(ValueError):
        shard_batch(np.zeros((10, 3)), mesh)


def test_parallel_encoder_step():
    from s2i_tpu.data import SyntheticSpeechDataset
    from s2i_tpu.parallel import make_parallel_encoder_step
    from s2i_tpu.train import encoder as enc_train

    cfg = tiny_cfg()
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.N_CLASSES = 4
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    mesh = make_mesh()
    model = enc_train.build_encoder(cfg)
    ds = SyntheticSpeechDataset(
        num_classes=4, examples_per_class=8, max_frames=32, n_mels=8, emb_dim=32
    )
    batch = ds.batch(np.arange(16))
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    sbatch = shard_batch(batch, mesh)
    pstep = make_parallel_encoder_step(cfg, model, mesh)
    state2, mets = pstep(state, sbatch, jax.random.key(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(mets["loss"]))
    leaf = jax.tree.leaves(state2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.parametrize(
    "policy,s2d",
    [("none", False), ("conv", False), ("conv", True)],
)
def test_gnet_remat_matches_no_remat(policy, s2d):
    """GAN.REMAT is a pure wrapper: identical outputs AND parameter
    gradients for both save-nothing ("none") and save-conv-outputs
    ("conv") checkpoint policies — including composed with the
    space-to-depth top-scale recode (the b<32 production config)."""
    from s2i_tpu.models import GNet
    import jax.numpy as jnp

    z = jax.random.normal(jax.random.key(1), (2, 16))
    c = jax.random.normal(jax.random.key(2), (2, 16))
    g1 = GNet(gf_dim=8, branch_num=2, remat=False, s2d_top=s2d)
    g2 = GNet(
        gf_dim=8, branch_num=2, remat=True, remat_policy=policy, s2d_top=s2d
    )
    v = g1.init(jax.random.key(0), z, c)
    out1 = g1.apply(v, z, c, train=False)
    out2 = g2.apply(v, z, c, train=False)  # same params work (remat is a wrapper)
    np.testing.assert_allclose(
        np.asarray(out1[-1]), np.asarray(out2[-1]), atol=1e-6
    )

    def loss(g, params):
        outs, _ = g.apply(
            {**v, "params": params}, z, c, train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grad1 = jax.grad(lambda p: loss(g1, p))(v["params"])
    grad2 = jax.grad(lambda p: loss(g2, p))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        grad1,
        grad2,
    )


def test_parallel_step_matches_single_device_thin_batch():
    """The product transfer layout (DATA.IMAGE_DTYPE=uint8 +
    DATA.SHIP_SCALES=top) under the 8-way mesh: device-side normalization
    and pyramid expansion run per-shard inside shard_map and must equal the
    single-device step on the identical thin global batch."""
    cfg = tiny_cfg()
    cfg.TRAIN.OPTIMIZER = "sgd"
    mesh = make_mesh()
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(
        branch_num=2, emb_dim=32, image_dtype="uint8", ship_scales="top"
    )
    batch = dict(ds.batch(np.arange(16)))
    batch.pop("class_id")
    assert len(batch["images"]) == 1
    assert batch["images"][0].dtype == np.uint8
    state0 = gan.init_state(cfg, models, jax.random.key(0), batch)

    s1, m1 = jax.jit(gan.make_train_step(cfg, models))(
        state0, batch, jax.random.key(1)
    )
    s8 = replicate_state(state0, mesh)
    sbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(cfg, models, mesh)
    s8, m8 = pstep(s8, sbatch, jax.random.key(1))

    for (path, x), y in zip(
        jax.tree.leaves_with_path((s1.g_params, s1.d_params)),
        jax.tree.leaves((s8.g_params, s8.d_params)),
    ):
        # atol 3e-5: with GAN.S2D on by default, the phase-kernel
        # contractions add fp32 reduction-reorder noise between the meshed
        # and single-device graphs just above the old 1e-5 bound
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=3e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), atol=1e-5, rtol=1e-5, err_msg=k
        )


def test_parallel_sample_matches_single_device():
    """Sharded sampling (pod-scale test-set generation for IS/FID) equals
    single-device sampling exactly: z is drawn per GLOBAL example index."""
    from s2i_tpu.parallel import make_parallel_sample_fn

    cfg = tiny_cfg()
    mesh = make_mesh()
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = dict(ds.batch(np.arange(16)))
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    emb = jnp.asarray(batch["embedding"])

    s_imgs = jax.jit(gan.make_sample_fn(cfg, models))(
        state, emb, jax.random.key(7)
    )
    p_imgs = make_parallel_sample_fn(cfg, models, mesh)(
        replicate_state(state, mesh), emb, jax.random.key(7)
    )
    assert len(s_imgs) == len(p_imgs) == 2
    for a, b in zip(s_imgs, p_imgs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
