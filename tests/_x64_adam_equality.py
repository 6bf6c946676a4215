"""Subprocess body for the Adam cross-mesh equality test (run with
JAX_ENABLE_X64=1 on the 8-device CPU mesh — see test_parallel.py).

Under fp64 end-to-end (compute dtype float64 + the whole train state cast
to float64) the reduction-order noise floor drops from ~1e-7 to ~1e-15,
which kills the objection that Adam's sign-like first step amplifies fp32
pmean noise to ±2·lr: any surviving difference between the 8-way sharded
step and the single-device step is a real SPMD-formulation bug, not
arithmetic. Complements the SGD fp32 variant in test_parallel.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

from s2i_tpu import config
from s2i_tpu.data import SyntheticGanDataset
from s2i_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from s2i_tpu.train import gan


def main():
    cfg = config.default_cfg()
    cfg.TREE.BRANCH_NUM = 2
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.GAN.Z_DIM = 16
    cfg.GAN.EMBEDDING_DIM = 16
    cfg.TEXT.DIMENSION = 32
    cfg.DTYPE.COMPUTE = "float64"
    cfg.TRAIN.OPTIMIZER = "adam"

    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = dict(ds.batch(np.arange(16)))
    batch.pop("class_id")
    state0 = gan.init_state(cfg, models, jax.random.key(0), batch)
    # Flax initializes params in its default param_dtype (fp32); promote the
    # full state so grads, Adam moments, EMA, and BN stats all live in fp64.
    state0 = jax.tree.map(
        lambda x: (
            x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x
        ),
        state0,
    )

    s1, m1 = jax.jit(gan.make_train_step(cfg, models))(
        state0, batch, jax.random.key(1)
    )

    mesh = make_mesh()
    pstep = make_parallel_train_step(cfg, models, mesh)
    s8, m8 = pstep(
        replicate_state(state0, mesh),
        shard_batch(batch, mesh),
        jax.random.key(1),
    )

    for (path, x), y in zip(
        jax.tree.leaves_with_path(
            (s1.g_params, s1.d_params, s1.g_opt, s1.d_opt, s1.ema_g)
        ),
        jax.tree.leaves((s8.g_params, s8.d_params, s8.g_opt, s8.d_opt, s8.ema_g)),
    ):
        np.testing.assert_allclose(
            np.asarray(x),
            np.asarray(y),
            atol=1e-9,
            rtol=1e-8,
            err_msg=jax.tree_util.keystr(path),
        )
    # metric scalars stay fp32 inside losses.py (accumulators are explicit
    # jnp.float32), so cross-mesh agreement there is fp32 reduction-noise
    # bound; the fp64 claim is about the param/opt/EMA chain above.
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), atol=1e-5, rtol=1e-5, err_msg=k
        )
    print("X64_ADAM_EQUALITY_OK")


if __name__ == "__main__":
    main()
