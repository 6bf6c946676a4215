"""Worker body for the 2-process multi-host test (test_parallel.py).

Covers the one parallel branch the 8-device single-process mesh cannot:
``maybe_initialize_distributed`` → ``jax.distributed.initialize`` →
a GLOBAL mesh spanning two processes (the DCN analog of a 2-slice pod;
SURVEY.md §5 "Distributed comm backend", BASELINE configs[4]). Each process
owns 4 virtual CPU devices; one GAN train step runs on the 8-device global
mesh and must equal the single-device step on the same global batch — the
same contract the in-process test asserts over ICI.

Launched by the parent with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set and 4 forced host devices per process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from s2i_tpu.parallel import maybe_initialize_distributed


def main():
    assert maybe_initialize_distributed(), "coordinator env vars not seen"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.parallel import make_mesh, make_parallel_train_step
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.TREE.BRANCH_NUM = 2
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.GAN.Z_DIM = 16
    cfg.GAN.EMBEDDING_DIM = 16
    cfg.TEXT.DIMENSION = 32
    cfg.DTYPE.COMPUTE = "float32"
    cfg.TRAIN.OPTIMIZER = "sgd"  # same rationale as the in-process test

    models = gan.build_models(cfg)
    # deterministic fixture → both processes hold the identical global batch
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = dict(ds.batch(np.arange(16)))
    batch.pop("class_id")
    state0 = gan.init_state(cfg, models, jax.random.key(0), batch)

    # single-device reference, computed locally in each process
    s1, m1 = jax.jit(gan.make_train_step(cfg, models))(
        state0, batch, jax.random.key(1)
    )

    mesh = make_mesh()  # all 8 global devices

    def make_global(tree, spec):
        """Host-identical values → global arrays on the 2-process mesh."""
        sh = NamedSharding(mesh, spec)

        def one(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])

        return jax.tree.map(one, tree)

    rng_g = jax.random.wrap_key_data(
        make_global(np.asarray(jax.random.key_data(jax.random.key(1))), P())
    )
    pstep = make_parallel_train_step(cfg, models, mesh)
    s8, m8 = pstep(
        make_global(state0, P()), make_global(batch, P("data")), rng_g
    )

    def local(x):  # replicated global array → host value
        return np.asarray(x.addressable_shards[0].data)

    for (path, x), y in zip(
        jax.tree.leaves_with_path((s1.g_params, s1.d_params, s1.g_stats)),
        jax.tree.leaves((s8.g_params, s8.d_params, s8.g_stats)),
    ):
        np.testing.assert_allclose(
            np.asarray(x),
            local(y),
            atol=1e-5,
            rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(local(m8[k])), atol=1e-5, rtol=1e-5, err_msg=k
        )
    print(f"MULTIHOST_OK process={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
