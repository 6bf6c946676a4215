"""Device-mesh parallelism (SURVEY.md §2 'Parallelism' rows, §5, §7 step 7).

The reference's only strategy is single-process DataParallel over GPUs; here
data-parallelism is first-class: ``shard_map`` over a ``jax.sharding.Mesh``
with batch-sharded inputs, replicated params, and pmean gradient allreduce —
XLA lowers the collective onto ICI within a slice and DCN across slices
(``jax.distributed.initialize`` for multi-host). Mesh axes beyond ``data``
are left open for extension.
"""

from s2i_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_encoder_step,
    make_parallel_sample_fn,
    make_parallel_train_step,
    maybe_initialize_distributed,
    replicate_state,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_parallel_encoder_step",
    "make_parallel_sample_fn",
    "make_parallel_train_step",
    "maybe_initialize_distributed",
    "replicate_state",
    "shard_batch",
]
