"""Data-parallel training over a device mesh.

Replaces the reference's ``nn.parallel.data_parallel`` scatter/gather
(reference ``trainer.py``, SURVEY.md §3.3 "DataParallel note") with the SPMD
formulation: params replicated, batch sharded over the ``data`` axis,
gradients pmean-ed inside the step (see ``make_train_step(axis_name=...)``),
optimizer update executed redundantly per device. No hand-written comm —
XLA emits the allreduce over ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN for the cross-slice legs).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2i_tpu.train import gan


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D data mesh over the first ``num_devices`` devices (0 = all)."""
    devs = jax.devices()
    n = num_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Place every leaf fully-replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf along its leading (batch) dimension."""
    def put(x):
        x = np.asarray(x)
        if x.shape[0] % mesh.shape[axis]:
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by mesh axis "
                f"{axis}={mesh.shape[axis]}"
            )
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, batch)


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up (SURVEY.md §5 'Distributed comm backend'): call
    ``jax.distributed.initialize`` when the standard coordinator env vars are
    present; DCN handles the cross-slice legs of the same mesh code.

    On managed clusters (Cloud TPU pods, SLURM, Open MPI) the coordinator
    address alone is enough — jax auto-detects the rest. Elsewhere (e.g. the
    2-process CPU harness in tests/test_parallel.py) JAX_NUM_PROCESSES and
    JAX_PROCESS_ID pin the topology explicitly."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None,
    )
    return True


def make_parallel_encoder_step(cfg, model, mesh: Mesh) -> Callable:
    """shard_map-wrapped distillation pretrain step (state replicated,
    batch sharded, pmean-ed grads) — the encoder analog of
    make_parallel_train_step."""
    from s2i_tpu.train import encoder as enc_train

    axis = str(cfg.MESH.DATA_AXIS)
    # Clone the CALLER's module with the mesh axis so BN batch statistics
    # are cross-device means (param/stat trees are unchanged by axis_name,
    # so the caller's state stays valid) — clone, not a cfg rebuild, so a
    # customized encoder module is honored rather than silently replaced.
    model = model.clone(axis_name=axis)
    step = enc_train.make_encoder_train_step(cfg, model, axis_name=axis)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_sample_fn(
    cfg, models: gan.GanModels, mesh: Mesh, use_ema: bool = True
) -> Callable:
    """jit(shard_map(sample_fn)): embeddings batch-sharded over the data
    axis, state/rng replicated. Per-global-index noise makes the output
    EXACTLY the single-device sampling for the same seed — pod-scale test-set
    generation for IS/FID (BASELINE config #5) with no semantic drift."""
    axis = str(cfg.MESH.DATA_AXIS)
    # Freeze any still-"auto" perf levers from the per-device batch here so
    # direct callers need no resolve-before-build ordering contract
    # (idempotent: already-resolved booleans pass through unchanged).
    gan.resolve_perf_levers(cfg, mesh.size)
    models = gan.build_models(
        cfg, axis_name=axis, joint=models.encoder is not None
    )
    fn = gan.make_sample_fn(cfg, models, use_ema, axis_name=axis)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_train_step(
    cfg, models: gan.GanModels, mesh: Mesh
) -> Callable:
    """jit(shard_map(train_step)): state replicated, batch sharded, rng
    replicated. Noise is drawn per GLOBAL example index (sharding-invariant),
    BN stats are cross-device means, the wrong-pair roll crosses shard
    boundaries via ppermute, and grads are pmean-ed before the update — so
    the result is EXACTLY the single-device global-batch step (tested by
    tests/test_parallel.py::test_parallel_step_matches_single_device)."""
    axis = str(cfg.MESH.DATA_AXIS)
    # Freeze any still-"auto" perf levers from the per-device batch (see
    # make_parallel_sample_fn — removes the resolve-first ordering contract).
    gan.resolve_perf_levers(cfg, mesh.size)
    # Rebuild modules with the mesh axis so BN stats sync across devices;
    # axis_name changes no param/stat trees, so the caller's state is valid.
    models = gan.build_models(
        cfg, axis_name=axis, joint=models.encoder is not None
    )
    step = gan.make_train_step(cfg, models, axis_name=axis)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # The input state is dead after the update — donating it lets XLA write
    # new params/opt-state in place instead of holding both copies in HBM.
    return jax.jit(sharded, donate_argnums=(0,))
