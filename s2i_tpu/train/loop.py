"""High-level training driver — the ``condGANTrainer`` equivalent
(reference ``trainer.py`` + ``main.py`` wiring, SURVEY.md §3.3): owns the
models, train state, checkpoint manager, scalar logger, snapshot grids, and
the epoch loop; delegates the per-step math to the jitted step from
``s2i_tpu.train.gan`` (optionally shard_map-ed over a data mesh).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from s2i_tpu.parallel import (
    make_parallel_sample_fn,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from s2i_tpu.train import gan
from s2i_tpu.utils import CheckpointManager, ScalarLogger, save_image_grid


class GanTrainer:
    def __init__(
        self,
        cfg,
        output_dir: str,
        batch_factory: Callable[[int], Iterable[dict]],
        mesh=None,
        log_every: int = 20,
        image_every: int = 500,
    ):
        self.cfg = cfg
        self.output_dir = output_dir
        self.batch_factory = batch_factory
        self.mesh = mesh
        self.log_every = log_every
        self.image_every = image_every
        joint = bool(cfg.TRAIN.JOINT_FT)
        # Freeze the "auto" perf levers from the PER-DEVICE batch before any
        # model/step is built: the crossover A/Bs behind the thresholds are
        # single-chip measurements, so an 8-chip global-b96 run (b12 kernels
        # per chip) wants the under-full formulations ON.
        n_mesh = (
            int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
        )
        gan.resolve_perf_levers(cfg, n_mesh)
        self.models = gan.build_models(
            cfg,
            axis_name=str(cfg.MESH.DATA_AXIS) if mesh is not None else None,
            joint=joint,
        )

        os.makedirs(output_dir, exist_ok=True)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self.logger = ScalarLogger(
            output_dir,
            use_tensorboard=bool(getattr(cfg.TRAIN, "TENSORBOARD", False)),
        )

        try:
            first = next(iter(batch_factory(0)))
        except StopIteration:
            raise ValueError(
                "batch_factory(0) yielded no batches — empty DATA_DIR, or a "
                f"split smaller than TRAIN.BATCH_SIZE={int(cfg.TRAIN.BATCH_SIZE)} "
                "(drop-last batching)?"
            ) from None
        self._viz_batch = first
        state = gan.init_state(
            cfg, self.models, jax.random.key(int(cfg.SEED)), first
        )
        # Data-stream position (epoch, step-in-epoch) persisted alongside
        # each checkpoint so auto-resume continues the exact batch stream
        # the interrupted run would have consumed next (the reference's
        # torch.save resume restarts the data loader from scratch; ours is
        # bitwise-continuous — tests/test_loop.py resume-equality tests).
        self._progress = {"epoch": 0, "step_in_epoch": 0}
        restored = self.ckpt.restore_latest(state)
        if restored is not None:
            state, step = restored
            prog = self._read_progress()
            if prog is not None and int(prog.get("step", -1)) == step:
                self._progress = {
                    "epoch": int(prog["epoch"]),
                    "step_in_epoch": int(prog["step_in_epoch"]),
                }
            else:
                print(
                    "warning: checkpoint has no matching progress sidecar; "
                    "resuming the data stream from epoch 0"
                )
            print(f"resumed from step {step}")
        elif str(cfg.TRAIN.NET_G):
            # Reference-parity warm start (cfg.TRAIN.NET_G): fresh run dir,
            # weights from an existing training run's checkpoint tree.
            src = CheckpointManager(str(cfg.TRAIN.NET_G))
            warm = src.restore_latest(state)
            src.close()
            if warm is None:
                raise FileNotFoundError(
                    f"TRAIN.NET_G={cfg.TRAIN.NET_G!r} has no checkpoint"
                )
            state = warm[0]
            print(f"warm-started from {cfg.TRAIN.NET_G} step {warm[1]}")
        if joint and str(cfg.TRAIN.NET_E) and restored is None:
            # Joint finetune (SURVEY.md §3.5): the speech encoder warm-starts
            # from its distillation-pretrain checkpoint. The pretrain encoder
            # carries an extra class head, so matching subtrees are grafted.
            state = self._graft_encoder(state, str(cfg.TRAIN.NET_E))
        if mesh is not None:
            state = replicate_state(state, mesh)
            self.step_fn = make_parallel_train_step(cfg, self.models, mesh)
        else:
            # donate the old state: the trainer never reads it again, and
            # in-place updates halve the step's peak HBM for params/opt.
            self.step_fn = jax.jit(
                gan.make_train_step(cfg, self.models), donate_argnums=(0,)
            )
        self.state = state
        if mesh is not None:
            # Sharded sampling (pod-scale test-set generation); bitwise the
            # single-device images for the same seed (per-global-index z).
            self.sample_fn = make_parallel_sample_fn(cfg, self.models, mesh)
        else:
            self.sample_fn = jax.jit(gan.make_sample_fn(cfg, self.models))
        recalc_n = int(getattr(cfg.EVAL, "EMA_BN_RECALC", 0))
        self._bn_recalc = (
            jax.jit(gan.make_bn_recalc_fn(cfg, self.models, batches=recalc_n))
            if recalc_n > 0 and float(cfg.TRAIN.EMA_G) > 0
            else None
        )
        self._write_run_metadata()

    def eval_state(self, embeddings, seed: int = 0):
        """The state EMA evaluation should sample from.

        With ``EVAL.EMA_BN_RECALC`` > 0, G's BatchNorm running stats are
        re-estimated under the EMA weights (gan.make_bn_recalc_fn — the
        raw-trajectory stats mismatch the averaged weights; docs/QUALITY.md
        round-4 diagnosis) using ``embeddings`` as the conditioning pool.
        Otherwise returns ``self.state`` unchanged."""
        if self._bn_recalc is None:
            return self.state
        stats = self._bn_recalc(
            self.state, jax.numpy.asarray(embeddings), jax.random.key(seed)
        )
        if self._mesh_size() > 1:
            # the shard_map sample fn expects replicated inputs; host-round-
            # trip the (tiny) stats so they re-shard with the state
            stats = jax.device_get(stats)
        return self.state.replace(g_stats={**self.state.g_stats, "g": stats})

    def _write_run_metadata(self) -> None:
        """Run provenance: versions, devices, parameter counts."""
        import json

        def count(tree) -> int:
            return int(sum(x.size for x in jax.tree.leaves(tree)))

        meta = {
            "jax_version": jax.__version__,
            "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "mesh": dict(self.mesh.shape) if self.mesh is not None else None,
            # EFFECTIVE perf levers (post-"auto" resolution AND structural
            # gates like s2d_enabled's BRANCH_NUM check), for provenance —
            # the config.yml dump happens before per-device resolution, and
            # the raw resolved flag can read True on runs whose compiled
            # program contains no recode (e.g. S2D with BRANCH_NUM=1)
            "perf_levers": {
                "S2D": gan.s2d_enabled(self.cfg),
                "S2D_MID": gan.s2d_mid_enabled(self.cfg),
                "D_TRUNK_BATCH": gan.d_trunk_batch_enabled(self.cfg),
            },
            "params": {
                "generator+ca": count(
                    {k: v for k, v in self.state.g_params.items() if k != "enc"}
                ),
                "encoder": count(self.state.g_params.get("enc", {})),
                "discriminators": [count(p) for p in self.state.d_params],
            },
        }
        with open(os.path.join(self.output_dir, "run_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def _progress_path(self) -> str:
        return os.path.join(self.output_dir, "train_progress.json")

    def _read_progress(self) -> dict | None:
        import json

        try:
            with open(self._progress_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _write_progress(self, step: int) -> None:
        """Atomically persist the data-stream position for ``step``'s
        checkpoint (tmp + rename; a torn write must not corrupt resume)."""
        import json

        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": step, **self._progress}, f)
        os.replace(tmp, self._progress_path())

    def _save_checkpoint(self, step: int, force: bool = False) -> None:
        if self.ckpt.save(step, self.state, force=force):
            self._write_progress(step)

    def _graft_encoder(self, state, net_e: str):
        # Template-free restore: a geometry-drifted checkpoint must reach
        # the graft's own validation below (a template restore would die
        # inside Orbax with a bare shape error that never mentions NET_E).
        mgr = CheckpointManager(net_e)
        restored = mgr.restore_latest_raw()
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"TRAIN.NET_E={net_e!r} has no checkpoint")
        raw, estep = restored
        src_params = raw.get("params") if isinstance(raw, dict) else None
        src_stats = raw.get("batch_stats") if isinstance(raw, dict) else None
        if not isinstance(src_params, dict) or not isinstance(src_stats, dict):
            raise ValueError(
                f"TRAIN.NET_E={net_e!r} is not an encoder-pretrain "
                "checkpoint (no params/batch_stats trees)"
            )

        # Every leaf of the GAN-side encoder must be covered by the pretrain
        # checkpoint with matching shapes — a partial or shape-mismatched
        # graft (ENCODER.* config drift between pretrain and finetune) would
        # silently leave random subtrees in a run that LOGS "warm-started",
        # or surface later as an opaque XLA shape error. The pretrain
        # checkpoint's extra leaves (its class head) are expected and ignored.
        problems: list[str] = []

        def graft(dst: dict, src, path: str = "") -> dict:
            out = {}
            for k, v in dst.items():
                p = f"{path}/{k}"
                s = src.get(k) if isinstance(src, dict) else None
                if isinstance(v, dict):
                    out[k] = graft(v, s if isinstance(s, dict) else {}, p)
                elif s is None:
                    problems.append(f"{p}: missing from pretrain checkpoint")
                    out[k] = v
                elif np.shape(s) != np.shape(v):
                    problems.append(
                        f"{p}: checkpoint shape {np.shape(s)} vs model "
                        f"{np.shape(v)}"
                    )
                    out[k] = v
                else:
                    out[k] = s
            return out

        g_params = dict(state.g_params)
        g_stats = dict(state.g_stats)
        g_params["enc"] = graft(g_params["enc"], dict(src_params))
        g_stats["enc"] = graft(g_stats["enc"], dict(src_stats))
        if problems:
            raise ValueError(
                f"TRAIN.NET_E={net_e!r} does not match the joint encoder "
                f"(ENCODER.*/AUDIO.* config drift?): " + "; ".join(problems[:8])
                + (", ..." if len(problems) > 8 else "")
            )
        print(f"encoder warm-started from {net_e} step {estep}")
        return state.replace(g_params=g_params, g_stats=g_stats)

    def _prep(self, batch: dict) -> dict:
        # class_id feeds the class-aware wrong-pair path; otherwise drop it
        # so the jitted step's batch signature stays minimal.
        keep_cls = (
            str(self.cfg.TRAIN.WRONG_PAIR).lower() == "class_aware"
        )
        batch = {
            k: v
            for k, v in batch.items()
            if k != "class_id" or keep_cls
        }
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh, str(self.cfg.MESH.DATA_AXIS))
        else:
            # explicit async device_put (instead of implicit transfer at
            # dispatch) so the prefetch worker overlaps it with compute
            batch = jax.device_put(batch)
        return batch

    def train(
        self, max_epoch: int | None = None, max_steps: int | None = None
    ) -> dict:
        """Train until ``max_epoch`` TOTAL epochs are complete (reference
        ``cfg.TRAIN.MAX_EPOCH`` semantics — a resumed run finishes the
        remaining epochs rather than training ``max_epoch`` more; an
        already-complete job is a no-op). ``max_steps`` bounds the GLOBAL
        step counter (benchmark windows, deterministic mid-epoch
        interruption); the final checkpoint + progress sidecar make the
        stop resumable at the exact next batch."""
        cfg = self.cfg
        max_epoch = max_epoch or int(cfg.TRAIN.MAX_EPOCH)
        snapshot = int(cfg.TRAIN.SNAPSHOT_INTERVAL)
        base_rng = jax.random.key(int(cfg.SEED) + 1)
        mets = {}
        t0 = time.time()
        imgs_done = 0
        if max_steps is not None and int(self.state.step) >= max_steps:
            return {}

        # Preemption robustness (SURVEY.md §5 "Failure detection"): on
        # SIGTERM, finish the in-flight step, checkpoint, and stop cleanly —
        # auto-resume picks up from here on restart.
        stop_requested = []
        prev_handler = None
        handler_installed = False  # None is also a legitimate prior handler
        try:
            import signal

            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: stop_requested.append(True)
            )
            handler_installed = True
        except ValueError:
            pass  # not the main thread; skip the handler
        from s2i_tpu.data.pipeline import prefetch

        debug_nans = bool(cfg.TRAIN.DEBUG_NANS)
        profile_dir = str(cfg.TRAIN.PROFILE_DIR)
        profiling = False
        # Trace a RELATIVE window (5 steps after this session's first 5, so
        # compile + warmup are excluded): an absolute `step == 5` trigger
        # never fires on resumed runs, whose host mirror starts past 5.
        profile_at = int(self.state.step) + 5
        # Host-side step mirror: int(self.state.step) is a device→host sync
        # that would serialize dispatch every iteration; sync only on
        # log/grid/snapshot boundaries instead (the jitted step advances the
        # device counter by exactly 1, so the mirror stays exact).
        step = int(self.state.step)
        interrupted = False
        try:
            for epoch in range(int(self._progress["epoch"]), max_epoch):
                raw = iter(self.batch_factory(epoch))
                skip = (
                    int(self._progress["step_in_epoch"])
                    if epoch == int(self._progress["epoch"])
                    else 0
                )
                # Mid-epoch resume: the batch stream is (SEED, epoch)-keyed and
                # deterministic, so skipping the consumed prefix realigns it
                # exactly (the skipped batches' host decode is re-paid once).
                try:
                    for _ in range(skip):
                        next(raw)
                except StopIteration:
                    # dataset shrank between sessions; treat epoch as complete
                    self._progress = {"epoch": epoch + 1, "step_in_epoch": 0}
                    continue
                self._progress = {"epoch": epoch, "step_in_epoch": skip}
                # _prep (device_put of the ~25 MB batch) runs inside the
                # prefetch worker so host->device transfer overlaps the
                # previous step's compute instead of serializing with it.
                batches = prefetch(map(self._prep, raw), depth=4)
                for batch in batches:
                    b = batch["images"][0].shape[0]
                    self.state, mets = self.step_fn(self.state, batch, base_rng)
                    step += 1
                    self._progress["step_in_epoch"] += 1
                    if debug_nans:
                        bad = {
                            k: float(v)
                            for k, v in mets.items()
                            if not np.isfinite(float(v))
                        }
                        if bad:
                            raise FloatingPointError(
                                f"non-finite metrics at step {step}: {bad}"
                            )
                    if profile_dir and step == profile_at and not profiling:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif profiling and step >= profile_at + 5:
                        jax.block_until_ready(self.state)
                        jax.profiler.stop_trace()
                        profiling = False
                    imgs_done += b
                    if step % self.log_every == 0:
                        dt = time.time() - t0
                        scalars = {k: float(v) for k, v in mets.items()}
                        scalars["images_per_sec"] = imgs_done / max(dt, 1e-9)
                        self.logger.log(step, scalars)
                        t0, imgs_done = time.time(), 0
                    if step % self.image_every == 0:
                        self._save_grid(step)
                    if snapshot and step % snapshot == 0:
                        self._save_checkpoint(step)
                    if stop_requested or (
                        max_steps is not None and step >= max_steps
                    ):
                        interrupted = True
                        break
                if interrupted:
                    if stop_requested:
                        print(f"SIGTERM: checkpointing at step {step}")
                    break
                self._progress = {"epoch": epoch + 1, "step_in_epoch": 0}
        finally:
            # Run even when the loop raises (DEBUG_NANS FloatingPointError, a
            # decode error re-raised by the prefetcher, device OOM): a caller
            # that catches the exception and keeps the process alive must not
            # be left with a hijacked SIGTERM handler or an open trace.
            if profiling:
                # run ended inside the trace window (max_steps/SIGTERM/raise):
                # close the trace so it isn't lost with the process
                try:
                    jax.block_until_ready(self.state)
                except Exception:
                    pass  # poisoned device must not mask the original error
                jax.profiler.stop_trace()
            if handler_installed:
                import signal

                signal.signal(signal.SIGTERM, prev_handler)
        assert step == int(self.state.step), "host step mirror out of sync"
        if self.ckpt.latest_step != step:
            self._save_checkpoint(step, force=True)
        else:
            # checkpoint already current (snapshot boundary), but the
            # progress may have rolled to the next epoch since it was cut
            self._write_progress(step)
        self.ckpt.wait()
        return {k: float(v) for k, v in mets.items()}

    def _mesh_size(self) -> int:
        """Total device count of the data mesh (1 when unmeshed) — shard_map
        batches must be divisible by it."""
        if self.mesh is None:
            return 1
        return int(np.prod(list(self.mesh.shape.values())))

    def _save_grid(self, step: int) -> None:
        emb = np.asarray(self._viz_batch["embedding"][:8])
        n = emb.shape[0]
        # pad the viz embeddings up to a multiple of the mesh size and trim
        # the padded rows after sampling (same recipe as sample_to_dir)
        pad = (-n) % self._mesh_size()
        if pad:
            emb = np.concatenate(
                [emb, np.zeros((pad, emb.shape[1]), emb.dtype)]
            )
        imgs = self.sample_fn(
            self.eval_state(emb, seed=42), jax.numpy.asarray(emb),
            jax.random.key(42),
        )
        grid = save_image_grid(
            np.asarray(imgs[-1])[:n],
            os.path.join(self.output_dir, "images", f"fake_{step:07d}.png"),
        )
        self.logger.log_image(step, "samples", grid)

    def sample_to_dir(
        self,
        embeddings: np.ndarray,
        out_dir: str,
        names: list[str] | None = None,
        samples_per_emb: int = 1,
        batch_size: int = 32,
        seed: int = 0,
    ) -> None:
        """Reference eval path (SURVEY.md §3.4): generate for every test
        embedding, save top-scale PNGs."""
        from s2i_tpu.utils.images import save_images

        if self._bn_recalc is None and float(self.cfg.TRAIN.EMA_G) > 0:
            # sampling the Polyak-averaged G with raw-trajectory BN stats is
            # the certified-broken combination (docs/QUALITY.md "The EMA
            # collapse": fixture-FID 2301 at IS=1.0 vs raw 463)
            import warnings

            warnings.warn(
                "Sampling EMA params with EVAL.EMA_BN_RECALC=0: BatchNorm "
                "running stats were collected along the RAW parameter "
                "trajectory and mismatch the averaged weights (see "
                "docs/QUALITY.md). Set EVAL.EMA_BN_RECALC (certified: 30) "
                "unless reproducing the reference lineage's latent flaw.",
                stacklevel=2,
            )

        # shard_map needs the batch divisible by the data axis
        m = self._mesh_size()
        batch_size = ((batch_size + m - 1) // m) * m
        n = embeddings.shape[0]
        names = names or [f"{i:06d}" for i in range(n)]
        state = self.eval_state(embeddings, seed=seed)
        for s in range(samples_per_emb):
            outs = []
            for i in range(0, n, batch_size):
                e = embeddings[i : i + batch_size]
                pad = batch_size - e.shape[0]
                if pad:
                    e = np.concatenate([e, np.zeros((pad, e.shape[1]), e.dtype)])
                imgs = self.sample_fn(
                    state, jax.numpy.asarray(e), jax.random.key(seed + s)
                )
                top = np.asarray(imgs[-1])
                outs.append(top[: batch_size - pad] if pad else top)
            allimgs = np.concatenate(outs)
            save_images(
                allimgs,
                out_dir if samples_per_emb == 1 else os.path.join(out_dir, str(s)),
                [f"{nm}.png" for nm in names],
            )

    def close(self) -> None:
        self.ckpt.close()
        self.logger.close()
