"""Checkpoint/resume via Orbax (SURVEY.md §5 "Checkpoint / resume").

The reference ``torch.save``s netG/netDs every SNAPSHOT_INTERVAL and resumes
from cfg paths; the TPU-native contract is stronger: atomic checkpoints of
the FULL train state (params + optimizer states + BN stats + EMA + step),
keep-N retention, and restore-latest for crash auto-resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for one state namespace."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, abstract_state: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint into the structure of
        ``abstract_state`` (a concrete state works as the template).
        Returns (state, step) or None if the directory is empty."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return restored, step

    def restore_latest_raw(self) -> tuple[Any, int] | None:
        """Restore the newest checkpoint AS SAVED (no template): nested
        dicts of host arrays, custom pytree nodes flattened to their field
        names. For structure-tolerant consumers (the encoder warm-start
        graft) that validate shapes themselves — a template restore would
        hard-fail inside Orbax on any geometry drift before the caller
        could produce a useful message.

        Sharding-agnostic: a checkpoint written on one backend (TPU) must
        restore on another (CPU tooling, porters, inspectors). Orbax's
        template-free restore replays the SAVED shardings and raises when
        the saving device is absent, so on failure this falls back to a
        shape/dtype template built from checkpoint metadata — arrays land
        on the current default device."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            return (
                self._mgr.restore(step, args=ocp.args.StandardRestore()),
                step,
            )
        except ValueError:
            with ocp.CheckpointManager(
                self._dir,
                item_handlers={"default": ocp.StandardCheckpointHandler()},
            ) as meta_mgr:
                meta = meta_mgr.item_metadata(step)["default"]
            dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=dev),
                meta,
            )
            return (
                self._mgr.restore(
                    step, args=ocp.args.StandardRestore(template)
                ),
                step,
            )

    def close(self) -> None:
        self._mgr.close()
