"""Scalar logging + profiling hooks (SURVEY.md §5 "Metrics / logging" and
"Tracing / profiling").

JSONL is the primary sink (greppable, no deps); TensorBoard event files are
written too when TensorFlow is importable. ``profile_steps`` wraps a step
range in a ``jax.profiler`` trace for Perfetto/XProf inspection.
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time
from typing import Any, Iterator


class ScalarLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = False):
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, "scalars.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(run_dir, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        # non-finite values (a diverging d_loss=NaN is exactly when the log
        # matters) serialize as strings: bare NaN/Infinity tokens are not
        # valid JSON and strict parsers reject the whole line
        rec.update(
            {
                k: (f if math.isfinite(f) else str(f))
                for k, v in scalars.items()
                for f in (float(v),)
            }
        )
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def log_image(self, step: int, tag: str, image) -> None:
        """Mirror a uint8 [H, W, C] image (e.g. a sample grid) into the
        TensorBoard event files — the reference's periodic image summaries
        (SURVEY.md §5 "Metrics / logging"). No-op when TB is off; PNG grids
        on disk stay the primary sink either way."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        with self._tb.as_default():
            tf.summary.image(
                tag, np.asarray(image)[None], step=int(step), max_outputs=1
            )

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_steps(log_dir: str) -> Iterator[None]:
    """jax.profiler trace around a block (view with XProf/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
