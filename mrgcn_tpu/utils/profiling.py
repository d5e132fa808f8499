"""Profiling & tracing.

The reference has no profiling beyond coarse wall-clock prints
(reference: mrgcn/tasks/node_classification.py:83-95). Here:

  * ``MRGCN_PROFILE_DIR=<dir>`` captures a full XLA/TPU trace of the run
    (viewable in TensorBoard / Perfetto) via ``jax.profiler``;
  * :func:`annotate` tags host-side phases so they show up on the trace;
  * :class:`PhaseTimer` accumulates wall-clock per named phase and logs a
    summary.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Trace annotation visible in the device profile (no-op overhead when
    not tracing)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except ImportError:  # pragma: no cover
        yield


@contextlib.contextmanager
def profile_session(output_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device trace when ``output_dir`` (or MRGCN_PROFILE_DIR)
    is set; otherwise a no-op."""
    output_dir = output_dir or os.environ.get("MRGCN_PROFILE_DIR")
    if not output_dir:
        yield
        return

    import jax
    os.makedirs(output_dir, exist_ok=True)
    logger.info("Profiling to %s", output_dir)
    jax.profiler.start_trace(output_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Trace written to %s", output_dir)


class PhaseTimer:
    """Accumulates wall-clock per phase; ``summary()`` logs a table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            with annotate(name):
                yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"  {name}: {self.totals[name]:.2f}s "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)

    def log_summary(self) -> None:
        logger.info("%s", self.summary())
