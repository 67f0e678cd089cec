"""Tracing / profiling utilities (aux subsystem; SURVEY §5).

The reference has only ad-hoc ``SystemTime::now()`` deltas in tests
(ref: /root/reference/src/rpsss.rs:105-134).  Here: a stage timer that the
prover can emit structured timings through, and a thin wrapper over
``jax.profiler`` for device traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator, Optional


class StageTimer:
    """Accumulates wall-time per named stage.

    Usage::

        timer = StageTimer()
        with timer.stage("ntt"):
            ...
        print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(
            self.totals.items(), key=lambda kv: -kv[1]
        ):
            lines.append(
                f"{name:<28s} {total * 1000:10.2f} ms  x{self.counts[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace around a block.

    ``logdir`` defaults to ./jax_trace; open with TensorBoard's profile
    plugin to see per-kernel device timelines and HBM rooflines.
    """
    import jax

    logdir = logdir or "./jax_trace"
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
