"""Tracing and per-kernel timing.

The reference's only observability is wall-clock prints
(``Decoder.py:213-218``) and log-line timestamps (``LogPrint.py:72-79``);
SURVEY.md §5 calls for ``jax.profiler`` traces plus roofline counters.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto
    (``jax.profiler.trace``)."""
    with jax.profiler.trace(log_dir):
        yield


@dataclass
class OpTimer:
    """Wall-clock timing ledger with throughput/roofline annotations."""

    records: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def measure(self, name: str, flops: float | None = None,
                bytes_accessed: float | None = None):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        rec = self.records.setdefault(
            name, {"calls": 0, "seconds": 0.0, "flops": flops,
                   "bytes": bytes_accessed},
        )
        rec["calls"] += 1
        rec["seconds"] += dt

    def timeit(self, name: str, fn, *args, iters: int = 10,
               flops: float | None = None, **kwargs):
        """Time a jitted function with warmup + block_until_ready."""
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        self.records[name] = {"calls": iters, "seconds": dt, "flops": flops,
                              "bytes": None}
        return out, dt

    def report(self) -> str:
        lines = []
        for name, rec in sorted(self.records.items()):
            per_call = rec["seconds"] / max(rec["calls"], 1)
            line = f"{name}: {per_call*1e3:.3f} ms/call x{rec['calls']}"
            if rec.get("flops"):
                line += f"  {rec['flops']/per_call/1e12:.2f} TFLOP/s"
            if rec.get("bytes"):
                line += f"  {rec['bytes']/per_call/1e9:.1f} GB/s"
            lines.append(line)
        return "\n".join(lines)
