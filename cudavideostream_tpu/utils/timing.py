"""Timing harness: the TPU counterpart of the reference's ``std::chrono``
spans + nvprof sweeps (``server/src/server.cpp:69-171``,
``tests/heat_map_benchmark/kernel_test.sh``)."""

from __future__ import annotations

import time
from typing import Callable, Dict


class Timer:
    """Accumulating wall-clock span timer with 1 Hz-style reporting."""

    def __init__(self):
        self._t0: Dict[str, float] = {}
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def start(self, name: str) -> None:
        self._t0[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._t0[name]
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def mean_ms(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return 1e3 * self.totals.get(name, 0.0) / n if n else 0.0

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


def bench_op(fn: Callable, *args, warmup: int = 3, iters: int = 20) -> float:
    """Median wall-clock milliseconds of ``fn(*args)`` with device sync.

    Syncs through ``_sync`` (a real device read) — NOT
    ``jax.block_until_ready``, which returns early on the tunneled TPU
    backend (CLAUDE.md) and would report dispatch overhead as the
    kernel time. Each iteration pays the sync round-trip, so on
    high-latency links prefer :func:`bench_op_amortized` /
    :func:`bench_scan_chain`; this bracketing mirrors the reference's
    ``cudaDeviceSynchronize`` timing.
    """

    def run():
        _sync(fn(*args))

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1e3 * times[len(times) // 2]


def _sync(out) -> None:
    """Force real device completion by fetching one element of each leaf.

    ``jax.block_until_ready`` is unreliable on tunneled/async PJRT
    backends (observed: returns immediately on the axon TPU transport), so
    the only trustworthy sync is an actual device-to-host read.
    """
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def measure_rtt(leaf, samples: int = 5) -> float:
    """Min-of-N round-trip of a ``device_get`` on an ALREADY-materialized
    array element: pure transport latency, no compute wait. ~30 ms on
    the tunneled backend — subtract it from any timed region whose only
    blocking point is a final sync, or every step reads high."""
    import jax

    jax.device_get(leaf.ravel()[0])
    rtts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        jax.device_get(leaf.ravel()[0])
        rtts.append(time.perf_counter() - t0)
    return min(rtts)


def bench_scan_chain(chain: Callable, init_carry, k: int = 24,
                     iters: int = 4) -> float:
    """Milliseconds per chain step: ``jit(scan(chain))`` timed over
    ``iters`` dependent invocations, minus the measured sync round-trip.

    The scan threads each step's output into the next step's input so
    the compiler cannot hoist loop-invariant work — the moral equivalent
    of nvprof's kernel-average column. The final ``device_get`` is the
    only blocking point; on a tunneled backend its round-trip is ~30 ms,
    which would otherwise inflate every step by ``rtt/(k*iters)``
    (~0.3 ms at k=24, iters=4 — larger than some kernels being
    measured). The subtracted rtt is the min of 5 gets of an
    already-materialized array: pure transport, no compute wait.

    The warmup runs TWICE and the timed loop starts from the warmed
    carry, not ``init_carry``: a chain that crosses a ``shard_map`` (the
    mesh pipelines) re-tags every output aval with the mesh context
    ({Auto: (...)} sharding-in-types), so the steady-state carry is a
    DIFFERENT jit cache key than the caller's init — one warm call
    compiles only the init-aval executable and the first steady-state
    call inside the timed region recompiles (~minutes at 1080p on the
    remote backend; benchmarks/mesh_diag caught mesh steps reading
    1000x too high this way). Solo chains have identical avals both
    ways, so their numbers are unchanged.
    """
    import jax

    @jax.jit
    def run_(c):
        return jax.lax.scan(lambda c, _: (chain(c), None), c, None, length=k)[0]

    c = run_(run_(init_carry))
    rtt = measure_rtt(jax.tree_util.tree_leaves(c)[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        c = run_(c)
    jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])
    total = time.perf_counter() - t0
    return max(0.0, 1e3 * (total - rtt) / (k * iters))


def bench_op_amortized(fn: Callable, *args, warmup: int = 2, iters: int = 20) -> float:
    """Amortized milliseconds per ``fn(*args)`` dispatch.

    Queues ``iters`` sequential executions then syncs once with a real
    device read; subtracts the measured sync round-trip. This mirrors how
    the hot loop actually runs (dispatch-ahead, fetch at the end) and is
    robust to backends where ``block_until_ready`` lies.
    """
    for _ in range(warmup):
        _sync(fn(*args))

    out = fn(*args)
    _sync(out)
    # min-of-5 RTT probe (CLAUDE.md): a single sample on the shared
    # tunnel can catch a contention spike and over-subtract, dragging
    # the result low or clipping it to zero
    rtt = min(
        _timed(lambda: _sync(out)) for _ in range(5)
    )

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    total = time.perf_counter() - t0
    return max(0.0, 1e3 * (total - rtt) / iters)


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0
