"""Device/runtime helpers: compilation cache, shape bucketing.

The axon TPU tunnel compiles remotely (~minutes per unique shape), so
avoiding recompiles matters more than shaving padding: jitted shapes are
bucketed to a coarse grid and XLA executables are cached persistently.
"""

from __future__ import annotations

import os

_CACHE_ENABLED = False

# bucket grid for cycle-window lengths (static jit shapes). Powers of two
# only: on the remote-compile tunnel every extra bucket costs minutes of
# compile, far more than the <=2x padding on a sub-100ms kernel.
WINDOW_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes/runs."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    # CPU executables cached by the remote compile helper carry target
    # features the local host may lack (SIGILL risk) — cache TPU only
    if jax.default_backend() in ("cpu",):
        return

    cache_dir = path or os.environ.get(
        "ALPHADIA_TPU_JAX_CACHE", os.path.expanduser("~/.cache/alphadia_tpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - older jax versions
        pass


def effective_batch(configured: int, n: int, floor: int = 256) -> int:
    """Batch size actually used: the configured cap, shrunk to the next
    power of two >= n for small workloads so padding doesn't dominate
    (static shapes stay bucketed — at most log2 variants per cap)."""
    b = floor
    while b < n and b < configured:
        b *= 2
    return min(b, configured)


def batch_schedule(n: int, cap: int, floor: int = 256) -> list[tuple[int, int]]:
    """Greedy power-of-two batch decomposition: ``[(start, batch_size)...]``.

    Large batches amortize the tunnel's per-dispatch latency; the batch
    size halves toward the tail whenever the remainder would pad more
    than 25% of a batch (padded rows are computed AND downloaded for
    nothing). At most log2(cap/floor)+1 distinct static shapes compile,
    and the final pad is < max(floor, bsz/4) rows.
    """
    if n <= 0:
        return []
    bsz = effective_batch(cap, n, floor)
    out = []
    b0 = 0
    while b0 < n:
        rem = n - b0
        while bsz > floor and rem < (3 * bsz) // 4:
            bsz //= 2
        out.append((b0, bsz))
        b0 += min(bsz, rem)
    return out


def bucket_window(n: int) -> int:
    """Round a window length up to the bucket grid (caps recompiles)."""
    for b in WINDOW_BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def bucket_count(n: int, minimum: int = 4096) -> int:
    """Round an array length up to a quarter-power-of-two bucket.

    Peak-store and cycle counts differ per raw file; uploading them at
    exact size makes every file recompile every kernel (measured: the
    first whole-pipeline TPU run spent ~270 s of a 388 s per-file wall
    recompiling scoring for a peak array 4,110 peaks longer than the
    previous file's). Quarter-pow2 buckets cap the distinct shapes at 4
    per octave (<= 25% padded waste) so same-instrument runs share every
    compiled program.
    """
    n = max(int(n), minimum)
    k = 1 << (n.bit_length() - 1)
    step = max(k // 4, 1)
    return ((n + step - 1) // step) * step
