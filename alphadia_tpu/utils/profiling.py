"""JAX profiler hooks (SURVEY §5 tracing/profiling).

The reference relies on host-side timing plus torch/numba profilers; the
TPU-native equivalent is the XLA profiler: ``jax.profiler.trace`` writes
a TensorBoard-loadable trace (XLA ops, fusion, HBM traffic) and
``TraceAnnotation`` labels host phases inside it. Both are gated so a
backend without profiler support (e.g. relay/tunnel platforms) degrades
to a no-op with a single warning instead of failing a search.

Enable per run with ``general.profile_directory`` in the config or
``alphadia-tpu --profile-dir DIR``; each phase annotation also lands in
the TimingManager, so trace and stat.tsv line up.
"""

from __future__ import annotations

import contextlib
import logging

logger = logging.getLogger(__name__)

_warned = False


def _warn_once(exc: Exception) -> None:
    global _warned
    if not _warned:
        logger.warning(f"jax profiler unavailable on this backend: {exc!r}")
        _warned = True


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a device trace into ``log_dir`` (no-op when None/unsupported)."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(str(log_dir))
    except Exception as exc:  # backend without profiler RPC
        _warn_once(exc)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            logger.info(f"wrote jax profiler trace to {log_dir}")
        except Exception as exc:
            _warn_once(exc)


@contextlib.contextmanager
def annotate(name: str):
    """Label the enclosed host span in the device trace (no-op if unsupported)."""
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception as exc:
        _warn_once(exc)
        yield
        return
    with ctx:
        yield
