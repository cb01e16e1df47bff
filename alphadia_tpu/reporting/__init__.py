from alphadia_tpu.reporting.reporting import (
    PROGRESS,
    FigureBackend,
    JSONLBackend,
    LogBackend,
    Pipeline,
    init_logging,
    logger,
)

__all__ = [
    "PROGRESS",
    "FigureBackend",
    "JSONLBackend",
    "LogBackend",
    "Pipeline",
    "init_logging",
    "logger",
]
