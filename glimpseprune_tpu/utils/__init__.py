from glimpseprune_tpu.utils.profiling import (
    LoggerControl,
    memory_logger,
    time_logger,
    get_logger_stats,
    reset_logger_stats,
)

__all__ = [
    "LoggerControl",
    "memory_logger",
    "time_logger",
    "get_logger_stats",
    "reset_logger_stats",
]
