"""Process-aware logging.

Counterpart of the reference's rank-aware colored logger
(/root/reference/minivllm/utils/logger_utils.py:45-256): in multi-host
SPMD, only jax process 0 logs at INFO to stream/file; other processes are
raised to ERROR so a pod doesn't multiply every line by the host count.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

__all__ = ["get_logger", "get_outdir"]

_RESET = "\x1b[0m"
_COLORS = {
    logging.DEBUG: "\x1b[36m",
    logging.INFO: "\x1b[32m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
    logging.CRITICAL: "\x1b[41m",
}


class ColorFormatter(logging.Formatter):
    def __init__(self, process_index: int, use_color: bool) -> None:
        super().__init__()
        self.process_index = process_index
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        base = (
            f"[{self.formatTime(record, '%H:%M:%S')}]"
            f"[p{self.process_index}]"
            f"[{record.levelname}] {record.getMessage()}"
        )
        if self.use_color and sys.stderr.isatty():
            color = _COLORS.get(record.levelno, "")
            return f"{color}{base}{_RESET}"
        return base


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


_configured: set[str] = set()


def get_logger(name: str = "minivllm_tpu", log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _configured:
        return logger
    _configured.add(name)
    pidx = _process_index()
    level_env = os.environ.get("MINIVLLM_TPU_LOG_LEVEL", "INFO").upper()
    level = getattr(logging, level_env, logging.INFO)
    # Non-primary processes only surface errors (reference:
    # logger_utils.py:104-203).
    logger.setLevel(level if pidx == 0 else logging.ERROR)
    handler = logging.StreamHandler()
    handler.setFormatter(ColorFormatter(pidx, use_color=True))
    logger.addHandler(handler)
    if log_file and pidx == 0:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(ColorFormatter(pidx, use_color=False))
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def get_outdir(base: str = "outputs") -> Path:
    """Timestamped output directory (reference: logger_utils.py:230-256)."""
    from datetime import datetime

    out = Path(base) / datetime.now().strftime("%Y%m%d_%H%M%S")
    out.mkdir(parents=True, exist_ok=True)
    return out
