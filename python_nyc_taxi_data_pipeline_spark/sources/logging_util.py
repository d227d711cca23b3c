"""Dual console+file logger (SURVEY §2.11 X3), mirroring
`/root/reference/src/utils/logging.py:5-28`."""

from __future__ import annotations

import logging
import sys
from pathlib import Path


def custom_logging(
    log_file: str | Path, name: str = "pipeline", level: int = logging.INFO
) -> logging.Logger:
    """Logger writing to both stdout and ``log_file`` (created along
    with its parent directory), idempotent per name."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    path = Path(log_file)
    path.parent.mkdir(parents=True, exist_ok=True)
    fh = logging.FileHandler(path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger
