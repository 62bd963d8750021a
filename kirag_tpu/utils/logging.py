"""File + stream logging setup (mirrors reference `utils/utils.py:100-116`)."""

from __future__ import annotations

import logging
from typing import Optional


def setup_logger(log_file: Optional[str] = None, process_index: int = 0, level: int = logging.INFO) -> logging.Logger:
    """Configure the root logger with stream and optional file handlers.

    Only process 0 of a multi-process job attaches handlers (others inherit a
    quiet root logger), the TPU analogue of rank-gated logging.
    """
    logger = logging.getLogger()
    logger.setLevel(level)
    if process_index != 0:
        return logger

    formatter = logging.Formatter(
        "%(asctime)s %(levelname)s: - %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    ch = logging.StreamHandler()
    ch.setLevel(level)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
        logger.info(f"Saving log file to {log_file} ...")

    return logger
