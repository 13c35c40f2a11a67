"""Logging helper — ``make_logger`` (utils/helpers.py:141-153 analog):
stdout + optional file handler, idempotent per name."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional


def make_logger(
    name: str = "pygim_tpu", logfile: Optional[str] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(
        isinstance(h, logging.StreamHandler) and h.stream is sys.stdout
        for h in logger.handlers
    ):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(sh)
    if logfile is not None:
        logfile = str(Path(logfile))
        if not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == logfile
            for h in logger.handlers
        ):
            fh = logging.FileHandler(logfile)
            fh.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            )
            logger.addHandler(fh)
    return logger
