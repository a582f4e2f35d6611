"""Logging in the reference's format (ref: common/utils.py:8-25).

File + stream handlers, '%y-%m-%d %H:%M:%S.ms : message' lines, idempotent
per logger name so repeated setup calls do not duplicate handlers.
"""

from __future__ import annotations

import logging


def logger_info(logger_name: str, log_path: str = "default_logger.log") -> None:
    log = logging.getLogger(logger_name)
    # Check this logger's own handlers, not hasHandlers(): that walks up to
    # the root logger, which jax/absl often populate, and would skip setup.
    if log.handlers:
        print("LogHandlers exist!")
        return
    print("LogHandlers setup!")
    log.propagate = False
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d : %(message)s", datefmt="%y-%m-%d %H:%M:%S"
    )
    fh = logging.FileHandler(log_path, mode="a")
    fh.setFormatter(formatter)
    log.setLevel(logging.INFO)
    log.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    log.addHandler(sh)
