"""Logging setup (behavioural parity with reference common.py:7-14)."""

import logging

_CONFIGURED = False


def get_logger(level: int = logging.INFO) -> logging.Logger:
    """Root logger with a timestamp + file:line format.

    Matches the observable log line shape of the reference
    (common.py:7-14): ``HH:MM:SS.mmm LEVEL [file.py:line] message``.
    """
    global _CONFIGURED
    if not _CONFIGURED:
        logging.basicConfig(
            format="%(asctime)s.%(msecs)03d %(levelname)-7s "
            "[%(filename)s:%(lineno)-3d] %(message)s",
            datefmt="%H:%M:%S",
        )
        _CONFIGURED = True
    logger = logging.getLogger()
    logger.setLevel(level)
    return logger
