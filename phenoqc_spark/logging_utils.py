"""Process-level file logging, parity with the reference's logging module
(reference: src/phenoqc/logging_module.py:1-55).

Driver-side only by design: executor logs belong to Spark's own log4j
pipeline (stdout/stderr per task, aggregated by the cluster manager) — a
Python file handler on executors would write to ephemeral container disks
and interleave across tasks.  The reference's model (one log file per CLI
invocation, child workers appending) maps onto Spark as: the DRIVER owns
the run's log file; per-partition diagnostics flow through the audit
table (operators/resume.py), which is queryable — strictly more useful at
100 TB than grepping text logs.
"""

from __future__ import annotations

import datetime
import logging
import os


def setup_logging(log_file: str | None = None, mode: str = "w") -> str:
    """Configure root logging to a file under ``./logs`` and return the
    path (reference parity: auto-names ``phenoqc_<ts>.log`` when
    ``log_file`` is None, resets existing handlers so repeated calls in
    one process don't duplicate lines, ``mode='a'`` for workers that
    re-use a parent's file)."""
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)

    logs_dir = os.path.join(os.getcwd(), "logs")
    os.makedirs(logs_dir, exist_ok=True)
    if not log_file:
        now_str = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        log_file = f"phenoqc_{now_str}.log"
    log_path = os.path.join(logs_dir, log_file)

    logging.basicConfig(
        filename=log_path,
        level=logging.INFO,
        format="%(asctime)s:%(levelname)s:%(message)s",
        filemode=mode,
    )
    logging.info("Logging initialized! Writing to %s with mode=%s", log_path, mode)
    return log_path


def log_activity(message: str, level: str = "info") -> None:
    """Reference-parity level dispatch (unknown levels → debug)."""
    {
        "info": logging.info,
        "warning": logging.warning,
        "error": logging.error,
    }.get(level, logging.debug)(message)
