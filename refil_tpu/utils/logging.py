"""Metrics logging: in-memory stats, console tables, JSONL file, optional
TensorBoard.

Parity target: reference ``src/utils/logging.py`` (Logger; stat fan-out to
tensorboard + sacred info). Sacred is replaced by a JSONL stream on disk.
"""
from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Optional


def get_logger() -> logging.Logger:
    logger = logging.getLogger("refil_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(levelname)s %(asctime)s] %(name)s %(message)s", "%H:%M:%S")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class Logger:
    def __init__(self, console_logger: Optional[logging.Logger] = None):
        self.console_logger = console_logger or get_logger()
        self.use_tb = False
        self.use_jsonl = False
        self.stats = defaultdict(list)  # name -> [(t, value)]

    def setup_tb(self, directory_name: str) -> None:
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch is baked in
        except Exception:  # pragma: no cover - tensorboard optional
            self.console_logger.warning("tensorboard unavailable; skipping tb logging")
            return
        os.makedirs(directory_name, exist_ok=True)
        self._tb_writer = SummaryWriter(log_dir=directory_name)
        self.use_tb = True

    def setup_jsonl(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._jsonl = open(path, "a")
        self.use_jsonl = True

    def log_stat(self, key: str, value, t: int) -> None:
        value = float(value)
        self.stats[key].append((t, value))
        if self.use_tb:
            self._tb_writer.add_scalar(key, value, t)
        if self.use_jsonl:
            self._jsonl.write(json.dumps({"t": t, "key": key, "value": value}) + "\n")
            self._jsonl.flush()

    def print_recent_stats(self) -> None:
        """Console table of the latest stats (reference ``logging.py:42-53``)."""
        t_ep = self.stats["episode"][-1] if self.stats.get("episode") else (0, 0)
        log_str = "Recent Stats | t_env: {:>10} | Episode: {:>8}\n".format(
            t_ep[0], int(t_ep[1])
        )
        i = 0
        for k, v in sorted(self.stats.items()):
            if k == "episode":
                continue
            i += 1
            window = 5 if k != "epsilon" else 1
            item = "{:.4f}".format(
                sum(x[1] for x in self.stats[k][-window:]) / len(self.stats[k][-window:])
            )
            log_str += "{:<25}{:>8}".format(k + ":", item)
            log_str += "\n" if i % 4 == 0 else "\t"
        self.console_logger.info(log_str)

    def print_stats_summary(self) -> None:
        """Mean/std summary over the whole run (reference ``logging.py:55-69``)."""
        import numpy as np

        for k, v in sorted(self.stats.items()):
            vals = [x[1] for x in v]
            self.console_logger.info(
                "%s: mean %.4f, std %.4f", k, float(np.mean(vals)), float(np.std(vals))
            )
