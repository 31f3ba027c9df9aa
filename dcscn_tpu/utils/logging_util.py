"""Dual console+file logging, timers, date helper
(reference: helper/utilty.py:25-48, :97-110, :476-478)."""

from __future__ import annotations

import datetime
import logging
import time

import numpy as np


def set_logging(filename: str, stream_log_level=logging.INFO, file_log_level=logging.INFO) -> None:
    stream_log = logging.StreamHandler()
    stream_log.setLevel(stream_log_level)

    file_log = logging.FileHandler(filename=filename)
    file_log.setLevel(file_log_level)

    logger = logging.getLogger()
    logger.handlers = []
    logger.addHandler(stream_log)
    logger.addHandler(file_log)
    logger.setLevel(min(stream_log_level, file_log_level))


def get_now_date() -> str:
    d = datetime.datetime.today()
    return "%s/%s/%s %s:%s:%s" % (d.year, d.month, d.day, d.hour, d.minute, d.second)


class Timer:
    """Multi-slot accumulating timer (reference: helper/utilty.py:25-48)."""

    def __init__(self, timer_count: int = 100):
        self.times = np.zeros(timer_count)
        self.start_times = np.zeros(timer_count)
        self.counts = np.zeros(timer_count)
        self.timer_count = timer_count

    def start(self, timer_id: int) -> None:
        self.start_times[timer_id] = time.time()

    def end(self, timer_id: int) -> None:
        self.times[timer_id] += time.time() - self.start_times[timer_id]
        self.counts[timer_id] += 1

    def print(self) -> None:
        for i in range(self.timer_count):
            if self.counts[i] > 0:
                print(
                    "Average of %d: %s[ms]"
                    % (i, "{:,}".format(self.times[i] * 1000 / self.counts[i]))
                )
                print("Total of %d: %s" % (i, "{:,}".format(self.times[i])))
