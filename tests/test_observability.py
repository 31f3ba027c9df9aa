"""Logging/observability tests: SummaryLogger, Timer, log files."""

import json
import logging
import os

import numpy as np

from dcscn_tpu.utils import logging_util, tb


def test_summary_logger_writes(tmp_path):
    logdir = str(tmp_path / "tb")
    s = tb.SummaryLogger(logdir)
    s.scalar("train", "PSNR", 30.5, 1)
    s.scalar("test", "PSNR", 31.0, 1)
    s.histogram("train", "w", np.random.default_rng(0).normal(size=64), 1)
    s.flush()
    s.close()
    assert os.path.isdir(os.path.join(logdir, "train"))
    assert os.path.isdir(os.path.join(logdir, "test"))
    # something was written in each
    assert any(os.listdir(os.path.join(logdir, "train")))
    assert any(os.listdir(os.path.join(logdir, "test")))


def test_weight_summaries(tmp_path):
    s = tb.SummaryLogger(str(tmp_path / "tb"))
    params = {"CNN1": {"w": np.ones((3, 3, 1, 4)), "b": np.zeros(4)}}
    s.weight_summaries(params, step=0)
    s.kernel_images(params, step=0)
    s.flush()
    s.close()


def test_set_logging_writes_file(tmp_path):
    logfile = str(tmp_path / "log.txt")
    logging_util.set_logging(logfile)
    logging.info("hello-framework")
    for h in logging.getLogger().handlers:
        h.flush()
    with open(logfile) as f:
        assert "hello-framework" in f.read()
    logging.getLogger().handlers = []


def test_timer():
    t = logging_util.Timer(4)
    t.start(0)
    t.end(0)
    assert t.counts[0] == 1
    assert t.times[0] >= 0
    t.print()
