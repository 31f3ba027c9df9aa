"""TensorBoard logging via tensorboardX (reference: helper/utilty.py:427-469,
helper/tf_graph.py:298-302). Degrades to a JSONL scalar log if tensorboardX
is unavailable."""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAS_TBX = True
except Exception:  # pragma: no cover
    _HAS_TBX = False


class _JsonlWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_histogram(self, tag, values, step):
        v = np.asarray(values)
        self._f.write(json.dumps({"t": time.time(), "tag": tag + "/hist",
                                  "mean": float(v.mean()), "std": float(v.std()),
                                  "step": int(step)}) + "\n")

    def add_image(self, tag, img, step, dataformats="HWC"):
        pass

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class SummaryLogger:
    """Train/test writer pair (reference: helper/tf_graph.py:298-302)."""

    def __init__(self, logdir: str):
        cls = SummaryWriter if _HAS_TBX else _JsonlWriter
        self.train_writer = cls(os.path.join(logdir, "train"))
        self.test_writer = cls(os.path.join(logdir, "test"))

    def scalar(self, writer: str, tag: str, value: float, step: int):
        getattr(self, writer + "_writer").add_scalar(tag, value, step)

    def histogram(self, writer: str, tag: str, values, step: int):
        getattr(self, writer + "_writer").add_histogram(tag, np.asarray(values), step)

    def weight_summaries(self, params, step: int, max_tensors: Optional[int] = None):
        """Mean/stddev/histogram per weight (reference: helper/utilty.py:427-443)."""
        count = 0
        for lname, layer in params.items():
            for k, v in layer.items():
                if max_tensors is not None and count >= max_tensors:
                    return
                arr = np.asarray(v)
                tag = "%s/%s" % (lname, k)
                self.train_writer.add_scalar(tag + "/mean", float(arr.mean()), step)
                self.train_writer.add_scalar(tag + "/stddev", float(arr.std()), step)
                self.train_writer.add_histogram(tag, arr, step)
                count += 1

    def grad_summaries(self, grads, step: int, max_tensors: Optional[int] = None):
        """Mean/stddev/histogram per GRADIENT tensor (reference logs every
        gradient under --save_weights: DCSCN.py:397-404 via
        helper/utilty.py:427-443)."""
        count = 0
        for lname, layer in grads.items():
            for k, v in layer.items():
                if max_tensors is not None and count >= max_tensors:
                    return
                arr = np.asarray(v)
                tag = "%s/%s/gradients" % (lname, k)
                self.train_writer.add_scalar(tag + "/mean", float(arr.mean()), step)
                self.train_writer.add_scalar(tag + "/stddev", float(arr.std()), step)
                self.train_writer.add_histogram(tag, arr, step)
                count += 1

    def tensor_summaries(self, tag: str, arr, step: int):
        """Mean/stddev/histogram of one tensor — used for the training
        input x ("X/output") and network output y_ ("Y_/output"), matching
        the reference's add_summaries calls (DCSCN.py:238, :329)."""
        arr = np.asarray(arr)
        self.train_writer.add_scalar(tag + "/mean", float(arr.mean()), step)
        self.train_writer.add_scalar(tag + "/stddev", float(arr.std()), step)
        self.train_writer.add_histogram(tag, arr, step)

    def kernel_images(self, params, step: int, max_outputs: int = 20):
        """Conv kernels as image grids (reference: helper/utilty.py:460-469,
        which logs EVERY conv weight — including the separable dw/pw pair
        and 1x1 NIN kernels)."""
        if not _HAS_TBX:
            return
        for lname, layer in params.items():
            for key in ("w", "dw", "pw"):
                w = layer.get(key)
                if w is None or np.ndim(w) != 4:
                    continue
                arr = np.asarray(w)  # [k,k,in,out]
                k = arr.shape[0]
                imgs = arr.reshape(k, arr.shape[1], -1).transpose(2, 0, 1)[:max_outputs]
                lo, hi = imgs.min(), imgs.max()
                imgs = (imgs - lo) / (hi - lo + 1e-9)
                prefix = lname if key == "w" else "%s/%s" % (lname, key)
                for i, im in enumerate(imgs):
                    self.train_writer.add_image("%s/kernel%d" % (prefix, i),
                                                im[None], step, dataformats="CHW")

    def flush(self):
        self.train_writer.flush()
        self.test_writer.flush()

    def close(self):
        self.train_writer.close()
        self.test_writer.close()
