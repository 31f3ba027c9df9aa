"""Training datasets: prebuilt patch stores and dynamic random-crop sampling.

PatchDataset — the `BatchDataSets` equivalent (reference:
helper/loader.py:70-275): every training image splits into aligned
(LR input, bicubic-interpolated, true HR) patch triples. The reference
writes one BMP per patch (~150k small files) and reloads them one by one;
here the default store is a single .npz of three uint8 arrays (~100x faster
build/load), with an optional reference-compatible BMP store (same
`{input,interpolated,true}/%06d.bmp` layout + `batch_images.ini` manifest)
that can also *read* stores built by the reference.

DynamicDataset — the `DynamicDataSets` equivalent (reference:
helper/loader.py:278-355): random image -> random (B*s)^2 crop -> Y ->
50% horizontal flip -> bicubic down(+up)sample per sample. The reference
does all of it serially in Python inside the train loop (train.py:80-81);
here crops are produced by a prefetching thread pool and the
color/flip/resample transforms run batched on device (see
`device_transform_fn`).
"""

from __future__ import annotations

import configparser
import os
import queue
import random
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from dcscn_tpu.data import builders
from dcscn_tpu.ops import color, patches
from dcscn_tpu.ops import resize as resize_ops
from dcscn_tpu.utils import files, imaging

INPUT_IMAGE_DIR = "input"
INTERPOLATED_IMAGE_DIR = "interpolated"
TRUE_IMAGE_DIR = "true"


class PatchDataset:
    """Prebuilt patch triples, stored once, trained from device memory."""

    def __init__(self, scale: int, batch_dir: str, batch_image_size: int,
                 stride_size: int = 0, channels: int = 1,
                 resampling_method: str = "bicubic", store_format: str = "npz"):
        self.scale = scale
        self.batch_image_size = batch_image_size
        self.stride = batch_image_size // 2 if stride_size == 0 else stride_size
        self.channels = channels
        self.resampling_method = resampling_method
        self.batch_dir = batch_dir
        self.store_format = store_format
        self.count = 0
        self.input_images: Optional[np.ndarray] = None
        self.input_interpolated_images: Optional[np.ndarray] = None
        self.true_images: Optional[np.ndarray] = None
        self.batch_index = None
        self.index = 0

    # -- build ----------------------------------------------------------
    def build_batch(self, data_dir: str) -> None:
        print("Building batch images for %s..." % self.batch_dir)
        filenames = files.get_files_in_directory(data_dir)

        ins: List[np.ndarray] = []
        mids: List[np.ndarray] = []
        trues: List[np.ndarray] = []
        processed = 0
        for filename in filenames:
            out_win = self.batch_image_size * self.scale
            out_stride = self.stride * self.scale
            input_image, interp_image, true_image = builders.build_image_set(
                filename, channels=self.channels, scale=self.scale,
                resampling_method=self.resampling_method, print_console=False)

            in_patches = patches.get_split_images(
                np.ascontiguousarray(input_image), self.batch_image_size, stride=self.stride)
            mid_patches = patches.get_split_images(
                np.ascontiguousarray(interp_image), out_win, stride=out_stride)
            if in_patches is None or mid_patches is None:
                continue
            true_patches = patches.get_split_images(
                np.ascontiguousarray(true_image), out_win, stride=out_stride)

            # uint8 truncation cast matches the reference's BMP round-trip
            # (helper/utilty.py:113-127 saves with astype(np.uint8))
            ins.append(in_patches.astype(np.uint8))
            mids.append(mid_patches.astype(np.uint8))
            trues.append(true_patches.astype(np.uint8))
            processed += 1
            if processed % 10 == 0:
                print(".", end="", flush=True)

        self.input_images = np.concatenate(ins) if ins else np.zeros((0,), np.uint8)
        self.input_interpolated_images = np.concatenate(mids) if mids else np.zeros((0,), np.uint8)
        self.true_images = np.concatenate(trues) if trues else np.zeros((0,), np.uint8)
        self.count = int(self.input_images.shape[0])
        print("Finished")
        print("%d mini-batch images are built." % self.count)
        self._save_store()

    def _manifest(self) -> Dict[str, int]:
        return dict(count=self.count, scale=self.scale,
                    batch_image_size=self.batch_image_size, stride=self.stride,
                    channels=self.channels)

    def _save_store(self) -> None:
        files.make_dir(self.batch_dir)
        config = configparser.ConfigParser()
        config.add_section("batch")
        for k, v in self._manifest().items():
            config.set("batch", k, str(v))
        with open(os.path.join(self.batch_dir, "batch_images.ini"), "w") as f:
            config.write(f)

        if self.store_format == "bmp":
            from dcscn_tpu.data import native

            for sub, arr in ((INPUT_IMAGE_DIR, self.input_images),
                             (INTERPOLATED_IMAGE_DIR, self.input_interpolated_images),
                             (TRUE_IMAGE_DIR, self.true_images)):
                d = os.path.join(self.batch_dir, sub)
                files.make_dir(d)
                native.write_bmp_batch(d, arr)  # threaded C++ when built
        else:
            np.savez(os.path.join(self.batch_dir, "batch_images.npz"),
                     input=self.input_images, interpolated=self.input_interpolated_images,
                     true=self.true_images)
        print("Batch store saved [%s] (%s)." % (self.batch_dir, self.store_format))

    # -- load -----------------------------------------------------------
    def is_batch_exist(self) -> bool:
        """Validate an existing store's manifest (reference:
        helper/loader.py:196-220)."""
        ini = os.path.join(self.batch_dir, "batch_images.ini")
        if not os.path.isfile(ini):
            return False
        config = configparser.ConfigParser()
        try:
            with open(ini) as f:
                config.read_file(f)
            if config.getint("batch", "count") <= 0:
                return False
            for key, want in self._manifest().items():
                if key == "count":
                    continue
                if config.getint("batch", key) != want:
                    return False
            return True
        except (IOError, configparser.Error):
            return False

    def load_batch_counts(self) -> None:
        ini = os.path.join(self.batch_dir, "batch_images.ini")
        config = configparser.ConfigParser()
        try:
            with open(ini) as f:
                config.read_file(f)
            self.count = config.getint("batch", "count")
        except (IOError, configparser.Error):
            self.count = 0

    def load_all_batch_images(self) -> None:
        npz = os.path.join(self.batch_dir, "batch_images.npz")
        if os.path.isfile(npz):
            with np.load(npz) as data:
                self.input_images = data["input"]
                self.input_interpolated_images = data["interpolated"]
                self.true_images = data["true"]
            self.count = int(self.input_images.shape[0])
            print("Loaded %d patches from npz store." % self.count)
            return
        # reference-built BMP store (threaded C++ reader when built)
        from dcscn_tpu.data import native

        self.load_batch_counts()
        b, s = self.batch_image_size, self.scale
        self.input_images = native.read_bmp_batch(
            os.path.join(self.batch_dir, INPUT_IMAGE_DIR), self.count, b)
        self.input_interpolated_images = native.read_bmp_batch(
            os.path.join(self.batch_dir, INTERPOLATED_IMAGE_DIR), self.count, b * s)
        self.true_images = native.read_bmp_batch(
            os.path.join(self.batch_dir, TRUE_IMAGE_DIR), self.count, b * s)
        if any(a is None for a in (self.input_images, self.input_interpolated_images,
                                   self.true_images)):
            raise IOError("failed to read bmp store under %s" % self.batch_dir)
        print("Loaded %d patches from bmp store." % self.count)

    def load_batch_image_from_disk(self, image_number: int):
        """One triple from the on-disk store (reference:
        helper/loader.py:235-243). The BMP store streams a single patch per
        call; the npz store is loaded into memory on first access (a zip
        archive has no per-record random access) and indexed from there."""
        from dcscn_tpu.data import native

        image_number = image_number % self.count
        npz = os.path.join(self.batch_dir, "batch_images.npz")
        if os.path.isfile(npz):
            if self.input_images is None:
                self.load_all_batch_images()
            return (self.input_images[image_number],
                    self.input_interpolated_images[image_number],
                    self.true_images[image_number])
        triple = []
        for sub in (INPUT_IMAGE_DIR, INTERPOLATED_IMAGE_DIR, TRUE_IMAGE_DIR):
            img = native.read_bmp(os.path.join(self.batch_dir, sub, "%06d.bmp" % image_number))
            triple.append(img[..., None])
        return tuple(triple)

    def release_batch_images(self) -> None:
        self.input_images = None
        self.input_interpolated_images = None
        self.true_images = None

    # -- sampling (host-side compatibility path) -------------------------
    def init_batch_index(self) -> None:
        self.batch_index = np.random.permutation(self.count)
        self.index = 0

    def get_next_image_no(self) -> int:
        if self.batch_index is None or self.index >= self.count:
            self.init_batch_index()
        no = int(self.batch_index[self.index])
        self.index += 1
        return no

    def load_batch_image(self, max_value: float):
        n = self.get_next_image_no()
        triple = (self.input_images[n], self.input_interpolated_images[n], self.true_images[n])
        if max_value == 255:
            return triple
        k = max_value / 255.0
        return tuple(np.multiply(t, k) for t in triple)

    # -- device store ----------------------------------------------------
    def as_store(self) -> Dict[str, np.ndarray]:
        return {
            "input": self.input_images,
            "interp": self.input_interpolated_images,
            "true": self.true_images,
        }

    def epoch_indices(self, steps: int, batch: int, rng: np.random.Generator) -> np.ndarray:
        """[steps, batch] shuffled indices, reshuffling like the reference's
        per-epoch random permutation (helper/loader.py:222-233)."""
        if self.count <= 0:
            raise ValueError(
                "patch store is empty — all training images are smaller than "
                "batch_image_size*scale (%dx%d)"
                % (self.batch_image_size * self.scale, self.batch_image_size * self.scale))
        need = steps * batch
        out = []
        have = 0
        while have < need:
            perm = rng.permutation(self.count)
            out.append(perm)
            have += self.count
        idx = np.concatenate(out)[:need]
        return idx.reshape(steps, batch).astype(np.int32)


class DynamicDataset:
    """Random-crop sampling with background prefetch
    (reference: helper/loader.py:278-355)."""

    def __init__(self, scale: int, batch_image_size: int, channels: int = 1,
                 resampling_method: str = "bicubic", prefetch_threads: int = 4,
                 prefetch_depth: int = 4, batch_num: int = 20):
        self.scale = scale
        self.batch_image_size = batch_image_size
        self.channels = channels
        self.resampling_method = resampling_method
        self.filenames: List[str] = []
        self.count = 0
        self.batch_index = None
        self.index = 0
        self._threads = prefetch_threads
        self._depth = prefetch_depth
        self._batch_num = batch_num
        self._queue: Optional[queue.Queue] = None
        self._stop = threading.Event()
        self._workers: List[threading.Thread] = []
        # bounded decoded-image cache shared by prefetch threads
        self._image_cache: Dict[str, np.ndarray] = {}
        self._cache_bytes = 0
        self._cache_budget = 2 << 30  # 2 GiB
        self._cache_lock = threading.Lock()

    def set_data_dir(self, data_dir: str) -> None:
        self.filenames = files.get_files_in_directory(data_dir)
        self.count = len(self.filenames)
        if self.count <= 0:
            raise SystemExit("Data Directory is empty: %s" % data_dir)

    # -- single-sample path (reference-compatible) ------------------------
    def init_batch_index(self) -> None:
        self.batch_index = np.random.permutation(self.count)
        self.index = 0

    def get_next_image_no(self) -> int:
        if self.batch_index is None or self.index >= self.count:
            self.init_batch_index()
        no = int(self.batch_index[self.index])
        self.index += 1
        return no

    def load_random_patch(self, filename: str) -> Optional[np.ndarray]:
        image = self._cached_image(filename)
        height, width = image.shape[0:2]
        load_size = self.batch_image_size * self.scale
        if height < load_size or width < load_size:
            print("Error: %s should have more than %d x %d size." % (filename, load_size, load_size))
            return None
        y = 0 if height == load_size else random.randrange(height - load_size)
        x = 0 if width == load_size else random.randrange(width - load_size)
        image = image[y : y + load_size, x : x + load_size, :]
        return builders.build_input_image(image, channels=self.channels, convert_ycbcr=True)

    def load_batch_image(self, max_value: float):
        image = None
        attempts = 0
        while image is None:
            attempts += 1
            if attempts > 4 * len(self.filenames) + 16:
                raise RuntimeError(
                    "no training image is at least %dx%d (batch_image_size"
                    "*scale) — cannot sample crops"
                    % (self.batch_image_size * self.scale,
                       self.batch_image_size * self.scale))
            image = self.load_random_patch(self.filenames[self.get_next_image_no()])
        if random.randrange(2) == 0:
            image = np.fliplr(image)
        input_image = resize_ops.resize_image(image, 1 / self.scale)
        input_bicubic = resize_ops.resize_image(input_image, self.scale)
        if max_value != 255:
            k = max_value / 255.0
            return (np.multiply(input_image, k), np.multiply(input_bicubic, k),
                    np.multiply(image, k))
        return input_image, input_bicubic, image

    def _cached_image(self, filename: str) -> np.ndarray:
        with self._cache_lock:
            img = self._image_cache.get(filename)
        if img is not None:
            return img
        img = imaging.load_image(filename, print_console=False)
        with self._cache_lock:
            if filename not in self._image_cache:
                # FIFO eviction under a byte budget (datasets larger than
                # the budget decode per sample, like the reference)
                while self._cache_bytes + img.nbytes > self._cache_budget and self._image_cache:
                    oldest = next(iter(self._image_cache))
                    self._cache_bytes -= self._image_cache.pop(oldest).nbytes
                if img.nbytes <= self._cache_budget:
                    self._image_cache[filename] = img
                    self._cache_bytes += img.nbytes
        return img

    # -- prefetching batched path ----------------------------------------
    def _produce_crop_batch(self, rng: random.Random) -> np.ndarray:
        """One [N, B*s, B*s, 1] float32 Y batch of augmented crops."""
        n = self._batch_num
        load_size = self.batch_image_size * self.scale
        out = np.empty((n, load_size, load_size, 1), np.float32)
        for i in range(n):
            patch = None
            attempts = 0
            while patch is None:
                attempts += 1
                if attempts > 4 * self.count + 16:
                    raise RuntimeError(
                        "no training image is at least %dx%d (batch_image_size"
                        "*scale) — cannot sample crops" % (load_size, load_size))
                filename = self.filenames[rng.randrange(self.count)]
                image = self._cached_image(filename)
                h, w = image.shape[:2]
                if h < load_size or w < load_size:
                    continue
                y = 0 if h == load_size else rng.randrange(h - load_size)
                x = 0 if w == load_size else rng.randrange(w - load_size)
                crop = image[y : y + load_size, x : x + load_size, :]
                patch = builders.build_input_image(crop, channels=self.channels,
                                                   convert_ycbcr=True)
            if rng.randrange(2) == 0:
                patch = np.fliplr(patch)
            out[i] = patch.astype(np.float32)
        return out

    def start_prefetch(self, seed: int = 0) -> None:
        if any(t.is_alive() for t in self._workers):
            return
        self._workers = []
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        self._queue = q
        stop = threading.Event()
        self._stop = stop  # fresh event per generation: stale workers from a
        # previous start keep observing their own (already-set) event

        def worker(wid: int):
            rng = random.Random(seed * 9973 + wid)
            try:
                while not stop.is_set():
                    batch = self._produce_crop_batch(rng)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.25)
                            break
                        except queue.Full:
                            continue
            except RuntimeError as e:  # unsatisfiable sampling: surface it
                q.put(e)

        for i in range(self._threads):
            t = threading.Thread(target=worker, args=(i,), daemon=True)
            t.start()
            self._workers.append(t)

    def next_crop_batch(self) -> np.ndarray:
        if not any(t.is_alive() for t in self._workers):
            self.start_prefetch()
        while True:
            try:
                item = self._queue.get(timeout=5.0)
            except queue.Empty:
                if not any(t.is_alive() for t in self._workers):
                    raise RuntimeError("all prefetch workers died; see logs")
                continue
            if isinstance(item, Exception):
                raise item
            return item

    def stop_prefetch(self) -> None:
        self._stop.set()
        for t in self._workers:
            t.join(timeout=2.0)
        self._workers = []
        self._queue = None


def device_transform_fn(batch_image_size: int, scale: int, max_value: float = 255.0):
    """Jitted transform: [N, B*s, B*s, 1] true-Y crops -> Batch-like triple
    (LR input via PIL-parity bicubic matmuls, bicubic re-upscale, truth).
    Runs the downsample/upsample on the MXU instead of host PIL."""
    import jax
    import jax.numpy as jnp

    hr = batch_image_size * scale
    down = resize_ops.device_resize_fn((hr, hr), (batch_image_size, batch_image_size))
    up = resize_ops.device_resize_fn((batch_image_size, batch_image_size), (hr, hr))

    @jax.jit
    def transform(true_batch):
        x = down(true_batch)
        x2 = up(x)
        y = true_batch.astype(jnp.float32)
        if max_value != 255.0:
            k = max_value / 255.0
            x, x2, y = x * k, x2 * k, y * k
        return x, x2, y

    return transform
