"""User-facing facade mirroring the reference's `SuperResolution` class.

The reference fuses model, TF graph and session into one object
(DCSCN.py:28-106, helper/tf_graph.py:17-71). Here the facade is a thin
stateful shell over pure functions: params pytree + jitted engine. Method
names and call sequences match the reference so its CLI drivers port 1:1:

    model = SuperResolution(cfg, model_name)
    model.build_graph(); model.build_optimizer(); model.build_summary_saver()
    model.init_all_variables(); model.load_model()
    model.do_for_file(path) / model.do_for_evaluate(path) / ...

`load_model` reads native .npz checkpoints and falls back to converting the
reference's TF .ckpt files in place, so the shipped pretrained models load
directly.
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcscn_tpu.config import Config
from dcscn_tpu.data import builders
from dcscn_tpu.engine import InferenceEngine
from dcscn_tpu.io import checkpoint as ckpt_io
from dcscn_tpu.models import dcscn
from dcscn_tpu.ops import color, flips, metrics, patches
from dcscn_tpu.ops import resize as resize_ops
from dcscn_tpu.utils import files, imaging, logging_util


class SuperResolution:
    def __init__(self, cfg: Config, model_name: str = ""):
        if model_name and not cfg.model_name:
            cfg = cfg.replace(model_name=model_name)
        from dcscn_tpu import config as config_mod

        cfg, backend_notes = config_mod.resolve_backend_defaults(cfg)
        self.cfg = cfg
        self.name = cfg.name()
        self.resampling_method = "bicubic"
        self._engine: Optional[InferenceEngine] = None
        self._refresh_derived()  # single source for the cfg-derived attrs

        # model state
        self.params = None
        self.bn_state = None
        self.opt_state = None
        self.train = None
        self.test = None

        # training progress (reference: DCSCN.py:727-735)
        self.lr = cfg.initial_lr
        self.epochs_completed = 0
        self.epochs_completed_in_stage = 0
        self.step = 0
        self.training_step = 0
        self.training_psnr_sum = 0.0
        self.training_loss_sum = 0.0
        self.start_time = time.time()
        self.total_time = 0.0

        if cfg.jit_cache_dir:
            from dcscn_tpu.engine import init_compilation_cache

            init_compilation_cache(cfg.jit_cache_dir)

        # device pinning (the reference pins one GPU by id,
        # helper/tf_graph.py:65-71); with a single TPU this is a no-op
        devices = jax.devices()
        if 0 < cfg.gpu_device_id < len(devices):
            jax.config.update("jax_default_device", devices[cfg.gpu_device_id])

        # environment setup (reference: DCSCN.py:96-102)
        files.make_dir(cfg.checkpoint_dir)
        files.make_dir(cfg.graph_dir)
        files.make_dir(cfg.tf_log_dir)
        if cfg.initialize_tf_log:
            files.clean_dir(cfg.tf_log_dir)
        logging_util.set_logging(cfg.log_filename)
        logging.info("\ndcscn_tpu -------------------------------------")
        logging.info("%s [%s]" % (logging_util.get_now_date(), self.name))
        for note in backend_notes:
            logging.info(note)

        self._trainer = None
        self._summary = None

    # ------------------------------------------------------------------
    # Graph-era compatibility surface
    # ------------------------------------------------------------------
    def build_graph(self):
        """No graph to build — report the architecture like the reference
        logs at DCSCN.py:331-332."""
        rep = dcscn.complexity_report(self.cfg)
        logging.info(
            "Feature:%s Complexity:%s Receptive Fields:%d"
            % (rep["features"], "{:,}".format(rep["complexity"]), rep["receptive_fields"])
        )

    def build_optimizer(self):
        from dcscn_tpu.train import trainer as trainer_mod

        mesh = None
        n_dev = len(jax.devices())
        want = self.cfg.mesh_data if self.cfg.mesh_data > 0 else n_dev
        want = min(want, n_dev)
        # the minibatch shards over 'data': mesh size must divide batch_num
        while want > 1 and self.cfg.batch_num % want != 0:
            want -= 1
        if want > 1:
            from dcscn_tpu.parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh(want, 1)
            logging.info("Data-parallel mesh: %d devices" % mesh.shape["data"])
        self._trainer = trainer_mod.Trainer(self.cfg, mesh=mesh)
        self.print_num_of_total_parameters()

    def build_summary_saver(self, with_saver: bool = True):
        if self.cfg.enable_log:
            from dcscn_tpu.utils import tb

            self._summary = tb.SummaryLogger(self.cfg.tf_log_dir)

    def init_all_variables(self, seed: int = 0):
        self.params = dcscn.init_params(jax.random.PRNGKey(seed), self.cfg)
        self.bn_state = dcscn.init_bn_state(self.cfg)
        self.opt_state = None
        self._engine = None
        print("Model initialized.")

    # ------------------------------------------------------------------
    # Checkpoints
    # ------------------------------------------------------------------
    def _ckpt_base(self, name: str = "", trial: int = 0) -> str:
        if name == "" or name == "default":
            name = self.name
        suffix = "_%d" % trial if trial > 0 else ""
        return os.path.join(self.cfg.checkpoint_dir, name + suffix + ".ckpt")

    def load_model(self, name: str = "", trial: int = 0, output_log: bool = False):
        base = self._ckpt_base(name, trial)
        native = base + ".npz"
        if os.path.isfile(native):
            tree = ckpt_io.load_params(native)
            self.params = tree.get("params", tree)
            # absent key means the checkpoint has no BN running stats —
            # never carry a PREVIOUS model's stats forward silently
            self.bn_state = tree.get("bn_state")
            meta = ckpt_io.load_meta(native)
            if meta and "config" in meta:
                # adopt structural fields the model name doesn't encode
                structural = ("pixel_shuffler_filters", "legacy_skip_c", "reconstruct_layers",
                              "reconstruct_filters", "cnn_size", "nin_filters", "nin_filters2")
                overrides = {k: meta["config"][k] for k in structural if k in meta["config"]}
                if overrides and self.cfg.replace(**overrides) != self.cfg:
                    self.cfg = self.cfg.replace(**overrides)
                    self._invalidate_model_dependents()
        elif os.path.isfile(base + ".index"):
            # reference TF checkpoint: convert in place
            from dcscn_tpu.io import tf_ckpt

            new_cfg = tf_ckpt.infer_config_overrides(base, self.cfg)
            if new_cfg != self.cfg:
                self.cfg = new_cfg
                self._invalidate_model_dependents()
            raw = tf_ckpt.convert_tf_checkpoint(base, self.cfg)
            self.params, bn = tf_ckpt.split_bn(raw)
            if bn is not None:
                self.bn_state = bn
        else:
            print("Error. [%s] is not exist!" % base)
            raise SystemExit(-1)
        self._engine = None
        msg = "Model restored [ %s ]." % base
        logging.info(msg) if output_log else print(msg)

    def save_model(self, name: str = "", trial: int = 0, output_log: bool = False):
        base = self._ckpt_base(name, trial)
        import dataclasses

        ckpt_io.save_params(
            base + ".npz",
            {"params": self.params, "bn_state": self.bn_state},
            meta={"model_name": self.name, "config": dataclasses.asdict(self.cfg)},
        )
        msg = "Model saved [%s]." % base
        logging.info(msg) if output_log else print(msg)

    def load_graph(self, frozen_graph_path: str = ""):
        """Load an exported inference artifact (reference frozen-graph
        equivalent, DCSCN.py:192-220): a params .npz + config json produced
        by `dcscn_tpu.io.export.export_model`, or an actual reference
        frozen_model.pb (helper/custom_freeze_graph.py:14-61) whose Const
        weights are converted in place."""
        from dcscn_tpu.io import export

        # the artifact carries the full model config — preserve this
        # session's environment/runtime fields, adopt the model fields
        runtime_keep = dict(
            checkpoint_dir=self.cfg.checkpoint_dir, data_dir=self.cfg.data_dir,
            output_dir=self.cfg.output_dir, tf_log_dir=self.cfg.tf_log_dir,
            batch_dir=self.cfg.batch_dir, log_filename=self.cfg.log_filename,
            test_dataset=self.cfg.test_dataset, dataset=self.cfg.dataset,
            frozenInference=True, frozen_graph_path=self.cfg.frozen_graph_path,
            tile_size=self.cfg.tile_size, jit_cache_dir=self.cfg.jit_cache_dir,
            enable_log=self.cfg.enable_log, initialize_tf_log=False,
            # inference-protocol knobs follow THIS session's flags, not the
            # artifact's training-time values (parity with the non-frozen
            # path under identical CLI flags)
            self_ensemble=self.cfg.self_ensemble, max_value=self.cfg.max_value,
            mesh_spatial=self.cfg.mesh_spatial,
        )
        path = frozen_graph_path or self.cfg.frozen_graph_path
        if path.endswith(".pb"):
            # reference frozen GraphDef: architecture comes from this
            # session's flags (the reference requires matching eval args,
            # README.md:123) plus shape-inferred overrides
            from dcscn_tpu.io import tf_ckpt

            raw, cfg = tf_ckpt.convert_frozen_graph(path, self.cfg)
            self.params, self.bn_state = tf_ckpt.split_bn(raw)
        else:
            self.params, self.bn_state, cfg = export.load_exported(path, self.cfg)
        self.cfg = cfg.replace(**runtime_keep)
        self._refresh_derived()

    def _invalidate_model_dependents(self):
        """The architecture config changed (checkpoint overrides): anything
        built against the old config must be rebuilt."""
        self._trainer = None
        self.opt_state = None
        self._refresh_derived()

    def _refresh_derived(self):
        """(Re-)sync cached attributes from self.cfg — the single list,
        used by __init__ and after every cfg change."""
        cfg = self.cfg  # self.name stays as derived at construction time,
        # matching the reference's use of the CLI-config name for output dirs
        self.scale = cfg.scale
        self.max_value = cfg.max_value
        self.channels = cfg.channels
        self.output_channels = cfg.output_channels
        self.self_ensemble = cfg.self_ensemble
        self.psnr_calc_border_size = cfg.effective_psnr_border
        self.batch_num = cfg.batch_num
        self.batch_image_size = cfg.batch_image_size
        self.stride_size = cfg.effective_stride_size
        self.training_images = cfg.effective_training_images
        self.total_epochs = cfg.total_epochs
        self.compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._engine = None

    # ------------------------------------------------------------------
    # Inference (reference: DCSCN.py:547-614)
    # ------------------------------------------------------------------
    @property
    def engine(self) -> InferenceEngine:
        if self._engine is None:
            if self.params is None:
                raise RuntimeError("call init_all_variables() or load_model() first")
            self._engine = InferenceEngine(
                self.params, self.cfg, bn_state=self.bn_state, compute_dtype=self.compute_dtype
            )
        return self._engine

    def do(self, input_image: np.ndarray, bicubic_input_image: Optional[np.ndarray] = None):
        return self.engine.run(input_image, bicubic_input_image)

    def do_for_file(self, file_path: str, output_folder: str = "output"):
        """Upscale one file; write original/bicubic/result artifacts
        (reference: DCSCN.py:588-614)."""
        org_image = imaging.load_image(file_path)

        filename, extension = os.path.splitext(os.path.basename(file_path))
        output_folder += "/" + self.name + "/"
        imaging.save_image(output_folder + filename + extension, org_image)

        scaled_image = resize_ops.resize_image(org_image, self.scale)
        imaging.save_image(output_folder + filename + "_bicubic" + extension, scaled_image)

        if org_image.ndim >= 3 and org_image.shape[2] == 3 and self.channels == 1:
            input_y_image = color.convert_rgb_to_y(org_image)
            scaled_y = resize_ops.resize_image(input_y_image, self.scale)
            imaging.save_image(output_folder + filename + "_bicubic_y" + extension, scaled_y)
            output_y_image = self.do(input_y_image)
            imaging.save_image(output_folder + filename + "_result_y" + extension, output_y_image)

            scaled_ycbcr = color.convert_rgb_to_ycbcr(scaled_image)
            image = color.convert_y_and_cbcr_to_rgb(output_y_image, scaled_ycbcr[:, :, 1:3])
        else:
            # the reference saves a _bicubic_y artifact in the monochrome
            # branch too (DCSCN.py:610-611, a duplicate of _bicubic)
            imaging.save_image(output_folder + filename + "_bicubic_y" + extension, scaled_image)
            image = self.do(org_image)

        imaging.save_image(output_folder + filename + "_result" + extension, image)

    def _prepare_eval_images(self, file_path: str):
        true_image = patches.set_image_alignment(
            imaging.load_image(file_path, print_console=False), self.scale
        )
        if true_image.shape[2] == 3 and self.channels == 1:
            input_y = builders.build_input_image(
                true_image, channels=self.channels, scale=self.scale,
                alignment=self.scale, convert_ycbcr=True,
            )
            true_y = color.convert_rgb_to_y(true_image)
            return true_image, input_y, true_y
        if true_image.shape[2] == 1 and self.channels == 1:
            input_img = builders.build_input_image(
                true_image, channels=self.channels, scale=self.scale, alignment=self.scale
            )
            return true_image, input_img, true_image
        return true_image, None, None

    def do_for_evaluate_batch(self, file_paths):
        """PSNR/SSIM for a whole file list with dataset-batched inference:
        images sharing a tile layout ride one canvas + one chunked dispatch
        (engine.run_many), amortizing per-dispatch overhead across the
        dataset. Same metrics as do_for_evaluate, returned in input order
        as a list of (psnr, ssim) (None pairs for unreadable images)."""
        inputs, bicubics, trues, idxs = [], [], [], []
        results = [(None, None)] * len(file_paths)
        for i, path in enumerate(file_paths):
            _, input_y, true_y = self._prepare_eval_images(path)
            if input_y is None:
                continue
            inputs.append(input_y)
            bicubics.append(resize_ops.resize_image(input_y, self.scale))
            trues.append(true_y)
            idxs.append(i)
        outs = self.engine.run_many(inputs, bicubics)
        for i, true_y, output_y in zip(idxs, trues, outs):
            results[i] = metrics.compute_psnr_and_ssim(
                true_y, output_y, border_size=self.psnr_calc_border_size,
                literal_ssim=self.cfg.reference_ssim)
        return results

    def do_for_evaluate(self, file_path: str, print_console: bool = False):
        """PSNR/SSIM for one file (reference: DCSCN.py:672-703)."""
        _, input_y, true_y = self._prepare_eval_images(file_path)
        if input_y is None:
            return None, None
        bicubic_y = resize_ops.resize_image(input_y, self.scale)
        output_y = self.do(input_y, bicubic_y)
        psnr, ssim = metrics.compute_psnr_and_ssim(
            true_y, output_y, border_size=self.psnr_calc_border_size,
                literal_ssim=self.cfg.reference_ssim
        )
        if print_console:
            print("[%s] PSNR:%f, SSIM:%f" % (file_path, psnr, ssim))
        return psnr, ssim

    def do_for_evaluate_with_output(
        self, file_path: str, output_directory: str, print_console: bool = False
    ):
        """Evaluate + dump true/input/bicubic/result/loss artifacts
        (reference: DCSCN.py:616-670)."""
        filename, extension = os.path.splitext(file_path)
        output_directory += "/" + self.name + "/"
        files.make_dir(output_directory)

        true_image = patches.set_image_alignment(
            imaging.load_image(file_path, print_console=False), self.scale
        )
        input_image = resize_ops.resize_image(true_image, 1.0 / self.scale)
        input_bicubic = resize_ops.resize_image(input_image, self.scale)
        imaging.save_image(output_directory + filename + "_input_bicubic" + extension, input_bicubic)

        if true_image.shape[2] == 3 and self.channels == 1:
            input_y = builders.build_input_image(
                true_image, channels=self.channels, scale=self.scale,
                alignment=self.scale, convert_ycbcr=True,
            )
            bicubic_y = resize_ops.resize_image(input_y, self.scale)
            true_ycbcr = color.convert_rgb_to_ycbcr(true_image)

            output_y = self.do(input_y, bicubic_y)
            psnr, ssim = metrics.compute_psnr_and_ssim(
                true_ycbcr[:, :, 0:1], output_y, border_size=self.psnr_calc_border_size,
                literal_ssim=self.cfg.reference_ssim
            )
            loss_image = metrics.get_loss_image(
                true_ycbcr[:, :, 0:1], output_y, border_size=self.psnr_calc_border_size
            )
            output_color = color.convert_y_and_cbcr_to_rgb(output_y, true_ycbcr[:, :, 1:3])

            imaging.save_image(output_directory + file_path, true_image)
            imaging.save_image(output_directory + filename + "_input" + extension, input_y)
            imaging.save_image(output_directory + filename + "_input_bicubic_y" + extension, bicubic_y)
            imaging.save_image(output_directory + filename + "_true_y" + extension, true_ycbcr[:, :, 0:1])
            imaging.save_image(output_directory + filename + "_result" + extension, output_y)
            imaging.save_image(output_directory + filename + "_result_c" + extension, output_color)
            imaging.save_image(output_directory + filename + "_loss" + extension, loss_image)
        elif true_image.shape[2] == 1 and self.channels == 1:
            input_img = builders.build_input_image(
                true_image, channels=self.channels, scale=self.scale, alignment=self.scale
            )
            bicubic_y = resize_ops.resize_image(input_img, self.scale)
            output = self.do(input_img, bicubic_y)
            psnr, ssim = metrics.compute_psnr_and_ssim(
                true_image, output, border_size=self.psnr_calc_border_size,
                literal_ssim=self.cfg.reference_ssim
            )
            imaging.save_image(output_directory + file_path, true_image)
            imaging.save_image(output_directory + filename + "_result" + extension, output)
        else:
            return None, None

        if print_console:
            print("[%s] PSNR:%f, SSIM:%f" % (filename, psnr, ssim))
        return psnr, ssim

    def evaluate(self, test_filenames) -> Tuple[float, float]:
        """Mean PSNR/SSIM over files (reference: DCSCN.py:534-545).

        Rides the pipelined batch path (outputs bit-identical to the
        per-image loop, dispatch latency overlapped — this runs every
        training epoch); unreadable/unsupported images are skipped like
        do_for_evaluate_batch documents."""
        if len(test_filenames) == 0:
            return 0, 0
        pairs = [p for p in self.do_for_evaluate_batch(test_filenames)
                 if p[0] is not None]
        if not pairs:
            return 0, 0
        return (sum(p for p, _ in pairs) / len(pairs),
                sum(s for _, s in pairs) / len(pairs))

    def evaluate_bicubic(self, file_path: str, print_console: bool = False):
        """No-model bicubic control (reference: DCSCN.py:705-725)."""
        _, input_img, true_y = self._prepare_eval_images(file_path)
        if input_img is None:
            return None, None
        input_bicubic = resize_ops.resize_image(input_img, self.scale)
        psnr, ssim = metrics.compute_psnr_and_ssim(
            true_y, input_bicubic, border_size=self.psnr_calc_border_size,
                literal_ssim=self.cfg.reference_ssim
        )
        if print_console:
            print("PSNR:%f, SSIM:%f" % (psnr, ssim))
        return psnr, ssim

    # ------------------------------------------------------------------
    # Datasets (reference: DCSCN.py:146-173)
    # ------------------------------------------------------------------
    def load_datasets(self, data_dir: str, batch_dir: str, batch_image_size: int,
                      stride_size: int = 0):
        """Prebuilt patch store (reference: DCSCN.py:155-173)."""
        from dcscn_tpu.data import datasets

        batch_dir += "/scale%d" % self.scale
        self.train = datasets.PatchDataset(
            self.scale, batch_dir, batch_image_size, stride_size,
            channels=self.channels, resampling_method=self.resampling_method,
            store_format=self.cfg.batch_format,
        )
        if not self.train.is_batch_exist():
            self.train.build_batch(data_dir)  # leaves the store in memory
        else:
            self.train.load_batch_counts()
            self.train.load_all_batch_images()

    def load_dynamic_datasets(self, data_dir: str, batch_image_size: int):
        """Online random-crop sampling (reference: DCSCN.py:146-153)."""
        from dcscn_tpu.data import datasets

        self.train = datasets.DynamicDataset(
            self.scale, batch_image_size, channels=self.channels,
            resampling_method=self.resampling_method, batch_num=self.batch_num,
        )
        self.train.set_data_dir(data_dir)

    # ------------------------------------------------------------------
    # Reference-compatible per-step training path (DCSCN.py:175-190, :415-425)
    # ------------------------------------------------------------------
    def init_epoch_index(self):
        self.batch_input = self.batch_num * [None]
        self.batch_input_bicubic = self.batch_num * [None]
        self.batch_true = self.batch_num * [None]
        self.training_psnr_sum = 0.0
        self.training_loss_sum = 0.0
        self.training_step = 0
        self.train.init_batch_index()

    def build_input_batch(self):
        for i in range(self.batch_num):
            (self.batch_input[i], self.batch_input_bicubic[i],
             self.batch_true[i]) = self.train.load_batch_image(self.max_value)

    def _ensure_trainer(self):
        if self._trainer is None:
            self.build_optimizer()
        if not hasattr(self, "opt_state") or self.opt_state is None:
            self.opt_state = self._trainer.init_opt_state(self.params)
        return self._trainer

    def train_batch(self):
        """One optimizer step on the staged host batch
        (reference: DCSCN.py:415-425)."""
        from dcscn_tpu.train.trainer import Batch

        trainer = self._ensure_trainer()
        self.opt_state = trainer.set_lr(self.opt_state, self.lr)
        batch = Batch(
            jnp.asarray(np.stack(self.batch_input), jnp.float32),
            jnp.asarray(np.stack(self.batch_input_bicubic), jnp.float32),
            jnp.asarray(np.stack(self.batch_true), jnp.float32),
        )
        rng = jax.random.PRNGKey(self.step)
        step_fn = trainer.train_step()
        self.params, self.opt_state, self.bn_state, m = step_fn(
            self.params, self.opt_state, self.bn_state, batch, rng)
        image_loss = float(m.image_loss)
        mse = float(m.mse)
        self.training_loss_sum += image_loss
        self.training_psnr_sum += metrics.get_psnr(mse, max_value=self.max_value)
        self.training_step += 1
        self.step += 1
        self._engine = None  # params changed

    def log_to_tensorboard(self, test_filename: str, psnr: float, save_meta_data: bool = False,
                           sample_batch=None):
        """Per-epoch scalar/histogram logging (reference: DCSCN.py:427-482).

        With `sample_batch` (a trainer.Batch) and --save_weights, also logs
        per-gradient mean/stddev/histograms and the input/output tensor
        summaries the reference emits (DCSCN.py:238, :329, :397-404) — via
        one extra jitted grad eval on that batch."""
        if not self.cfg.enable_log or self._summary is None:
            return
        if not self.cfg.use_l1_loss and self.training_step != 0:
            self._summary.scalar("train", "PSNR",
                                 self.training_psnr_sum / self.training_step,
                                 self.epochs_completed)
        if self.training_step != 0:
            # mean image loss (MSE, or L1 under --use_l1_loss — without this
            # an L1 run would log no training-quality scalar at all)
            self._summary.scalar("train", "loss",
                                 self.training_loss_sum / self.training_step,
                                 self.epochs_completed)
        self._summary.scalar("train", "LR", self.lr, self.epochs_completed)
        self._summary.scalar("test", "PSNR", psnr, self.epochs_completed)
        if self.cfg.save_weights and self.params is not None:
            self._summary.weight_summaries(self.params, self.epochs_completed)
            if sample_batch is not None and self._trainer is not None:
                try:
                    grads, y = self._trainer.grad_sample()(
                        self.params, self.bn_state, sample_batch,
                        jax.random.PRNGKey(self.step))
                    self._summary.grad_summaries(grads, self.epochs_completed)
                    self._summary.tensor_summaries(
                        "X/output", sample_batch.x, self.epochs_completed)
                    self._summary.tensor_summaries(
                        "Y_/output", y, self.epochs_completed)
                except Exception as e:  # summaries must never break training
                    logging.warning("gradient summaries failed: %s" % e)
        if self.cfg.save_images and self.params is not None:
            self._summary.kernel_images(self.params, self.epochs_completed,
                                        max_outputs=self.cfg.save_images_num)
        if save_meta_data and self.cfg.save_meta_data:
            self.save_profile_trace(test_filename)
        self._summary.flush()

    def save_profile_trace(self, test_filename: str):
        """jax.profiler trace of one forward (replaces TF RunMetadata dumps,
        reference: DCSCN.py:453-468)."""
        trace_dir = os.path.join(self.cfg.tf_log_dir, "profile")
        try:
            input_y, _ = self._prepare_eval_images(test_filename)[1:3]
            if input_y is None:
                return
            with jax.profiler.trace(trace_dir):
                self.do(input_y)
            logging.info("Profiler trace saved under [%s]" % trace_dir)
        except Exception as e:  # profiling must never break training
            logging.warning("profile trace failed: %s" % e)

    # ------------------------------------------------------------------
    # Training progress helpers (loop lives in train/trainer.py)
    # ------------------------------------------------------------------
    def init_train_step(self):
        self.lr = self.cfg.initial_lr
        self.epochs_completed = 0
        self.epochs_completed_in_stage = 0
        self.step = 0
        self.start_time = time.time()

    def end_train_step(self):
        self.total_time = time.time() - self.start_time

    def update_epoch_and_lr(self) -> bool:
        """Staircase LR (reference: DCSCN.py:484-495)."""
        self.epochs_completed_in_stage += 1
        if self.epochs_completed_in_stage >= self.cfg.lr_decay_epoch:
            self.lr *= self.cfg.lr_decay
            self.epochs_completed_in_stage = 0
            return True
        return False

    def print_status(self, psnr: float, ssim: float, log: bool = False):
        """Progress line with sec/step + ETA (reference: DCSCN.py:497-524)."""
        if self.step == 0:
            logging.info("Initial PSNR:%f SSIM:%f" % (psnr, ssim))
            return
        processing_time = (time.time() - self.start_time) / self.step
        if self.cfg.use_l1_loss:
            line_a = "%s Step:%s PSNR:%f SSIM:%f (Training Loss:%0.3f)" % (
                logging_util.get_now_date(), "{:,}".format(self.step), psnr, ssim,
                self.training_loss_sum / max(self.training_step, 1))
        else:
            line_a = "%s Step:%s PSNR:%f SSIM:%f (Training PSNR:%0.3f)" % (
                logging_util.get_now_date(), "{:,}".format(self.step), psnr, ssim,
                self.training_psnr_sum / max(self.training_step, 1))
        estimated = processing_time * (self.total_epochs - self.epochs_completed) * (
            self.training_images // self.batch_num)
        h = estimated // (60 * 60)
        estimated -= h * 60 * 60
        m = estimated // 60
        s = estimated - m * 60
        line_b = "Epoch:%d LR:%f (%2.3fsec/step) Estimated:%d:%d:%d" % (
            self.epochs_completed, self.lr, processing_time, h, m, s)
        if log:
            logging.info(line_a)
            logging.info(line_b)
        else:
            print(line_a)
            print(line_b)

    def print_steps_completed(self, output_to_logging: bool = False):
        if self.step == 0:
            return
        processing_time = self.total_time / self.step
        h = self.total_time // (60 * 60)
        m = (self.total_time - h * 60 * 60) // 60
        s = self.total_time - h * 60 * 60 - m * 60
        status = ("Finished at Total Epoch:%d Steps:%s Time:%02d:%02d:%02d "
                  "(%2.3fsec/step) %d x %d x %d patches" % (
                      self.epochs_completed, "{:,}".format(self.step), h, m, s,
                      processing_time, self.batch_image_size, self.batch_image_size,
                      self.training_images))
        if output_to_logging:
            logging.info(status)
        else:
            print(status)

    def print_num_of_total_parameters(self, output_detail: bool = False,
                                      output_to_logging: bool = True):
        """Parameter-count report (reference: helper/utilty.py:569-592)."""
        if self.params is None:
            return
        parts = []
        total = 0
        count = 0
        for lname, layer in self.params.items():
            for k, v in layer.items():
                n = int(np.prod(np.shape(v)))
                total += n
                count += 1
                parts.append("%s/%s %s=%d" % (lname, k, tuple(np.shape(v)), n))
        line = "Total %d variables, %s params" % (count, "{:,}".format(total))
        if output_to_logging:
            if output_detail:
                logging.info(", ".join(parts))
            logging.info(line)
        else:
            if output_detail:
                print(", ".join(parts))
            print(line)

    # full resumable training state (params+optimizer+schedule) — the
    # reference saves only weights and restarts the LR schedule (SURVEY §5)
    def save_train_state(self, trial: int = 0):
        # ckpt_io writes tmp-then-rename: a crash never corrupts the ckpt
        ckpt_io.save_train_state(
            self._ckpt_base("", trial) + ".train.npz",
            self.params, self.opt_state, bn_state=self.bn_state,
            step=self.step, epochs_completed=self.epochs_completed,
            epochs_in_stage=self.epochs_completed_in_stage, lr=self.lr)

    def load_train_state(self, trial: int = 0) -> bool:
        base = self._ckpt_base("", trial) + ".train.npz"
        if not os.path.isfile(base):
            return False
        self._ensure_trainer()
        # _ensure_trainer just initialized self.opt_state — reuse it as the
        # restore template instead of materializing a second full state
        params, opt_state, bn_state, meta = ckpt_io.load_train_state(
            base, self.opt_state)
        self.params, self.opt_state = params, opt_state
        self.bn_state = bn_state
        self.step = int(meta.get("step", 0))
        self.epochs_completed = int(meta.get("epochs_completed", 0))
        self.epochs_completed_in_stage = int(meta.get("epochs_in_stage", 0))
        self.lr = float(meta.get("lr", self.cfg.initial_lr))
        self._engine = None
        logging.info("Training state resumed [ %s ] (epoch %d, step %d, lr %g)"
                     % (base, self.epochs_completed, self.step, self.lr))
        return True

    def print_weight_variables(self, max_values: int = 512):
        """Dump weight/bias tensor values (reference: DCSCN.py:526-531,
        helper/utilty.py:539-558)."""
        for lname, layer in (self.params or {}).items():
            for k, v in layer.items():
                arr = np.asarray(v)
                print("Tensor[%s/%s] shape=%s" % (lname, k, tuple(arr.shape)))
                flat = arr.reshape(-1)
                print(" ".join("%2.3f" % x for x in flat[:max_values])
                      + (" ..." if flat.size > max_values else ""))

    def copy_log_to_archive(self, archive_name: str):
        import shutil

        archive_directory = self.cfg.tf_log_dir + "_" + archive_name
        model_archive_directory = archive_directory + "/" + self.name
        files.make_dir(archive_directory)
        files.delete_dir(model_archive_directory)
        try:
            shutil.copytree(self.cfg.tf_log_dir, model_archive_directory)
            print("log archived to [%s]." % model_archive_directory)
        except OSError as e:
            print(e)
            print("NG: log archived to [%s]." % model_archive_directory)
