"""Training driver (reference: train.py:22-121): multi-trial training with
per-epoch evaluation, TB logging, checkpointing and the staircase LR
schedule, plus an optional post-training benchmark.

Differences by design (TPU-first):
- default "fast" loop keeps the whole patch store on device and lax.scans a
  full epoch per dispatch (no per-step host->device feeds); pass
  --reference_loop=True for the step-by-step host-fed loop with identical
  semantics,
- checkpoints are fully resumable (params + optimizer + LR schedule state),
  unlike the reference which restarts the schedule on warm start.

    python train.py --dataset=yang91 --test_dataset=set5 [flags]
"""

from __future__ import annotations

import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dcscn_tpu import api
from dcscn_tpu.config import parse_args
from dcscn_tpu.ops import metrics
from dcscn_tpu.utils import files, logging_util

EXTRA_FLAGS = [
    ("reference_loop", bool, False,
     "Use the reference-style per-step host-fed loop instead of the fused epoch scan."),
    ("eval_tile_size", int, 0, "tile_size used for in-training evaluation."),
    ("scan_chunk", int, 0,
     "Max steps per fused-scan dispatch (0 = whole epoch in one dispatch). "
     "Oversized single dispatches can crash the TPU worker (observed at "
     "2400 steps of 64px patches and at 4800 steps of 48px); 1200 is a "
     "proven-safe chunk."),
    ("snapshot_tail_epochs", int, 0,
     "Keep a copy of the per-epoch checkpoint (<name>_snapE<epoch>) for the "
     "last N epochs of the schedule. The snapshots sit in the same basin by "
     "construction (one low-LR trajectory tail), so averaging them with "
     "tools/soup_ckpt.py is a valid SWA-style model soup."),
]


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA_FLAGS)
    if ns.eval_tile_size > 0:
        # tile_size only affects inference, so this just controls the
        # in-training eval (training patches are fixed-size regardless)
        cfg = cfg.replace(tile_size=ns.eval_tile_size)
    model = api.SuperResolution(cfg, model_name=cfg.model_name)

    if cfg.build_batch:
        model.load_datasets(cfg.data_dir + "/" + cfg.dataset,
                            cfg.batch_dir + "/" + cfg.dataset,
                            cfg.batch_image_size, cfg.stride_size)
    else:
        model.load_dynamic_datasets(cfg.data_dir + "/" + cfg.dataset, cfg.batch_image_size)

    model.build_graph()
    model.init_all_variables()
    model.build_optimizer()
    model.build_summary_saver()

    logging.info("\n" + str(sys.argv))
    logging.info("Test Data:%s Training Data:%s" % (cfg.test_dataset, cfg.dataset))

    total_psnr = total_ssim = 0.0
    for i in range(cfg.tests):
        psnr, ssim = train(model, cfg, i, reference_loop=ns.reference_loop,
                           scan_chunk=ns.scan_chunk,
                           snapshot_tail=ns.snapshot_tail_epochs)
        total_psnr += psnr
        total_ssim += ssim
        logging.info("\nTrial(%d) %s" % (i, logging_util.get_now_date()))
        model.print_steps_completed(output_to_logging=True)
        logging.info("PSNR:%f, SSIM:%f\n" % (psnr, ssim))

    if cfg.tests > 1:
        logging.info("\n=== Final Average [%s] PSNR:%f, SSIM:%f ===" % (
            cfg.test_dataset, total_psnr / cfg.tests, total_ssim / cfg.tests))

    if model._summary is not None:
        model._summary.close()  # force event files to disk
    model.copy_log_to_archive("archive")


def _maybe_snapshot(model: api.SuperResolution, trial: int, tail: int):
    """SWA-style tail snapshots: copy the just-saved per-epoch checkpoint to
    a <name>_snapE<epoch> name during the last `tail` epochs of the schedule
    (same basin by construction — one low-LR trajectory; soup them with
    tools/soup_ckpt.py)."""
    if tail <= 0:
        return
    if model.epochs_completed > model.total_epochs - tail:
        model.save_model(name=model.name + "_snapE%d" % model.epochs_completed,
                         trial=trial)


def train(model: api.SuperResolution, cfg, trial: int, reference_loop: bool = False,
          scan_chunk: int = 0, snapshot_tail: int = 0):
    test_filenames = files.get_files_in_directory(cfg.data_dir + "/" + cfg.test_dataset)
    if len(test_filenames) <= 0:
        raise SystemExit("Can't load images from [%s]" % (cfg.data_dir + "/" + cfg.test_dataset))

    model.init_all_variables(seed=trial + cfg.train_seed)
    model.init_train_step()
    resumed = False
    if cfg.load_model_name == "resume":
        # full resume: params + optimizer + LR schedule position
        resumed = model.load_train_state(trial)
        if not resumed:
            logging.info("no training state to resume; starting fresh")
    elif cfg.load_model_name != "":
        model.load_model(cfg.load_model_name, output_log=True)

    model.init_epoch_index()

    psnr, ssim = model.evaluate(test_filenames)
    model.print_status(psnr, ssim, log=True)
    model.log_to_tensorboard(test_filenames[0], psnr, save_meta_data=True)

    steps_per_epoch = model.training_images // model.batch_num

    if reference_loop:
        psnr, ssim = _train_loop_steps(model, cfg, trial, test_filenames,
                                       steps_per_epoch, snapshot_tail=snapshot_tail)
    elif hasattr(model.train, "as_store"):
        psnr, ssim = _train_loop_scan(model, cfg, trial, test_filenames,
                                      steps_per_epoch, scan_chunk=scan_chunk,
                                      snapshot_tail=snapshot_tail)
    else:
        psnr, ssim = _train_loop_dynamic(model, cfg, trial, test_filenames,
                                         steps_per_epoch, snapshot_tail=snapshot_tail)

    model.end_train_step()
    model.save_model(trial=trial, output_log=True)

    evaluate_model(model, cfg, cfg.test_dataset)
    if cfg.do_benchmark:
        for test_data in ["set5", "set14", "bsd100"]:
            if test_data != cfg.test_dataset:
                evaluate_model(model, cfg, test_data)
    return psnr, ssim


def _train_loop_steps(model, cfg, trial, test_filenames, steps_per_epoch,
                      snapshot_tail: int = 0):
    """Reference-equivalent loop: host builds each minibatch, one jitted
    optimizer step per iteration (train.py:78-94)."""
    from dcscn_tpu.train.trainer import Batch

    psnr = ssim = 0.0
    while model.lr > cfg.end_lr:
        model.build_input_batch()
        model.train_batch()
        if model.training_step * model.batch_num >= model.training_images:
            model.epochs_completed += 1
            psnr, ssim = model.evaluate(test_filenames)
            model.print_status(psnr, ssim, log=True)
            sample = Batch(
                jnp.asarray(np.stack(model.batch_input), jnp.float32),
                jnp.asarray(np.stack(model.batch_input_bicubic), jnp.float32),
                jnp.asarray(np.stack(model.batch_true), jnp.float32),
            ) if cfg.save_weights else None
            model.log_to_tensorboard(test_filenames[0], psnr, sample_batch=sample)
            model.save_model(trial=trial)
            model.save_train_state(trial=trial)
            _maybe_snapshot(model, trial, snapshot_tail)
            model.update_epoch_and_lr()
            model.init_epoch_index()
    return psnr, ssim


def _train_loop_scan(model, cfg, trial, test_filenames, steps_per_epoch,
                     scan_chunk: int = 0, snapshot_tail: int = 0):
    """Fused epoch path: patch store on device, full epoch per dispatch
    (or `scan_chunk`-step dispatches — equivalent math, bounds the program
    the TPU worker must hold, see the flag help)."""
    trainer = model._ensure_trainer()
    if trainer.mesh is not None:
        # commit model state to the mesh explicitly (replicated) so the
        # sharded epoch scan sees consistent device sets
        model.params = trainer.replicate(jax.device_get(model.params))
        model.opt_state = trainer.replicate(jax.device_get(model.opt_state))
        if model.bn_state is not None:
            model.bn_state = trainer.replicate(jax.device_get(model.bn_state))
    store = trainer.shard_store(model.train.as_store())
    rng = np.random.default_rng(1234 + trial + cfg.train_seed)
    scan_fn = trainer.epoch_scan()
    psnr = ssim = 0.0

    chunk = scan_chunk if scan_chunk > 0 else steps_per_epoch
    if steps_per_epoch % chunk:
        logging.warning(
            "scan_chunk=%d does not divide steps_per_epoch=%d: the %d-step "
            "tail is a second program shape (one extra TPU compile)"
            % (chunk, steps_per_epoch, steps_per_epoch % chunk))
    while model.lr > cfg.end_lr:
        model.opt_state = trainer.set_lr(model.opt_state, model.lr)
        idx_np = model.train.epoch_indices(steps_per_epoch, model.batch_num, rng)
        mses_parts, loss_parts = [], []
        for k in range(0, steps_per_epoch, chunk):
            idx = trainer.shard_indices(idx_np[k : k + chunk])
            epoch_rng = jax.random.PRNGKey(model.step + k)
            (model.params, model.opt_state, model.bn_state, m) = scan_fn(
                model.params, model.opt_state, model.bn_state, store, idx,
                epoch_rng)
            mses_parts.append(np.asarray(m.mse))
            loss_parts.append(np.asarray(m.image_loss))
        model._engine = None

        mses = np.concatenate(mses_parts)
        model.training_loss_sum = float(np.concatenate(loss_parts).sum())
        model.training_psnr_sum = float(
            sum(metrics.get_psnr(v, max_value=model.max_value) for v in mses))
        model.training_step = steps_per_epoch
        model.step += steps_per_epoch
        model.epochs_completed += 1

        psnr, ssim = model.evaluate(test_filenames)
        model.print_status(psnr, ssim, log=True)
        # first step's minibatch feeds the gradient/tensor summaries
        sample = (trainer._gather_batch(store, jnp.asarray(idx_np[0]))
                  if cfg.save_weights else None)
        model.log_to_tensorboard(test_filenames[0], psnr, sample_batch=sample)
        model.save_model(trial=trial)
        model.save_train_state(trial=trial)
        _maybe_snapshot(model, trial, snapshot_tail)
        model.update_epoch_and_lr()
    return psnr, ssim


def _train_loop_dynamic(model, cfg, trial, test_filenames, steps_per_epoch,
                        snapshot_tail: int = 0):
    """Dynamic-sampling fast path: host thread pool prefetches random-crop
    batches while the device runs color/flip-free bicubic transforms + the
    train step (the reference does all of this serially per sample,
    helper/loader.py:310-355 / train.py:80-81)."""
    from dcscn_tpu.data.datasets import device_transform_fn
    from dcscn_tpu.train.trainer import Batch

    trainer = model._ensure_trainer()
    step_fn = trainer.train_step()
    transform = device_transform_fn(cfg.batch_image_size, cfg.scale, cfg.max_value)
    model.train.start_prefetch(seed=trial + cfg.train_seed)
    psnr = ssim = 0.0

    while model.lr > cfg.end_lr:
        model.opt_state = trainer.set_lr(model.opt_state, model.lr)
        mses = []
        losses = []
        sample = None
        for _ in range(steps_per_epoch):
            crops = model.train.next_crop_batch()
            x, x2, y = transform(crops)
            sample = Batch(x, x2, y)
            rng = jax.random.PRNGKey(model.step)
            model.params, model.opt_state, model.bn_state, m = step_fn(
                model.params, model.opt_state, model.bn_state, sample, rng)
            mses.append(m.mse)
            losses.append(m.image_loss)
            model.step += 1
        model._engine = None
        model.training_step = steps_per_epoch
        model.training_loss_sum = float(np.sum([np.asarray(v) for v in losses]))
        model.training_psnr_sum = float(sum(
            metrics.get_psnr(float(np.asarray(v)), max_value=model.max_value)
            for v in mses))
        model.epochs_completed += 1

        psnr, ssim = model.evaluate(test_filenames)
        model.print_status(psnr, ssim, log=True)
        model.log_to_tensorboard(test_filenames[0], psnr, sample_batch=sample)
        model.save_model(trial=trial)
        model.save_train_state(trial=trial)
        _maybe_snapshot(model, trial, snapshot_tail)
        model.update_epoch_and_lr()
    model.train.stop_prefetch()
    return psnr, ssim


def evaluate_model(model: api.SuperResolution, cfg, test_data: str):
    try:
        test_filenames = files.get_files_in_directory(cfg.data_dir + "/" + test_data)
    except FileNotFoundError:
        logging.warning("benchmark dataset [%s] not found; skipping", test_data)
        return
    if not test_filenames:
        logging.warning("benchmark dataset [%s] is empty; skipping", test_data)
        return
    total_psnr = total_ssim = 0.0
    n = 0
    for filename in test_filenames:
        psnr, ssim = model.do_for_evaluate_with_output(
            filename, output_directory=cfg.output_dir, print_console=False)
        if psnr is None:  # unreadable/unsupported image — skip
            continue
        total_psnr += psnr
        total_ssim += ssim
        n += 1
    if n == 0:
        logging.warning("benchmark dataset [%s] has no evaluable images", test_data)
        return
    logging.info("Model Average [%s] PSNR:%f, SSIM:%f" % (
        test_data, total_psnr / n, total_ssim / n))


if __name__ == "__main__":
    main(sys.argv[1:])
