"""Evaluate model performance over benchmark datasets.

Mirrors the reference CLI (evaluate.py:38-107): same flags (plus
--save_results / --compute_bicubic extras), same log lines, same
output-directory artifacts, per-image wall-clock timing.

    python evaluate.py --test_dataset=all --layers=7 --filters=32 ...
"""

from __future__ import annotations

import logging
import sys
import time

from dcscn_tpu import api
from dcscn_tpu.config import parse_args
from dcscn_tpu.utils import files

EXTRA_FLAGS = [
    ("save_results", bool, True, "Save result, bicubic and loss images."),
    ("compute_bicubic", bool, False, "Compute bicubic performance."),
    ("batch_eval", bool, False,
     "Batch the whole dataset into pipelined/shared dispatches "
     "(engine.run_many), amortizing per-dispatch overhead. Requires "
     "--save_results=False (result-image dumping needs the per-image "
     "path). Per-image Time(s) is the amortized average."),
]


def evaluate_bicubic(model: api.SuperResolution, cfg, test_data: str):
    test_filenames = files.get_files_in_directory(cfg.data_dir + "/" + test_data)
    if not test_filenames:
        logging.warning("no evaluable images in [%s]" % test_data)
        return
    total_psnr = total_ssim = 0.0
    n = 0
    for filename in test_filenames:
        psnr, ssim = model.evaluate_bicubic(filename, print_console=False)
        if psnr is None:  # unreadable/unsupported image — skip, like the model path
            continue
        total_psnr += psnr
        total_ssim += ssim
        n += 1
    if n == 0:
        logging.warning("no evaluable images in [%s]" % test_data)
        return
    logging.info("Bicubic Average [%s] PSNR:%f, SSIM:%f" % (
        test_data, total_psnr / n, total_ssim / n))


def evaluate_model(model: api.SuperResolution, cfg, test_data: str, save_results: bool,
                   batch_eval: bool = False):
    test_filenames = files.get_files_in_directory(cfg.data_dir + "/" + test_data)
    total_psnr = total_ssim = total_time = 0.0
    if batch_eval and save_results:
        logging.info("--batch_eval requires --save_results=False (result-image "
                     "dumping needs the per-image path); using per-image eval")
    if batch_eval and not save_results:
        start = time.time()
        pairs = model.do_for_evaluate_batch(test_filenames)
        total_time = time.time() - start
        pairs = [p for p in pairs if p[0] is not None]
        n = len(pairs)
        if n == 0:
            logging.warning("no evaluable images in [%s]" % test_data)
            return 0.0, 0.0
        total_psnr = sum(p for p, _ in pairs)
        total_ssim = sum(s for _, s in pairs)
        logging.info("Model Average [%s] PSNR:%f, SSIM:%f, Time (s): %f" % (
            test_data, total_psnr / n, total_ssim / n, total_time / n))
        return total_psnr / n, total_ssim / n
    if not test_filenames:
        logging.warning("no evaluable images in [%s]" % test_data)
        return 0.0, 0.0
    n = 0
    for filename in test_filenames:
        start = time.time()
        if save_results:
            psnr, ssim = model.do_for_evaluate_with_output(
                filename, output_directory=cfg.output_dir, print_console=False)
        else:
            psnr, ssim = model.do_for_evaluate(filename, print_console=False)
        total_time += time.time() - start
        if psnr is None:  # unreadable/unsupported image — skip, like batch mode
            continue
        total_psnr += psnr
        total_ssim += ssim
        n += 1
    if n == 0:
        logging.warning("no evaluable images in [%s]" % test_data)
        return 0.0, 0.0
    logging.info("Model Average [%s] PSNR:%f, SSIM:%f, Time (s): %f" % (
        test_data, total_psnr / n, total_ssim / n, total_time / n))
    return total_psnr / n, total_ssim / n


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA_FLAGS)
    model = api.SuperResolution(cfg, model_name=cfg.model_name)
    if cfg.frozenInference:
        model.load_graph(cfg.frozen_graph_path)
        model.build_summary_saver(with_saver=False)
    else:
        model.build_graph()
        model.build_summary_saver()
        model.init_all_variables()

    test_list = ["set5", "set14", "bsd100"] if cfg.test_dataset == "all" else [cfg.test_dataset]

    for i in range(cfg.tests):
        if not cfg.frozenInference:
            model.load_model(cfg.load_model_name, trial=i, output_log=cfg.tests > 1)

        if ns.compute_bicubic:
            for test_data in test_list:
                print(test_data)
                evaluate_bicubic(model, cfg, test_data)

        for test_data in test_list:
            evaluate_model(model, cfg, test_data, ns.save_results,
                           batch_eval=ns.batch_eval)


if __name__ == "__main__":
    main(sys.argv[1:])
