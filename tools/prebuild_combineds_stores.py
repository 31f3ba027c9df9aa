"""Prebuild the combineds_8 patch stores (scale 3 and 4) on CPU so the
TPU training queue doesn't spend chip-reserved wall time patchifying.

Uses the exact same load path as the train CLI (api.load_datasets with
the same flags), so the manifest matches and the queued runs load the
cached npz store directly.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from dcscn_tpu import api  # noqa: E402
from dcscn_tpu.config import parse_args  # noqa: E402


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "combineds_8"
    for scale in (4, 3):
        cfg, _ = parse_args(["--dataset=%s" % dataset, "--scale=%d" % scale,
                             "--build_batch=True"])
        m = api.SuperResolution(cfg)
        m.load_datasets(cfg.data_dir + "/" + cfg.dataset,
                        cfg.batch_dir + "/" + cfg.dataset,
                        cfg.batch_image_size, cfg.stride_size)
        print("scale %d: %d patches" % (scale, m.train.count), flush=True)


if __name__ == "__main__":
    main()
