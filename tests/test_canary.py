"""tools/canary_tpu.py must run and pass on the CPU backend (the same
checks it performs per-round on the real chip): tiled == whole,
fused A1+B1 == unfused, fused ensemble == host ensemble."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models",
                    "dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32.ckpt.npz")


@pytest.mark.skipif(not os.path.isfile(CKPT), reason="converted ckpt absent")
def test_canary_passes_on_cpu(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import canary_tpu
    finally:
        sys.path.pop(0)
    out = tmp_path / "canary.json"
    rc = canary_tpu.main(["--out", str(out), "--jit_cache_dir", ""])
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["ok"] is True
    assert rec["max_abs_diffs_0_255"]["tiled_vs_whole_ens1"] <= 2e-3
    assert rec["max_abs_diffs_0_255"]["fuse_a1b1_off_vs_on"] <= 2e-3
