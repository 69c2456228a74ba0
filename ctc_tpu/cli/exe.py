"""Preset experiment launcher — the ctc_exe.py equivalent.

The reference's documented workflow is "modify CTC_exe.py" (README.md:40-46):
a script that injects a fixed argv (temporal=10, gap=2, num_trans=2, paths)
and runs main() under pdb.  Here the same preset is data, overridable from
the command line; crashes surface through the test suite and health guards
rather than an interactive debugger.

Run: ``python -m ctc_tpu.cli.exe [extra flags override the preset]``
"""

from __future__ import annotations

import sys

from ctc_tpu.cli.main import main

# the reference experiment preset (ctc_exe.py:13-26)
PRESET = [
    "--temporal", "10",
    "--gap", "2",
    "--num-trans", "2",
    "--name", "Triplet_Single_CTC_predict",
    "--cache-dir", "./cr_caches/",
    "--rgb-data", "./charades/Charades_v1_rgb/",
    "--rgb-my-data", "./charades/Mydata_rgb",
    "--rgb-pretrained-weights", "./charades/rgb_i3d_pretrained.pt",
    "--resume", "./cr_caches/Triplet_Single_CTC_predict",
    "--train-file", "./charades/Charades/Charades_v1_train.csv",
    "--val-file", "./charades/Charades/Charades_v1_test.csv",
]


def run(extra=None):
    argv = PRESET + list(extra if extra is not None else sys.argv[1:])
    return main(argv)


if __name__ == "__main__":
    run()
