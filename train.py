#!/usr/bin/env python3
"""Drop-in entry point: python train.py [reference flags]."""
import sys

from dcscn_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:])
