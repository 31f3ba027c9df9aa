#!/usr/bin/env python3
"""Drop-in entry point: python evaluate.py [reference flags]."""
import sys

from dcscn_tpu.cli.evaluate import main

if __name__ == "__main__":
    main(sys.argv[1:])
