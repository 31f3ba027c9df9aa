#!/usr/bin/env python3
"""Drop-in entry point: python convert_y.py [reference flags]."""
import sys

from dcscn_tpu.cli.convert_y import main

if __name__ == "__main__":
    main(sys.argv[1:])
