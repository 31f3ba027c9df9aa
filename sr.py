#!/usr/bin/env python3
"""Drop-in entry point: python sr.py --file=image.jpg [reference flags]."""
import sys

from dcscn_tpu.cli.sr import main

if __name__ == "__main__":
    main(sys.argv[1:])
