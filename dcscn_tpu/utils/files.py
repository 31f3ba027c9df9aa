"""Filesystem helpers (reference: helper/utilty.py:56-94)."""

from __future__ import annotations

import os
from os import listdir
from os.path import isfile, join
from typing import List


def make_dir(directory: str) -> None:
    if directory and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)


def clean_dir(path: str) -> None:
    """Recursively empty a directory (keeps the directory itself).

    Symlinks are unlinked, never followed — recursing through a directory
    symlink (e.g. a tf_log relocated to bigger storage, or a symlink-union
    dataset dir like data/combined_8) would delete the TARGET's contents.
    """
    if not os.path.isdir(path) or os.path.islink(path):
        return
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        try:
            if os.path.islink(full) or os.path.isfile(full):
                os.remove(full)
            elif os.path.isdir(full):
                clean_dir(full)
                os.rmdir(full)
        except OSError as error:
            print("OS error: {0}".format(error))


def delete_dir(directory: str) -> None:
    if os.path.exists(directory):
        clean_dir(directory)
        os.rmdir(directory)


def get_files_in_directory(path: str) -> List[str]:
    """List visible files in a directory, sorted for determinism.

    The reference returns os.listdir order (helper/utilty.py:67-71); we sort
    so evaluation order and dataset manifests are reproducible.
    """
    if not path.endswith("/"):
        path = path + "/"
    file_list = [
        path + f for f in sorted(listdir(path)) if isfile(join(path, f)) and not f.startswith(".")
    ]
    return file_list
