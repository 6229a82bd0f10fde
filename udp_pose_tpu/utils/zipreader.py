"""Read images from inside zip archives: ``archive.zip@member.jpg`` paths.

Parity: deep_hrnet/lib/utils/zipreader.py:23-46 — a process-wide handle
cache so each archive opens once per worker.
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

_cache = {}


def split_zip_path(path):
    pos = path.index("@")
    return path[:pos], path[pos + 1:]


def is_zip_path(path):
    return "@" in path


def read_bytes(path):
    zip_path, member = split_zip_path(path)
    zf = _cache.get(zip_path)
    if zf is None:
        zf = zipfile.ZipFile(zip_path, "r")
        _cache[zip_path] = zf
    return zf.read(member.lstrip("/"))


def imread(path, flags=None):
    """cv2.imread semantics for zip-member paths."""
    import cv2
    data = np.frombuffer(read_bytes(path), np.uint8)
    if flags is None:
        flags = cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION
    return cv2.imdecode(data, flags)
