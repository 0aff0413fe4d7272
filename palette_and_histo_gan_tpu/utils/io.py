"""Filesystem and formatting utilities (reference: io_utils.py:9-22,123-136)."""

from __future__ import annotations

import os
import shutil


def ensure_folder_structure(*folders: str) -> str:
    """Create nested folders relative to cwd (io_utils.py:9-18)."""
    parts: list[str] = []
    for part in folders:
        parts.extend(part.split(os.sep))
    path = os.getcwd()
    for name in parts:
        if not name:
            continue
        path = os.path.join(path, name)
        os.makedirs(path, exist_ok=True)
    return path


def delete_folder(path: str) -> None:
    """rm -rf, ignoring errors (io_utils.py:21-22)."""
    shutil.rmtree(path, ignore_errors=True)


def seconds_to_human_readable(time: float) -> str:
    """'[D day(s), ][HHh:]MMm:SSs' (io_utils.py:123-136)."""
    days = time // 86400
    hours = time // 3600 % 24
    minutes = time // 60 % 60
    seconds = time % 60

    time_string = ""
    if days > 0:
        time_string += f"{days:.0f} day{'s' if days > 1 else ''}, "
    if hours > 0 or days > 0:
        time_string += f"{hours:02.0f}h:"
    time_string += f"{minutes:02.0f}m:{seconds:02.0f}s"
    return time_string
