"""Filesystem, plotting, and logging utilities."""

from .io import delete_folder, ensure_folder_structure, seconds_to_human_readable
from .logging import MetricsWriter, make_writer, quantize_step

__all__ = [
    "delete_folder",
    "ensure_folder_structure",
    "seconds_to_human_readable",
    "MetricsWriter",
    "make_writer",
    "quantize_step",
]
