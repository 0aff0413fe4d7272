"""Evaluation: on-TPU FID and L1 metrics."""

from .fid import FidEvaluator, frechet_distance, sqrtm_newton_schulz
from .metrics import evaluate_l1, generate_split, report_l1

__all__ = [
    "FidEvaluator",
    "frechet_distance",
    "sqrtm_newton_schulz",
    "evaluate_l1",
    "generate_split",
    "report_l1",
]
