from .scoring import score_pairs, ScoreReport
from .class_metrics import per_class_report

__all__ = ["score_pairs", "ScoreReport", "per_class_report"]
