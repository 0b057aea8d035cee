"""Scoring subsystem (Doench 2016 on-target, CFD off-target)."""
from .cfd import cfd_score
from .doench import get_doench_efficiency_score
__all__ = ["cfd_score", "get_doench_efficiency_score"]
