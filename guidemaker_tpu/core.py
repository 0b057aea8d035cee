"""Namespace shim mirroring ``guidemaker.core`` for drop-in compatibility."""
from .scan import PamTarget
from .targets import TargetProcessor
from .annotate import Annotation
from .dna import extend_ambiguous_dna, reverse_complement
from .io import get_fastas, is_gzip
from .score import cfd_score, get_doench_efficiency_score
from .plot import GuideMakerPlot
