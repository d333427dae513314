from . import geometry, sampling, pairs, congruent, lcp, select

__all__ = ["geometry", "sampling", "pairs", "congruent", "lcp", "select"]
