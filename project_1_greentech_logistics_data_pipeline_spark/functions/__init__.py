from .deterministic import davg, dsum
from .vectors import cosine_similarity_expr, l2_normalize_expr

__all__ = ["dsum", "davg", "cosine_similarity_expr", "l2_normalize_expr"]
