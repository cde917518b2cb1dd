from .distance import l2_expr, l2_udf, cosine_expr, dot_expr

__all__ = ["l2_expr", "l2_udf", "cosine_expr", "dot_expr"]
