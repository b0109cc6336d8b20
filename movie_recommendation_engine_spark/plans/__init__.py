from .popularity import popularity_scores, popularity_top_k

__all__ = ["popularity_scores", "popularity_top_k"]
