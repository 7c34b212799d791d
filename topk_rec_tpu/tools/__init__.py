from .text import tfidf_features, lda_topics

__all__ = ["tfidf_features", "lda_topics"]
