from kirag_tpu.retrieval.dense import DenseRetriever

__all__ = ["DenseRetriever"]
