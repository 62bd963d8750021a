from kirag_tpu.index.indexer import TPUIndexer

# Alias matching the reference class name (`retriever/index.py:17`)
Indexer = TPUIndexer

__all__ = ["TPUIndexer", "Indexer"]
