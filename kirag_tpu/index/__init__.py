from kirag_tpu.index.indexer import TPUIndexer

# Alias matching the reference class name (`retriever/index.py:17`)
Indexer = TPUIndexer

__all__ = ["TPUIndexer", "Indexer", "CPUFlatIndex"]


def __getattr__(name):
    # lazy: the native binding builds a C++ library on first touch
    if name == "CPUFlatIndex":
        from kirag_tpu.index.native import CPUFlatIndex

        return CPUFlatIndex
    raise AttributeError(name)
