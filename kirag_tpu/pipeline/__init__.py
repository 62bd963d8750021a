from kirag_tpu.pipeline.kirag import KiRAG

__all__ = ["KiRAG"]
