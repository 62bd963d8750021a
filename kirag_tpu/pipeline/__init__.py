from kirag_tpu.pipeline.kirag import KiRAG
from kirag_tpu.pipeline.selector import TripleSelector

__all__ = ["KiRAG", "TripleSelector"]
