from kirag_tpu.data.corpus import (
    CORPUS_MAP,
    Corpus,
    HotPotQA,
    JsonCorpus,
    MuSiQue,
    WikiMultiHopQA,
    Wikipedia,
)
from kirag_tpu.data.collators import (
    COLLATOR_MAP,
    BGECollator,
    E5Collator,
    RetrieverCollator,
)
from kirag_tpu.data.datasets import (
    KGChainRetrieverSeqSampleDataset,
    RetrieverDataset,
)

__all__ = [
    "CORPUS_MAP",
    "Corpus",
    "JsonCorpus",
    "Wikipedia",
    "HotPotQA",
    "WikiMultiHopQA",
    "MuSiQue",
    "COLLATOR_MAP",
    "RetrieverCollator",
    "E5Collator",
    "BGECollator",
    "RetrieverDataset",
    "KGChainRetrieverSeqSampleDataset",
]
