"""kirag_tpu: a TPU-native knowledge-driven iterative retrieval (KiRAG) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of jyfang6/kirag:
multi-hop retrieval-augmented generation driven by knowledge triples, with the
dense-retrieval stack (bi-encoders + exact inner-product index) living entirely
on TPU as jitted, mesh-sharded programs.

Subpackages
-----------
- ``utils``      : IO, hashing, seeding, config, logging, tracing.
- ``parallel``   : device mesh construction and sharding helpers.
- ``ops``        : TPU compute primitives (pooling, chunked/Pallas MIPS top-k).
- ``models``     : BERT-family encoders and Llama-family decoder LMs in JAX.
- ``data``       : corpora, tokenization collators, training datasets.
- ``index``      : the device-resident sharded exact MIPS index (FAISS replacement).
- ``retrieval``  : the DenseRetriever facade (encode -> search -> join corpus).
- ``generation`` : the narrow LLM generation interface (JAX backend, stub, reader).
- ``kg``         : knowledge-triple extraction from documents.
- ``pipeline``   : the KiRAG iterative retrieval loop.
- ``training``   : the contrastive Aligner trainer (optax/orbax).
- ``evaluation`` : retrieval/QA metrics and evaluators.
"""

__version__ = "0.1.0"
