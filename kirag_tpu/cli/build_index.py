"""Build the device-resident index from embedding shards.

The TPU counterpart of the reference `faiss_index_corpus.py`: discovers
``corpus_embeddings_{start}_{end}.npz`` shards (sorted by start offset),
feeds them into :class:`kirag_tpu.index.TPUIndexer`, and serializes the index
(+ id map) for `retrieve`.

Usage:
  python -m kirag_tpu.cli.build_index \
    --embeddings_dir out/e5_2wiki --embedding_size 1024 --save_dir out/e5_2wiki
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import re

import numpy as np

from kirag_tpu.index import TPUIndexer
from kirag_tpu.utils.logging import setup_logger

logger = logging.getLogger(__name__)


def setup_parser():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--embeddings_dir", type=str, required=True)
    parser.add_argument("--embedding_size", type=int, default=1024)
    parser.add_argument("--metric", type=str, default="inner_product",
                        choices=["inner_product", "l2"])
    parser.add_argument("--compression", type=str, default="none",
                        choices=["none", "int8", "int4"],
                        help="int8 = 4x smaller than f32 (recall@10 ~0.98); "
                             "int4 = 8x (packed nibbles + block-128 scales, "
                             "dim must be a multiple of 256 — fits the 21M "
                             "DPR corpus on one chip at recall@100 ~0.99)")
    parser.add_argument("--shuffle_rows", action="store_true",
                        help="apply a seeded global row permutation before "
                             "indexing (ids move with rows). Recommended "
                             "when mode=approx searches will run over a "
                             "corpus whose similar passages sit adjacent "
                             "(DPR article order): approx samples one "
                             "winner per 128-row group")
    parser.add_argument("--shuffle_seed", type=int, default=0)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--delete_shards", action="store_true",
                        help="remove embedding shards after indexing (reference behavior)")
    return parser.parse_args()


def discover_shards(embeddings_dir: str):
    shards = []
    for path in glob.glob(os.path.join(embeddings_dir, "corpus_embeddings_*_*.npz")):
        m = re.search(r"corpus_embeddings_(\d+)_(\d+)\.npz$", path)
        if m:
            shards.append((int(m.group(1)), path))
    shards.sort()
    return [p for _, p in shards]


def main():
    args = setup_parser()
    os.makedirs(args.save_dir, exist_ok=True)
    setup_logger(os.path.join(args.save_dir, "build_index.log"))

    indexer = TPUIndexer(args.embedding_size, metric=args.metric,
                         compression=args.compression,
                         shuffle_rows=args.shuffle_rows,
                         shuffle_seed=args.shuffle_seed)
    shard_files = discover_shards(args.embeddings_dir)
    if not shard_files:
        raise FileNotFoundError(f"no embedding shards under {args.embeddings_dir}")
    for path in shard_files:
        data = np.load(path, allow_pickle=True)
        indexer.index_data(list(data["passage_ids"]), data["embeddings"])
        logger.info(f"indexed {path}: total {len(indexer)}")
    indexer.serialize(args.save_dir)
    logger.info(f"index serialized to {args.save_dir}")
    if args.delete_shards:
        for path in shard_files:
            os.remove(path)


if __name__ == "__main__":
    main()
