"""Offline knowledge-triple extraction for a whole corpus.

The counterpart of the reference `construct_kg_corpus.py`: runs the
KGGenerator over every corpus document with the triple cache enabled, saving
the cache every ``--save_every`` batches.

Usage:
  python -m kirag_tpu.cli.construct_kg_corpus \
    --corpus 2wikimultihopqa --llm /ckpts/Meta-Llama-3-8B-Instruct \
    --cached_kg_triples_file out/kg_cache.pkl
"""

from __future__ import annotations

import argparse
import logging
import os

from kirag_tpu.cli.common import add_corpus_args, build_corpus
from kirag_tpu.utils.logging import setup_logger

logger = logging.getLogger(__name__)


def setup_parser():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_corpus_args(parser)
    parser.add_argument("--dataset", type=str, default=None,
                        help="examplar type (defaults to --corpus)")
    parser.add_argument("--llm", type=str, required=True)
    parser.add_argument("--llm_tokenizer", type=str, default=None)
    parser.add_argument("--cached_kg_triples_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--save_every", type=int, default=1000,
                        help="save the cache every N batches")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=None)
    return parser.parse_args()


def main():
    args = setup_parser()
    setup_logger()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kirag_tpu.generation.interface import Generator
    from kirag_tpu.kg import KGGenerator
    from kirag_tpu.models.llm import JaxLlamaBackend, load_llama

    tokenizer = AutoTokenizer.from_pretrained(args.llm_tokenizer or args.llm)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    params, config = load_llama(args.llm, compute_dtype=jnp.bfloat16)
    backend = JaxLlamaBackend(params, config, eos_token_id=tokenizer.eos_token_id)
    llm = Generator(tokenizer, backend, model_name=args.llm,
                    max_length=4096, max_new_tokens=512, batch_size=args.batch_size)

    kg = KGGenerator(llm, examplar_type=args.dataset or args.corpus,
                     adaptive_examplars=False, batch_size=args.batch_size)
    kg.load_cached_kg_triples(args.cached_kg_triples_file)

    corpus = build_corpus(args)
    end = args.end or len(corpus)
    docs = [dict(corpus.data[i]) for i in range(args.start, end)]
    logger.info(f"extracting triples for {len(docs)} documents ...")
    for n, start in enumerate(range(0, len(docs), args.batch_size)):
        kg(docs[start: start + args.batch_size])
        if (n + 1) % args.save_every == 0:
            kg.save_cached_kg_triples(args.cached_kg_triples_file)
            logger.info(f"cache saved at batch {n + 1} ({len(kg.cached_kg_triples)} docs)")
    kg.save_cached_kg_triples(args.cached_kg_triples_file)
    logger.info(f"done: {len(kg.cached_kg_triples)} docs cached")


if __name__ == "__main__":
    main()
