"""KiRAG iterative retrieval entry point.

The TPU counterpart of the reference `retrieve.py`: loads the encoder +
device index + corpus, the constructor/KG LLM (JAX Llama backend, or the
deterministic stub with ``--llm stub`` for smoke runs), the Aligner, runs
`KiRAG.retrieve` per question and writes QA-format results
(``ctxs`` + ``paths``).

Usage:
  python -m kirag_tpu.cli.retrieve \
    --dataset 2wikimultihopqa --query_file dev.json --corpus 2wikimultihopqa \
    --index_folder out/e5_2wiki \
    --retriever_model_name_or_path /ckpts/e5-large-v2 \
    --llm /ckpts/Meta-Llama-3-8B-Instruct \
    --aligner_model_name_or_path /ckpts/aligner \
    --save_dir out --name kirag --save_file results.json
"""

from __future__ import annotations

import argparse
import logging
import os

from kirag_tpu.cli.common import (
    add_corpus_args,
    add_encoder_args,
    add_mesh_args,
    build_collator,
    build_corpus,
    build_encoder,
    build_mesh,
    build_tokenizer,
)
from kirag_tpu.kg.triples import sent_tokenize
from kirag_tpu.utils.io import load_json, save_json
from kirag_tpu.utils.logging import setup_logger

logger = logging.getLogger(__name__)


def setup_parser():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dataset", required=True, type=str)
    parser.add_argument("--query_file", required=True, type=str)
    parser.add_argument("--num_queries", type=int, default=None,
                        help="optionally truncate the query set")
    add_corpus_args(parser)
    add_encoder_args(parser)
    add_mesh_args(parser)
    parser.add_argument("--index_folder", type=str, required=True)
    parser.add_argument("--embedding_size", type=int, default=1024)
    parser.add_argument("--search_mode", type=str, default="exact",
                        choices=["exact", "approx"],
                        help="approx = fused Pallas group-sampled top-k "
                             "(recall@100 ~0.994, composes with int8 indexes)")
    parser.add_argument("--approx_winners", type=int, default=1,
                        help="approx recall/speed dial: candidates per "
                             "128-row group (1 = classic sampling, 2 kills "
                             "the dominant same-group miss mode, 128 = "
                             "exact)")

    parser.add_argument("--llm", type=str, required=True,
                        help="LOCAL path to a Llama-architecture chat model, or 'stub'")
    parser.add_argument("--llm_tokenizer", type=str, default=None,
                        help="tokenizer path (defaults to --llm)")
    parser.add_argument("--cached_kg_triples_file", type=str, default=None)
    parser.add_argument("--llm_quant_bits", type=int, default=None,
                        choices=[4, 8],
                        help="weight-only LLM quantization: 8 (per-channel "
                             "int8) or 4 (block-64 int4, the reference's NF4 "
                             "memory point)")
    parser.add_argument("--llm_kv_quant_bits", type=int, default=None,
                        choices=[8],
                        help="int8 KV cache (per-token, per-kv-head scales): "
                             "halves KV HBM traffic and residency — the "
                             "capacity lever for large decode batches; not "
                             "composable with --draft_llm")
    parser.add_argument("--llm_prefix_cache_groups", type=int, default=0,
                        help="prefix KV cache slots (0 disables — the r5 "
                             "measured default): reuses the constructor's "
                             "(instruction + examplars) K/V across a "
                             "question's turns/beams. MEASURED LOSS at loop "
                             "geometry on this hardware (bench_prefix_micro, "
                             "fp16 AND int8 KV: the pool gather + window "
                             "bucketing cost more than the skipped prefill); "
                             "kept for geometries with far longer shared "
                             "prefixes. ~46 MB/slot at 1.1B (half with "
                             "--llm_kv_quant_bits 8)")
    parser.add_argument("--llm_prefix_cache_tokens", type=int, default=2048,
                        help="cached prefix length cap per slot")
    parser.add_argument("--draft_llm", type=str, default=None,
                        help="optional DRAFT model path: enables greedy "
                             "speculative decoding (same tokenizer as "
                             "--llm). Output stream matches plain greedy "
                             "exactly at f32; at bf16 the window-fed verify "
                             "can flip argmax near-ties vs stepwise decode "
                             "(negligible with trained-weight margins)")
    parser.add_argument("--spec_gamma", type=int, default=4,
                        help="speculative fed-window length per round "
                             "(gamma-1 draft proposals + 1 correction)")
    parser.add_argument("--llm_int8", action="store_true",
                        help="weight-only int8 LLM (the 4-bit-loading analogue; ~2x decode)")
    parser.add_argument("--aligner_model", type=str, default="e5", choices=["e5", "bge"])
    parser.add_argument("--aligner_model_name_or_path", type=str, required=True)
    parser.add_argument("--num_beams", type=int, default=1, choices=[1, 2])
    parser.add_argument("--concurrent_questions", type=int, default=1,
                        help="process N questions in lockstep turns, "
                             "coalescing decode/embed/search device batches "
                             "across them (KiRAG.retrieve_batch; decode is "
                             "weight-bound, so N~8 raises questions/hour "
                             "nearly linearly). 1 = the reference-shaped "
                             "sequential loop")
    parser.add_argument("--num_turns", type=int, default=5)
    parser.add_argument("--topk", type=int, default=10)
    parser.add_argument("--num_candidate_triples", type=int, default=20)

    parser.add_argument("--per_device_batch_size", type=int, default=8)
    parser.add_argument("--save_dir", type=str, default="checkpoint")
    parser.add_argument("--name", type=str, default="e5_retriever")
    parser.add_argument("--save_file", required=True, type=str)
    return parser.parse_args()


def setup_retriever_model(args):
    from kirag_tpu.index import TPUIndexer
    from kirag_tpu.retrieval import DenseRetriever

    tokenizer = build_tokenizer(args)
    collator = build_collator(args, tokenizer)
    encoder = build_encoder(args)
    mesh = build_mesh(args)
    corpus = build_corpus(args)
    indexer = TPUIndexer(args.embedding_size, metric="inner_product", mesh=mesh,
                         approx_winners=getattr(args, "approx_winners", 1))
    indexer.deserialize_from(args.index_folder)
    retriever = DenseRetriever(encoder, collator, indexer=indexer, corpus=corpus,
                               batch_size=args.per_device_batch_size,
                               search_mode=getattr(args, "search_mode", "exact"))
    return retriever, corpus


def setup_llm_generator(args):
    """Build the constructor Generator over the JAX Llama backend or the stub."""
    from kirag_tpu.generation.interface import Generator

    if args.llm == "stub":
        from tests.helpers import make_tokenizer  # pragma: no cover - smoke only

        raise ValueError("--llm stub is only usable from tests; pass a local model path")

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kirag_tpu.models.llm import JaxLlamaBackend, load_llama

    tok_path = args.llm_tokenizer or args.llm
    tokenizer = AutoTokenizer.from_pretrained(tok_path)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    params, config = load_llama(args.llm, compute_dtype=jnp.bfloat16,
                                int8_weights=getattr(args, 'llm_int8', False),
                                quant_bits=getattr(args, 'llm_quant_bits', None),
                                kv_quant_bits=getattr(args, 'llm_kv_quant_bits',
                                                      None))
    draft_params = draft_config = None
    if getattr(args, "draft_llm", None):
        # the quantized-target + small-bf16-draft pairing: the draft's extra
        # weight reads are amortized by multi-token target verification
        draft_params, draft_config = load_llama(args.draft_llm,
                                                compute_dtype=jnp.bfloat16)
    backend = JaxLlamaBackend(params, config, eos_token_id=tokenizer.eos_token_id,
                              draft_params=draft_params, draft_config=draft_config,
                              spec_gamma=getattr(args, "spec_gamma", 4),
                              prefix_cache_groups=getattr(
                                  args, "llm_prefix_cache_groups", 0),
                              prefix_cache_tokens=getattr(
                                  args, "llm_prefix_cache_tokens", 2048))
    constructor = Generator(tokenizer, backend, model_name=args.llm,
                            max_length=4096, max_new_tokens=64, batch_size=4)
    kg_llm = Generator(tokenizer, backend, model_name=args.llm,
                       max_length=4096, max_new_tokens=512, batch_size=4)
    return constructor, kg_llm


def setup_kirag_model(args, retriever):
    from kirag_tpu.data import COLLATOR_MAP
    from kirag_tpu.kg import KGGenerator
    from kirag_tpu.models.encoders import load_encoder
    from kirag_tpu.pipeline import KiRAG
    from kirag_tpu.retrieval import DenseRetriever

    constructor, kg_llm = setup_llm_generator(args)
    aligner_encoder = load_encoder(args.aligner_model_name_or_path, args.aligner_model)
    from transformers import AutoTokenizer

    aligner_tok = AutoTokenizer.from_pretrained(args.aligner_model_name_or_path)
    aligner_collator = COLLATOR_MAP[args.aligner_model](
        tokenizer=aligner_tok, query_maxlength=256, doc_maxlength=64)
    aligner = DenseRetriever(aligner_encoder, aligner_collator,
                             batch_size=args.per_device_batch_size)

    kg_generator = KGGenerator(kg_llm, examplar_type=args.dataset, embedder=aligner,
                               batch_size=4)
    if args.cached_kg_triples_file is not None:
        kg_generator.load_cached_kg_triples(args.cached_kg_triples_file)

    return KiRAG(retriever=retriever, kg_generator=kg_generator, constructor=constructor,
                 aligner=aligner, examplar_type=args.dataset, num_turns=args.num_turns,
                 topk=args.topk, num_candidate_triples=args.num_candidate_triples)


def convert_chains_to_qa_format(example, reasoning_chains, documents):
    ctxs = []
    for doc in documents:
        if "sentences" not in doc:
            doc = dict(doc)
            doc["sentences"] = sent_tokenize(doc["text"])
        ctxs.append(doc)
    example["ctxs"] = ctxs
    example["paths"] = reasoning_chains
    return example


def retrieve(args, questions, kirag, retriever):
    results = []
    wave = max(1, getattr(args, "concurrent_questions", 1))
    for start in range(0, len(questions), wave):
        batch = questions[start: start + wave]
        if wave == 1:
            outs = [kirag.retrieve(question=batch[0]["question"],
                                   num_beams=args.num_beams)]
        else:
            outs = kirag.retrieve_batch([ex["question"] for ex in batch],
                                        num_beams=args.num_beams)
        for example, (chains, docids_to_scores) in zip(batch, outs):
            documents = retriever.get_documents(docids_to_scores)
            results.append(convert_chains_to_qa_format(example, chains, documents))
        logger.info(f"[{min(start + wave, len(questions))}/{len(questions)}] "
                    f"retrieved (wave={wave})")
    if args.cached_kg_triples_file is not None:
        kirag.kg_generator.save_cached_kg_triples(args.cached_kg_triples_file)
    return results


def main():
    args = setup_parser()
    checkpoint_path = os.path.join(args.save_dir, args.name)
    os.makedirs(checkpoint_path, exist_ok=True)
    setup_logger(os.path.join(checkpoint_path, "kg_adaptive_retrieve.log"))

    retriever, corpus = setup_retriever_model(args)
    kirag = setup_kirag_model(args, retriever)

    questions = load_json(args.query_file)
    if args.num_queries:
        questions = questions[: args.num_queries]
    logger.info(f"retrieving for {len(questions)} questions ...")
    results = retrieve(args, questions, kirag, retriever)
    save_path = os.path.join(checkpoint_path, args.save_file)
    save_json(results, save_path, use_indent=True)
    logger.info(f"wrote {save_path}")


if __name__ == "__main__":
    main()
