"""Reader QA evaluation: EM/F1 over retrieved contexts.

The counterpart of the reference `evaluation/qa_eval.py`: feeds each question
and its top-k ``ctxs`` to an AnswerGenerator reader (JAX Llama backend) and
scores EM / F1 against gold answers.

Usage:
  python -m kirag_tpu.cli.qa_eval --save_file out/kirag/results.json \
    --reader /ckpts/Meta-Llama-3-8B-Instruct --k 3
"""

from __future__ import annotations

import argparse

import numpy as np

from kirag_tpu.evaluation.metrics import ems, f1_score
from kirag_tpu.utils.io import load_json


def setup_parser():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--save_file", type=str, required=True)
    parser.add_argument("--k", type=int, default=3)
    parser.add_argument("--reader", type=str, required=True,
                        help="LOCAL path to a Llama-architecture chat model")
    parser.add_argument("--batch_size", type=int, default=4)
    return parser.parse_args()


def build_reader(args):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kirag_tpu.generation.answer import AnswerGenerator
    from kirag_tpu.models.llm import JaxLlamaBackend, load_llama

    tokenizer = AutoTokenizer.from_pretrained(args.reader)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    params, config = load_llama(args.reader, compute_dtype=jnp.bfloat16)
    backend = JaxLlamaBackend(params, config, eos_token_id=tokenizer.eos_token_id)
    return AnswerGenerator(tokenizer, backend, model_name=args.reader,
                           max_new_tokens=32, batch_size=args.batch_size)


def evaluate(data, reader, k: int, batch_size: int):
    questions, contexts, answers_list = [], [], []
    for example in data:
        questions.append(example["question"])
        answers = example["answers"]
        answers_list.append(answers if isinstance(answers, list) else [answers])
        context = []
        for ctx in example["ctxs"][:k]:
            text = ctx.get("text") or " ".join(ctx.get("sentences", []))
            if "title" in ctx:
                context.append("title: {}, text: {}".format(ctx["title"], text))
            else:
                context.append(text)
        contexts.append(context)

    preds = []
    for start in range(0, len(questions), batch_size):
        preds.extend(reader.generate_answer(
            questions[start: start + batch_size],
            context=contexts[start: start + batch_size] if k > 0 else None))

    em_scores = [float(ems(p, gold)) for p, gold in zip(preds, answers_list)]
    f1_scores = [f1_score(p, gold[0])[0] for p, gold in zip(preds, answers_list)]
    return float(np.mean(em_scores)), float(np.mean(f1_scores)), preds


def main():
    args = setup_parser()
    data = load_json(args.save_file)
    reader = build_reader(args)
    em, f1, _ = evaluate(data, reader, args.k, args.batch_size)
    print("==================== Evaluation Result ====================")
    print(f">>>> File: {args.save_file}")
    print(f">>>> Topk: {args.k}")
    print(f">>>> Reader: {args.reader}")
    print(f">>>> EM: {em:.5f}")
    print(f">>>> F1: {f1:.5f}")
    print("===========================================================")


if __name__ == "__main__":
    main()
