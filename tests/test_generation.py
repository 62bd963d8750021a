"""Tests for chat rendering, the Generator harness, stub backend, and reader."""

import numpy as np
import pytest

from kirag_tpu.generation import AnswerGenerator, StubBackend, make_stub_generator
from kirag_tpu.generation.chat import (
    build_messages,
    detect_family,
    detect_is_chat,
    render_chat,
)

from tests.helpers import make_tokenizer


@pytest.fixture
def tok(tmp_path):
    t = make_tokenizer(tmp_path)
    if t.pad_token_id is None:
        t.pad_token = "[PAD]"
    if t.eos_token_id is None:
        t.eos_token = "[SEP]"
    return t


class TestChat:
    def test_family_detection(self):
        assert detect_family("meta-llama/Meta-Llama-3-8B-Instruct") == "llama3"
        assert detect_family("Qwen/Qwen2.5-7B-Instruct") == "qwen2"
        assert detect_family("mistralai/Mistral-7B-Instruct-v0.2") == "mistral"
        assert detect_family("google/gemma-2-9b-it") == "gemma2"
        assert detect_is_chat("Meta-Llama-3-8B-Instruct")
        assert not detect_is_chat("Meta-Llama-3-8B")

    def test_llama3_template(self):
        msgs = build_messages("llama3", "Be brief.", "hello")
        text = render_chat("llama3", msgs)
        assert text.startswith("<|begin_of_text|><|start_header_id|>system")
        assert "Be brief." in text and "hello" in text
        assert text.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_mistral_merges_system_into_user(self):
        msgs = build_messages("mistral", "INSTR", "hello")
        assert msgs[0]["role"] == "user"
        assert msgs[0]["content"].startswith("INSTR")
        text = render_chat("mistral", msgs)
        assert "[INST]" in text

    def test_multi_turn_messages(self):
        msgs = build_messages("llama3", "sys", [{"user": "q1"}, {"assistant": "a1"}, {"user": "q2"}])
        roles = [m["role"] for m in msgs]
        assert roles == ["system", "user", "assistant", "user"]


class TestStubGenerator:
    def test_rule_matching_and_texts(self, tok):
        gen = make_stub_generator(tok, rules=[("alpha", "beta gamma"), ("delta", "epsilon")])
        texts = gen.generate_texts(["inst"], ["alpha question"])
        assert texts == ["beta gamma"]
        texts = gen.generate_texts(["inst"], ["delta question"])
        assert texts == ["epsilon"]

    def test_ids_and_logits_consistent(self, tok):
        gen = make_stub_generator(tok, rules=[("alpha", "beta gamma")])
        ids, logits = gen.generator_generate(["inst"], ["alpha"])
        assert ids.shape[0] == 1 and logits.shape[:2] == ids.shape
        # greedy consistency: argmax of logits reproduces ids
        np.testing.assert_array_equal(np.argmax(logits[0], axis=-1), ids[0])

    def test_forced_prefix_reaches_backend(self, tok):
        backend = StubBackend(tok, rules=[("knowledge", "tau")])
        from kirag_tpu.generation.interface import Generator

        gen = Generator(tok, backend, model_name="stub-instruct", max_length=256)
        gen.family = "generic"
        gen.generator_generate(["inst"], ["question"],
                               current_generated_texts=["knowledge triples alpha"])
        assert any("knowledge triples alpha" in p for p in backend.calls[-1])

    def test_batching_pads_to_common_length(self, tok):
        gen = make_stub_generator(
            tok, rules=[("alpha", "beta"), ("delta", "epsilon zeta eta theta")], batch_size=1)
        ids, logits = gen.generator_generate(["i", "i"], ["alpha", "delta"])
        assert ids.shape[0] == 2
        assert ids.shape[1] == logits.shape[1]

    def test_stop_words_trim(self, tok):
        gen = make_stub_generator(
            tok, rules=[("alpha", "beta gamma . question : next")], stop_check_every=2)
        texts = gen.generate_texts(["i"], ["alpha"], stop_words=["question"])
        assert texts[0].strip().startswith("beta gamma")
        assert "next" not in texts[0]

    def test_incremental_stop_decode_is_linear(self, tok):
        """The segment stop check must decode each generated token O(1) times
        (plus a fixed overlap), not re-decode the full generation per segment;
        outputs must be unchanged vs the naive full re-decode."""
        rule = ("alpha", "one two three four five six seven eight . question : tail")
        naive = make_stub_generator(tok, rules=[rule], stop_check_every=2)
        texts_naive = naive.generate_texts(["i"], ["alpha"],
                                           stop_words=["question"])

        gen = make_stub_generator(tok, rules=[rule], stop_check_every=2)
        texts = gen.generate_texts(["i"], ["alpha"], stop_words=["question"])
        assert texts == texts_naive

        # linearity: every per-check decode window is bounded by
        # segment + OVERLAP, independent of prior generation length
        from kirag_tpu.generation.interface import Generator

        calls = []

        class CountingTok:
            def decode(self, ids, **kw):
                calls.append(len(ids))
                return tok.decode(ids, **kw)

            def encode(self, text, **kw):
                return tok.encode(text, **kw)

        seg = 4
        tracker = Generator._StopTracker(CountingTok(), ["zzz"], -1, 2)
        rng = np.random.RandomState(0)
        for _ in range(40):  # 160 tokens in 4-token segments
            tracker.update(rng.randint(5, 50, size=(2, seg)))
        bound = seg + tracker.overlap
        assert calls and max(calls) <= bound, (max(calls), bound)

    def test_stop_word_spanning_segment_boundary(self, tok):
        # the two-token stop phrase "mu nu" spans a 2-token segment boundary:
        # the overlap tail must still catch it (and not before)
        from kirag_tpu.generation.interface import Generator

        ids = tok("beta gamma delta mu nu epsilon",
                  add_special_tokens=False)["input_ids"]
        assert len(ids) == 6
        tracker = Generator._StopTracker(tok, ["mu nu"], -1, 1)
        # segments: [beta gamma] [delta mu] [nu epsilon]
        assert tracker.update(np.asarray([ids[0:2]])) == [False]
        assert tracker.update(np.asarray([ids[2:4]])) == [False]
        assert tracker.update(np.asarray([ids[4:6]])) == [True]
        # sticky: later updates never decode again nor un-set done
        assert tracker.update(np.asarray([ids[0:2]])) == [True]

    def test_long_stop_word_sizes_the_overlap(self, tok):
        # a stop phrase tokenizing LONGER than the 32-token floor must still
        # be caught when it spans a segment boundary — the tracker sizes its
        # overlap from the tokenized stop words (ADVICE r3: a fixed overlap
        # silently missed any stop word longer than it)
        from kirag_tpu.generation.interface import Generator

        phrase_words = [f"w{i}" for i in range(40)]  # 40 tokens, > 32 floor
        phrase = " ".join(phrase_words)
        ids = tok(phrase, add_special_tokens=False)["input_ids"]
        assert len(ids) >= 40
        tracker = Generator._StopTracker(tok, [phrase], -1, 1)
        assert tracker.overlap >= 2 * len(ids)
        # feed the phrase split across many small segments; only the final
        # segment completes it
        done = [False]
        for start in range(0, len(ids), 4):
            done = tracker.update(np.asarray([ids[start: start + 4]]))
        assert done == [True]

    def test_stop_tracker_eos(self, tok):
        from kirag_tpu.generation.interface import Generator

        tracker = Generator._StopTracker(tok, ["zzz"], tok.eos_token_id, 2)
        seg = np.asarray([[5, 6], [7, tok.eos_token_id]])
        assert tracker.update(seg) == [False, True]


class TestAnswerGenerator:
    def test_parse_answers(self):
        parse = AnswerGenerator.parse_generated_answers
        assert parse(["The answer is: Paris"]) == ["Paris"]
        assert parse(["  \nSo the answer is: 42\nmore"]) == ["42"]
        assert parse(["Just Paris"]) == ["Just Paris"]

    def test_generate_answer_with_context(self, tok):
        backend = StubBackend(tok, rules=[("question : alpha", "the answer is : beta")])
        reader = AnswerGenerator(tok, backend, model_name="stub-instruct", max_length=512)
        reader.family = "generic"
        ans = reader.generate_answer("alpha ?", context=["w1 text", "w2 text"])
        assert ans == "beta"
        # the context must have reached the prompt
        assert any("w1 text" in p for p in backend.calls[-1])

    def test_batch_generate(self, tok):
        backend = StubBackend(tok, default_response="the answer is : gamma")
        reader = AnswerGenerator(tok, backend, model_name="stub-instruct", max_length=512)
        reader.family = "generic"
        out = reader.generate_answer(["q1 ?", "q2 ?"], context=[["c1"], ["c2"]])
        assert out == ["gamma", "gamma"]


def make_bpe_tokenizer():
    """A byte-level BPE tokenizer trained in-process — unlike the WordPiece
    test tokenizer, its merges cross pre-token boundaries exactly like the
    four chat families' real tokenizers (llama3/qwen2 tiktoken-style BPE,
    mistral/gemma2 sentencepiece), so prompt+prefix boundary merges are
    reproducible offline."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    corpus = [
        "Thought: the next knowledge triple is <alpha; relation; beta>.",
        "the question needs additional knowledge triples",
        "Thought: no additional knowledge is needed",
        "answer the question for the given context",
    ] * 50
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<pad>", "<eos>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer)
    return PreTrainedTokenizerFast(tokenizer_object=tok, pad_token="<pad>",
                                   eos_token="<eos>")


def reference_splice(tokenizer, inputs, texts):
    """Numpy port of the reference's token-level forced-prefix splice
    (`generator/utils.py:56-104`, left-padding branch): the parity oracle
    the Generator's conditioning must match."""
    input_ids, attention_mask = inputs["input_ids"], inputs["attention_mask"]
    b, n = input_ids.shape
    lens = attention_mask.sum(1)
    tids = [tokenizer.encode(t, add_special_tokens=False) for t in texts]
    m = max(len(t) for t in tids)
    if m == 0:
        return inputs
    new_ids = np.full((b, n + m), tokenizer.pad_token_id, dtype=np.int32)
    new_mask = np.zeros((b, n + m), dtype=np.int32)
    for i in range(b):
        k = len(tids[i])
        if k:
            new_ids[i, -k:] = tids[i]
            new_mask[i, -k:] = 1
        if lens[i]:
            new_ids[i, -k - lens[i]: (-k if k else None)] = input_ids[i, -lens[i]:]
            new_mask[i, -k - lens[i]: (-k if k else None)] = 1
    return {"input_ids": new_ids, "attention_mask": new_mask}


ADVERSARIAL_PREFIXES = [
    "Thought: the next",          # word boundary after template newline
    " the knowledge",             # leading space (merges with prompt tail)
    "Thought: no ",               # trailing space (dangling Ġ token)
    "Thought: know",              # mid-word cut
    "<alpha; relation",           # punctuation run
    "Thought:\nthe",              # embedded newline
    "",                           # empty prefix row
]


class TestForcedPrefixBoundaries:
    """VERDICT r4 #6: text-level prefixing silently diverges from the
    reference's token splice at BPE merge boundaries; the Generator now
    splices at the token level, pinned here against the reference oracle
    for all four chat families x adversarial boundaries."""

    @pytest.fixture(scope="class")
    def bpe(self):
        return make_bpe_tokenizer()

    def test_text_level_concat_would_diverge(self, bpe):
        # the motivating failure: tokenize(prompt + prefix) merges across
        # the boundary, so it is NOT the splice the reference conditions on
        prompt = "question: the answer "     # trailing space
        prefix = "the knowledge"
        text_level = bpe(prompt + prefix, add_special_tokens=False)["input_ids"]
        splice = (bpe(prompt, add_special_tokens=False)["input_ids"]
                  + bpe(prefix, add_special_tokens=False)["input_ids"])
        assert text_level != splice  # merge across the boundary
        # ...while both decode to the same text (the divergence is silent)
        assert bpe.decode(text_level) == bpe.decode(splice)

    @pytest.mark.parametrize("family", ["llama3", "qwen2", "mistral", "gemma2"])
    def test_generator_matches_reference_splice(self, bpe, family):
        from kirag_tpu.generation.interface import Generator

        backend = StubBackend(bpe, default_response="the answer", vocab_size=400)
        gen = Generator(bpe, backend, model_name=f"{family}-instruct",
                        is_chat=True, max_length=512)
        gen.family = family
        n = len(ADVERSARIAL_PREFIXES)
        instructions = ["answer the question"] * n
        contents = ["the question needs knowledge"] * n
        prompts = [gen.render_prompt(i, c) for i, c in zip(instructions, contents)]
        got = gen.tokenizer_encode_with_prefixes(prompts, ADVERSARIAL_PREFIXES)
        want = reference_splice(bpe, gen.tokenizer_encode(prompts),
                                ADVERSARIAL_PREFIXES)
        for i in range(n):
            got_row = got["input_ids"][i][got["attention_mask"][i].astype(bool)]
            want_row = want["input_ids"][i][want["attention_mask"][i].astype(bool)]
            np.testing.assert_array_equal(
                got_row, want_row,
                err_msg=f"{family} prefix={ADVERSARIAL_PREFIXES[i]!r}")

    def test_generator_generate_uses_the_splice(self, bpe):
        from kirag_tpu.generation.interface import Generator

        backend = StubBackend(bpe, default_response="the answer", vocab_size=400)
        gen = Generator(bpe, backend, model_name="llama3-instruct",
                        is_chat=True, max_length=512)
        gen.family = "llama3"
        # a trailing-space prompt boundary: decoding the spliced ids must
        # reproduce prompt + prefix exactly (silent-merge check end-to-end)
        gen.generator_generate(["answer the question"], ["the question "],
                               current_generated_texts=["Thought: the next"])
        assert any("Thought: the next" in p for p in backend.calls[-1])
