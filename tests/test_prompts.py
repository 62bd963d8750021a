"""Demonstration-bank schema and size invariants.

The adaptive examplar ranker needs a real pool to rank over (the reference
ships dozens of chain examplars and ~10 per-hop selection examplars per
dataset, `prompts/kg_selection/hotpotqa_demonstrations.py:1-120,1028-1048`);
these tests pin the bank sizes and the schema every consumer parses.
"""

import re

import pytest

from kirag_tpu.prompts import kg_construction as kc
from kirag_tpu.prompts import kg_selection as ks

TRIPLE_RE = re.compile(r"<[^<>;]+;[^<>;]+;[^<>;]+>")

DATASETS = ["HOTPOTQA", "WIKIMULTIHOPQA", "MUSIQUE"]


class TestConstructionBanks:
    @pytest.mark.parametrize("name", DATASETS + ["WIKIPEDIA"])
    def test_schema_and_size(self, name):
        bank = getattr(kc, f"{name}_EXAMPLARS")
        assert len(bank) >= 10, f"{name} construction bank below reference scale"
        for rec in bank:
            assert set(rec) == {"title", "text", "triples"}
            assert rec["title"] and rec["text"]
            triples = TRIPLE_RE.findall(rec["triples"])
            assert len(triples) >= 3, rec["title"]
            # every triple is well-formed <h; r; t> (exactly two separators)
            assert TRIPLE_RE.sub("", rec["triples"]).strip(" ") == "", rec["title"]

    @pytest.mark.parametrize("name", DATASETS + ["WIKIPEDIA"])
    def test_no_duplicate_titles(self, name):
        bank = getattr(kc, f"{name}_EXAMPLARS")
        titles = [r["title"] for r in bank]
        assert len(titles) == len(set(titles))


class TestChainBanks:
    @pytest.mark.parametrize("name", DATASETS)
    def test_schema_and_size(self, name):
        bank = getattr(ks, f"{name}_REASONING_CHAIN_EXAMPLARS")
        assert len(bank) >= 20, f"{name} chain bank below reference scale"
        for rec in bank:
            assert set(rec) == {"question", "chains", "answer"}
            triples = TRIPLE_RE.findall(rec["chains"])
            assert len(triples) >= 2, rec["question"]
            assert rec["answer"], rec["question"]

    @pytest.mark.parametrize("name", DATASETS)
    def test_no_duplicate_questions(self, name):
        bank = getattr(ks, f"{name}_REASONING_CHAIN_EXAMPLARS")
        questions = [r["question"] for r in bank]
        assert len(questions) == len(set(questions))


class TestSelectionBanks:
    @pytest.mark.parametrize("name", DATASETS)
    def test_schema_and_size(self, name):
        bank = getattr(ks, f"{name}_TRIPLE_SELECTION_EXAMPLARS")
        # reference scale: 20 multi-hop demonstration groups per dataset
        # (`prompts/kg_selection/*_demonstrations.py`), each a set of per-hop
        # records sharing one question
        groups = {r["question"] for r in bank}
        assert len(groups) >= 20, (
            f"{name} selection bank below reference scale: {len(groups)} groups")
        letters = "ABCDE"
        for rec in bank:
            assert set(rec) == {"question", "triples", "candidate_triples",
                                "answer", "cot_answer"}
            assert rec["answer"] in letters
            assert len(rec["candidate_triples"]) == 5
            for i, cand in enumerate(rec["candidate_triples"]):
                assert cand.startswith(f"{letters[i]}. <"), cand
                assert TRIPLE_RE.search(cand), cand
            for t in rec["triples"]:
                assert TRIPLE_RE.fullmatch(t), t
            # the cot must end with the option-letter verdict the parser reads
            assert rec["cot_answer"].rstrip().endswith(
                f"The answer is: {rec['answer']}."), rec["question"]

    @pytest.mark.parametrize("name", DATASETS)
    def test_per_hop_coverage(self, name):
        """Banks must cover multiple hop depths (empty chain AND >=1-triple
        chains) so the selector sees both cold-start and mid-chain hops."""
        bank = getattr(ks, f"{name}_TRIPLE_SELECTION_EXAMPLARS")
        depths = {len(r["triples"]) for r in bank}
        assert 0 in depths and any(d >= 1 for d in depths)


class TestPromptFitting:
    def test_bigger_banks_still_fit_context(self, tmp_path):
        """Context-window fitting must bound the prompt even with 20+ chain
        examplars available (`vary_num_examplars_based_on_context_window`)."""
        from tests.helpers import make_tokenizer

        from kirag_tpu.generation.stub import make_stub_generator
        from kirag_tpu.kg import KGGenerator

        tok = make_tokenizer(tmp_path)
        gen = make_stub_generator(tok, default_response="<a; b; c>")
        kg = KGGenerator(gen, examplar_type="hotpotqa", adaptive_examplars=False,
                         max_length=256, num_examplars=len(kc.HOTPOTQA_EXAMPLARS))
        docs = [{"id": "d0", "title": "w1", "text": "w1 w2 ."}]
        kg(docs)  # must not raise; prompt was fitted by dropping examplars
        prompt = gen.backend.calls[-1][0]
        assert len(tok(prompt)["input_ids"]) <= 256
