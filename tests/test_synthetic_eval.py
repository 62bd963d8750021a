"""Quality regression: the KiRAG loop must achieve perfect recall on the
synthetic oracle world (anything lower = bookkeeping regression)."""

import sys


def test_synthetic_world_perfect_recall():
    sys.argv = ["synthetic_eval", "--num_questions", "4", "--corpus_size", "40"]
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from benchmarks.synthetic_eval import main

    summary = main()
    assert summary["recall@2"] == 1.0
    assert summary["mean_chain_len"] >= 3  # hop1, hop2, answer
