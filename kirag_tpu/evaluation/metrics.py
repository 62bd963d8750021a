"""QA and retrieval metrics.

These implement the STANDARD community definitions so numbers are comparable
with the reference (`evaluation/metrics.py`):
- ``normalize_answer``/``ems``: the SQuAD evaluation normalization (lowercase,
  strip punctuation/articles, squeeze whitespace) and best exact match.
- ``f1_score``: the HotPotQA token-F1 with the yes/no/noanswer guard
  (returns (f1, precision, recall)).
- ``has_answer``: DPR-style answer-presence via unicode word tokenization and
  sliding-window token match (used for answer-recall@k on datasets without
  qrels).
"""

from __future__ import annotations

import string
import unicodedata
from collections import Counter
from typing import List, Tuple

import regex

_PUNCT = set(string.punctuation)
_ARTICLE_RE = regex.compile(r"\b(a|an|the)\b")
_WORD_RE = regex.compile(
    r"([\p{L}\p{N}\p{M}]+)|([^\p{Z}\p{C}])",
    flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
)


def _nfd(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in _PUNCT)
    s = _ARTICLE_RE.sub(" ", s)
    return " ".join(s.split())


def exact_match_score(prediction: str, ground_truth: str) -> bool:
    return normalize_answer(prediction) == normalize_answer(ground_truth)


def ems(prediction: str, ground_truths: List[str]) -> bool:
    return max(exact_match_score(prediction, gt) for gt in ground_truths)


def f1_score(prediction: str, ground_truth: str) -> Tuple[float, float, float]:
    norm_pred = normalize_answer(prediction)
    norm_gold = normalize_answer(ground_truth)

    zero = (0.0, 0.0, 0.0)
    special = ("yes", "no", "noanswer")
    if norm_pred in special and norm_pred != norm_gold:
        return zero
    if norm_gold in special and norm_pred != norm_gold:
        return zero

    pred_tokens = norm_pred.split()
    gold_tokens = norm_gold.split()
    common = Counter(pred_tokens) & Counter(gold_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return zero
    precision = num_same / len(pred_tokens)
    recall = num_same / len(gold_tokens)
    f1 = 2 * precision * recall / (precision + recall)
    return f1, precision, recall


def _tokenize_words(text: str) -> List[str]:
    return [m.group().lower() for m in _WORD_RE.finditer(text)]


def regex_match(text: str, pattern: str) -> bool:
    try:
        compiled = regex.compile(
            pattern, flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE)
    except BaseException:
        return False
    return compiled.search(text) is not None


def has_answer(answers: List[str], text: str, match_type: str = "string") -> bool:
    """True when ``text`` contains any answer as a token subsequence
    (``string``) or matches any answer regex (``regex``)."""
    text = _nfd(text)
    if match_type == "string":
        words = _tokenize_words(text)
        for answer in answers:
            answer_words = _tokenize_words(_nfd(answer))
            if not answer_words:
                continue
            for i in range(len(words) - len(answer_words) + 1):
                if words[i: i + len(answer_words)] == answer_words:
                    return True
    elif match_type == "regex":
        for answer in answers:
            if regex_match(text, _nfd(answer)):
                return True
    return False
