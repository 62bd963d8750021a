"""Tokenization collators with XLA-friendly bucketed padding.

Mirrors the collator surface of the reference (`dataset/collators.py`): query/
doc encoding with model-specific prefixes (E5 ``"query: "``/``"passage: "``,
reference :132-145; BGE query instruction, reference :148-156) and the
training ``__call__`` that packs (query, 1 positive + N negatives) batches
(reference :102-129).

TPU-first difference: the reference's ``"max_sequence"`` padding trims each
batch to its longest sequence (`collators.py:23-56`), which would trigger an
XLA recompile per unique length. We instead round the batch max length UP to
the next bucket (powers of two capped at ``maxlength``), bounding the number
of compiled programs to O(log maxlength) while keeping most of the FLOP
savings.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

DEFAULT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucket_length(max_len: int, maxlength: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= max_len, capped at maxlength."""
    for b in buckets:
        if b >= max_len:
            return min(b, maxlength)
    return maxlength


class RetrieverCollator:
    """Tokenize queries/documents into fixed-bucket numpy batches."""

    def __init__(self, tokenizer, query_maxlength: int, doc_maxlength: int,
                 query_padding: str = "bucket", doc_padding: str = "bucket", **kwargs):
        assert query_padding in ("max_length", "bucket")
        assert doc_padding in ("max_length", "bucket")
        self.tokenizer = tokenizer
        self.query_maxlength = query_maxlength
        self.doc_maxlength = doc_maxlength
        self.query_padding = query_padding
        self.doc_padding = doc_padding
        self.kwargs = kwargs

    def encode(self, text_list: Union[str, List[str]], maxlength: int, padding: str,
               pad_to_batch: Optional[int] = None, **kwargs) -> Dict[str, np.ndarray]:
        if text_list is None or (isinstance(text_list, (tuple, list)) and len(text_list) == 0):
            raise ValueError("text_list is None or an empty tuple/list!")
        if isinstance(text_list, str):
            text_list = [text_list]

        # encoders need right padding: the bucket trim below cuts trailing
        # columns, and a generator sharing this tokenizer may have switched it
        # to left padding (decoder-only convention)
        self.tokenizer.padding_side = "right"
        out = self.tokenizer(
            list(text_list), max_length=maxlength, padding="max_length",
            truncation=True, return_tensors="np",
        )
        input_ids = out["input_ids"].astype(np.int32)
        attention_mask = out["attention_mask"].astype(np.int32)

        if padding == "bucket":
            longest = int(attention_mask.sum(-1).max())
            blen = bucket_length(longest, maxlength)
            input_ids = input_ids[:, :blen]
            attention_mask = attention_mask[:, :blen]

        if pad_to_batch is not None and len(input_ids) < pad_to_batch:
            pad_rows = pad_to_batch - len(input_ids)
            input_ids = np.pad(input_ids, ((0, pad_rows), (0, 0)),
                               constant_values=self.tokenizer.pad_token_id or 0)
            attention_mask = np.pad(attention_mask, ((0, pad_rows), (0, 0)))

        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def encode_query(self, query_list, **kwargs):
        maxlength = kwargs.pop("max_length", None) or self.query_maxlength
        return self.encode(query_list, maxlength, self.query_padding, **kwargs)

    def encode_doc(self, doc_list, **kwargs):
        maxlength = kwargs.pop("max_length", None) or self.doc_maxlength
        return self.encode(doc_list, maxlength, self.doc_padding, **kwargs)

    def __call__(self, batch: List[Union[dict, List[dict]]]):
        """Pack a training batch of posneg examples.

        Input examples: ``{"index", "question", "answers", "positive_passage",
        "negative_passages"}`` (or lists thereof, which are flattened) —
        the contract of `RetrieverWithPosNegsCollator.__call__`
        (`dataset/collators.py:102-129`).

        Returns (query_args, doc_args, positive_doc_indices, index) with numpy
        arrays; docs are laid out [pos_0, negs_0..., pos_1, negs_1, ...].
        """
        if batch and isinstance(batch[0], list):
            batch = [ex for sub in batch for ex in sub]
        query_list = [ex["question"] for ex in batch]
        doc_list: List[str] = []
        positive_doc_indices: List[int] = []
        for ex in batch:
            positive_doc_indices.append(len(doc_list))
            doc_list.append(ex["positive_passage"])
            doc_list.extend(ex["negative_passages"])

        query_args = self.encode_query(query_list)
        doc_args = self.encode_doc(doc_list)
        return (
            query_args,
            doc_args,
            np.asarray(positive_doc_indices, dtype=np.int32),
            np.asarray([ex["index"] for ex in batch], dtype=np.int32),
        )


class E5Collator(RetrieverCollator):
    """E5 prefixes: "query: " / "passage: " (reference `collators.py:132-145`)."""

    def encode_query(self, query_list, **kwargs):
        if isinstance(query_list, str):
            query_list = [query_list]
        return super().encode_query(["query: " + q for q in query_list], **kwargs)

    def encode_doc(self, doc_list, **kwargs):
        if isinstance(doc_list, str):
            doc_list = [doc_list]
        return super().encode_doc(["passage: " + d for d in doc_list], **kwargs)


class BGECollator(RetrieverCollator):
    """BGE query instruction prefix (reference `collators.py:148-156`)."""

    QUERY_INSTRUCTION = "Represent this sentence for searching relevant passages:"

    def encode_query(self, query_list, **kwargs):
        if isinstance(query_list, str):
            query_list = [query_list]
        return super().encode_query([f"{self.QUERY_INSTRUCTION} {q}" for q in query_list], **kwargs)


# Registry mirroring `utils/const.py:12-15`.
COLLATOR_MAP = {
    "E5Retriever": E5Collator,
    "BGERetriever": BGECollator,
    "e5": E5Collator,
    "bge": BGECollator,
}
