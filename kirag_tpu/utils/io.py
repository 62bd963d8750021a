"""JSON / JSONL / TSV IO and stable object hashing.

Mirrors the IO surface of the reference (`utils/utils.py:11-78`) with a
deterministic, dependency-light hash: the reference hashes arbitrary objects
with dill+blake2b+base58 (`utils/utils.py:43-55`); we hash a canonical JSON
serialization with blake2b and emit a base-58 string so triple-dedup IDs are
stable across processes and Python versions.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Iterable, List, Sequence, Tuple

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58encode(data: bytes) -> str:
    num = int.from_bytes(data, "big")
    out = []
    while num > 0:
        num, rem = divmod(num, 58)
        out.append(_B58_ALPHABET[rem])
    # preserve leading zero bytes as '1's, like standard base58
    for byte in data:
        if byte == 0:
            out.append(_B58_ALPHABET[0])
        else:
            break
    return "".join(reversed(out))


def _canonicalize(obj: Any) -> Any:
    """Convert an object into a JSON-serializable canonical form."""
    if isinstance(obj, dict):
        return {str(k): _canonicalize(v) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))}
    if isinstance(obj, (list, tuple)):
        return [_canonicalize(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if hasattr(obj, "tolist"):  # numpy arrays / scalars
        return _canonicalize(obj.tolist())
    return repr(obj)


def hash_object(obj: Any) -> str:
    """Stable base58 blake2b hash of an arbitrary (JSON-like) Python object."""
    payload = json.dumps(_canonicalize(obj), sort_keys=True, ensure_ascii=False).encode("utf-8")
    return _b58encode(hashlib.blake2b(payload).digest())


def load_json(path: str, type: str = "json") -> Any:
    assert type in ("json", "jsonl"), "only json or jsonl format is supported"
    if type == "json":
        with open(path, "r", encoding="utf-8") as fin:
            return json.loads(fin.read())
    outputs = []
    with open(path, "r", encoding="utf-8") as fin:
        for line in fin:
            line = line.strip()
            if line:
                outputs.append(json.loads(line))
    return outputs


def save_json(data: Any, path: str, type: str = "json", use_indent: bool = False) -> str:
    assert type in ("json", "jsonl"), "only json or jsonl format is supported"
    with open(path, "w", encoding="utf-8") as fout:
        if type == "json":
            fout.write(json.dumps(data, indent=4 if use_indent else None))
        else:
            for item in data:
                fout.write(json.dumps(item) + "\n")
    return path


def load_tsv(path: str) -> List[Tuple[str, ...]]:
    data: List[Tuple[str, ...]] = []
    with open(path, encoding="utf-8") as fin:
        for line in fin:
            data.append(tuple(str(piece) for piece in line.rstrip("\n").split("\t")))
    return data


def save_tsv(data: Iterable[Sequence[Any]], path: str) -> str:
    with open(path, "w", encoding="utf-8") as fout:
        for item in data:
            cells = []
            for x in item:
                if isinstance(x, float):
                    cells.append(f"{x:.6f}")
                else:
                    cells.append(str(x))
            fout.write("\t".join(cells) + "\n")
    return path
