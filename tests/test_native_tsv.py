"""Native C++ TSV parser parity vs the Python loader (exact row semantics)."""

import shutil

import pytest

from kirag_tpu.data.corpus import load_psg_data

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")


SAMPLE = (
    "id\ttext\ttitle\n"                                   # header: skipped
    "1\tPlain passage text.\tPlain Title\n"
    "2\t\"Quoted passage\"\t'Punct Title'\n"              # strip 1 punct each end
    "3\tHe said \"\"hi\"\" twice \"\"ok\"\"\tT3\n"        # doubled quotes collapse
    "short\tonly-two-fields\n"                            # <3 fields: dropped
    "4\tfield\twith\textra\ttabs\n"                       # extras ignored
    "5\t  spaced  \t  Title Spaced  \n"                   # outer strip only
    "6\t.\t!\n"                                           # single punct fields
    "7\t\t\n"                                             # empty text/title
)


@pytest.fixture()
def tsv_file(tmp_path):
    p = tmp_path / "sample.tsv"
    p.write_text(SAMPLE, encoding="utf-8")
    return str(p)


def test_native_matches_python(tsv_file):
    py = load_psg_data(tsv_file, native=False)
    nat = load_psg_data(tsv_file, native=True)
    assert len(nat) == len(py)
    for i in range(len(py)):
        assert nat[i] == py[i], (i, nat[i], py[i])
    # iteration and negative indexing follow list semantics
    assert list(nat) == list(py)
    assert nat[-1] == py[-1]


def test_native_slice(tsv_file):
    py = load_psg_data(tsv_file, native=False)
    nat = load_psg_data(tsv_file, native=True)
    assert nat[1:3] == py[1:3]


def test_corpus_integration(tsv_file):
    from kirag_tpu.data.corpus import Wikipedia

    wiki = Wikipedia(corpus_path=tsv_file)
    doc = wiki.get_document("3")
    assert '""' not in doc["text"] and '"' in doc["text"]
    assert wiki.doc_to_str(doc).startswith("title:")


def test_larger_random_file(tmp_path):
    import random

    random.seed(0)
    rows = ["id\ttext\ttitle"]
    for i in range(2000):
        txt = "".join(random.choice("abc \"'.,!xyz") for _ in range(40))
        ttl = "".join(random.choice("ABC\"'.d ") for _ in range(12))
        rows.append(f"{i}\t{txt}\t{ttl}")
    p = tmp_path / "rand.tsv"
    p.write_text("\n".join(rows) + "\n", encoding="utf-8")
    py = load_psg_data(str(p), native=False)
    nat = load_psg_data(str(p), native=True)
    assert len(nat) == len(py)
    for i in range(len(py)):
        assert nat[i] == py[i], i


def test_universal_newlines_and_control_ws(tmp_path):
    """Lone '\r' and "\r\n" line breaks (Python text-mode universal newlines)
    and the single-byte control whitespace \x1c-\x1f must parse identically
    to the Python loader. (Multi-byte UTF-8 whitespace like U+00A0 at line
    edges is a DOCUMENTED divergence — absent from DPR psgs_w100.)"""
    raw = (b"id\ttext\ttitle\n"
           b"1\talpha\tA\r"                # lone \r terminator
           b"2\tbeta\tB\r\n"               # \r\n counts once
           b"3\tgamma\x1c\tC\x1f\n"        # FS/US stripped by Python strip()
           b"4\tdelta\tD")                 # no trailing newline
    p = tmp_path / "nl.tsv"
    p.write_bytes(raw)
    py = load_psg_data(str(p), native=False)
    nat = load_psg_data(str(p), native=True)
    assert len(nat) == len(py) == 4
    for i in range(len(py)):
        assert nat[i] == py[i], (i, nat[i], py[i])
