"""Property-based fixtures (hypothesis) for the pure-Python spec.

Invariants (SURVEY §5.2): extracted text tokens ⊆ source text tokens;
spans sorted / non-overlapping / in-bounds; idempotence; never raises.
"""

import re

from hypothesis import given, settings, strategies as st

from gonova_document_parser_spark.spec import extract_document
from gonova_document_parser_spark.spec.htmlx import extract_html_blocks

_WORD = st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=8)
_TAGS = ["div", "p", "span", "li", "ul", "section", "article", "b", "i", "h2"]


@st.composite
def html_doc(draw):
    def element(depth: int) -> str:
        if depth > 3 or draw(st.booleans()):
            return " ".join(draw(st.lists(_WORD, max_size=6)))
        tag = draw(st.sampled_from(_TAGS))
        inner = "".join(element(depth + 1) for _ in range(draw(st.integers(0, 3))))
        return f"<{tag}>{inner}</{tag}>"

    body = "".join(element(0) for _ in range(draw(st.integers(1, 5))))
    return f"<html><body>{body}</body></html>".encode()


@given(html_doc())
@settings(max_examples=60, deadline=None)
def test_extracted_words_subset_of_source(doc):
    blocks = extract_html_blocks(doc)
    source_words = set(re.findall(r"[a-p]+", doc.decode()))
    for _, text in blocks:
        for w in re.findall(r"[a-p]+", text):
            assert w in source_words


@given(html_doc())
@settings(max_examples=60, deadline=None)
def test_span_invariants_and_idempotence(doc):
    r1 = extract_document(doc)
    r2 = extract_document(doc)
    assert r1 == r2
    text = r1["extracted_text"]
    prev_end = -1
    for start, end, kind in r1["spans"]:
        assert 0 <= start <= end <= len(text)
        assert start >= prev_end
        prev_end = end
        assert text[start:end] != "" or start == end


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_generated_pdfs_always_parse(seed_idx):
    """Every corpus-generated PDF yields non-empty ordered blocks and an
    extraction that round-trips through the page-merge format."""
    from gonova_document_parser_spark.corpus import _rng, build_pdf
    from gonova_document_parser_spark.spec.pdfx import parse_pdf

    data = build_pdf(_rng(seed_idx, 42))
    pages, chars = parse_pdf(data)
    assert pages and chars > 0
    assert all(blocks for blocks in pages)  # every page has content
    r = extract_document(data)
    assert r["success"] and r["page_type"] == "pdf"
    assert r["extracted_text"].startswith("<!-- Page 1 -->\n\n")


@given(st.binary(max_size=4096))
@settings(max_examples=80, deadline=None)
def test_never_raises_on_arbitrary_bytes(data):
    r = extract_document(data)
    assert r["page_type"] in ("html", "pdf", "scanned")
    assert isinstance(r["extracted_text"], str)
    assert r["success"] in (True, False)


@given(st.binary(max_size=2048))
@settings(max_examples=80, deadline=None)
def test_cmap_parser_never_raises(data):
    """ToUnicode CMap parsing over arbitrary bytes: always returns a
    (code_len >= 1, dict) pair, never raises."""
    from gonova_document_parser_spark.spec.pdfx import _parse_cmap

    code_len, mapping = _parse_cmap(data)
    assert code_len >= 1
    assert isinstance(mapping, dict)


@given(st.binary(max_size=2048), st.integers(min_value=0, max_value=3))
@settings(max_examples=60, deadline=None)
def test_cmap_decoding_pdf_never_raises(cmap_bytes, pad):
    """A PDF whose /ToUnicode stream is arbitrary bytes still extracts or
    degrades to an error row — never an exception."""
    from gonova_document_parser_spark.spec import extract_document

    content = b"BT /F1 9 Tf 1 0 0 1 50 700 Tm <0001> Tj (plain) Tj ET" + b" " * pad
    doc = b"".join(
        [
            b"%PDF-1.4\n",
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R ",
            b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
            b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content),
            content,
            b"\nendstream\nendobj\n",
            b"5 0 obj\n<< /Type /Font /ToUnicode 6 0 R >>\nendobj\n",
            b"6 0 obj\n<< /Length %d >>\nstream\n" % len(cmap_bytes),
            cmap_bytes,
            b"\nendstream\nendobj\n%%EOF\n",
        ]
    )
    r = extract_document(doc)
    assert isinstance(r["extracted_text"], str)
    assert r["page_type"] in ("pdf", "scanned")


# --- transport/tokenizer properties (round 4) ---

import gzip as gzip_mod

from hypothesis import given, settings
from hypothesis import strategies as st

from gonova_document_parser_spark.sources.warc import (
    _decode_chunked,
    _gunzip_best_effort,
)
from gonova_document_parser_spark.spec.bpe import encode, load_merges, pretokens

MERGES = load_merges("tests/fixtures/bpe_merges.txt")


def _chunk_encode(body: bytes, sizes: list[int]) -> bytes:
    out, pos = bytearray(), 0
    for sz in sizes:
        piece = body[pos : pos + sz]
        if not piece:
            break
        out += hex(len(piece))[2:].encode() + b"\r\n" + piece + b"\r\n"
        pos += len(piece)
    rest = body[pos:]
    if rest:
        out += hex(len(rest))[2:].encode() + b"\r\n" + rest + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


@settings(max_examples=200)
@given(
    body=st.binary(max_size=400),
    sizes=st.lists(st.integers(min_value=1, max_value=50), max_size=8),
)
def test_chunked_roundtrip_any_chunking(body, sizes):
    """De-chunk(chunk(body, any sizes)) == body, for ANY body bytes
    including ones containing CRLFs and hex-looking prefixes."""
    assert _decode_chunked(_chunk_encode(body, sizes)) == body


@settings(max_examples=100)
@given(
    body=st.binary(min_size=1, max_size=300),
    cut=st.integers(min_value=0, max_value=400),
)
def test_chunked_truncation_yields_prefix(body, cut):
    """Any truncation of a chunked stream decodes to a PREFIX of the
    body (or falls back to None on an unparseable first size line) —
    never an exception, never invented bytes."""
    enc = _chunk_encode(body, [7, 13])
    got = _decode_chunked(enc[: min(cut, len(enc))])
    if got is not None:
        assert body.startswith(got)


@settings(max_examples=100)
@given(parts=st.lists(st.binary(max_size=200), min_size=1, max_size=5))
def test_gunzip_multimember_roundtrip(parts):
    data = b"".join(gzip_mod.compress(p) for p in parts)
    assert _gunzip_best_effort(data) == b"".join(parts)


@settings(max_examples=100)
@given(
    parts=st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=3),
    cut=st.integers(min_value=2, max_value=10_000),
)
def test_gunzip_truncation_never_raises_and_keeps_whole_members(parts, cut):
    members = [gzip_mod.compress(p) for p in parts]
    data = b"".join(members)[:cut]
    got = _gunzip_best_effort(data)
    # every member whose bytes fully survive the cut is fully decoded
    whole, pos = [], 0
    for p, m in zip(parts, members):
        if pos + len(m) <= len(data):
            whole.append(p)
            pos += len(m)
        else:
            break
    assert got.startswith(b"".join(whole))


@settings(max_examples=200)
@given(text=st.text(max_size=300))
def test_bpe_concat_identity_any_text(text):
    """BPE merges only JOIN pre-tokens' pieces — concatenated tokens are
    byte-identical to concatenated pre-tokens for ANY input."""
    assert "".join(encode(text, MERGES)) == "".join(pretokens(text))


@settings(max_examples=200)
@given(text=st.text(max_size=300))
def test_bpe_token_count_bounds(text):
    """words <= bpe tokens <= characters-of-pretokens."""
    toks = encode(text, MERGES)
    pts = pretokens(text)
    assert len(pts) <= len(toks) <= sum(len(p) for p in pts)


@settings(max_examples=30)
@given(
    corpus=st.lists(
        st.text(alphabet="abcdef gh", min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=12),
)
def test_bpe_trainer_deterministic_and_encode_respects_merges(corpus, n_merges):
    """Training twice on the same corpus yields the identical merge list
    (the lexicographic tie-break leaves no ambiguity), and encoding any
    training doc with those merges still concat-round-trips."""
    from gonova_document_parser_spark.spec.bpe import train_bpe

    m1 = train_bpe(corpus, n_merges)
    m2 = train_bpe(list(corpus), n_merges)
    assert m1 == m2
    for doc in corpus:
        assert "".join(encode(doc, m1)) == "".join(pretokens(doc))
