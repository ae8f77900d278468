"""Property-based tests (hypothesis) for the pure-Python surfaces —
no Spark session, so hundreds of generated cases run in seconds.

These pin ALGEBRAIC invariants the example-based fixtures can't sweep:
round-trips over arbitrary chunkings, byte-identity under arbitrary
inputs, and exhaustive-partition properties of the split functions.
"""

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
