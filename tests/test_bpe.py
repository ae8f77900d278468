"""Merge-table BPE: committed fixture, spec determinism, spec-vs-engine
identity (VERDICT r3 #6).

The driver-query token budgets stay on the RE2-safe pre-tokenizer count
(DuckDB parity); these tests pin the REAL subword tokenizer: the
committed merges fixture is byte-stable, training is deterministic,
encoding round-trips content, and the Arrow-batched engine UDF emits
token-for-token what the pure-Python spec emits.
"""

import hashlib
import os

import pytest

from gonova_document_parser_spark.spec.bpe import (
    encode,
    encode_word,
    load_merges,
    pretokens,
    save_merges,
    train_bpe,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bpe_merges.txt")
FIXTURE_SHA256 = "4138f5968c8d1c879c16742186421a3d29f7f56f7bf48a920737e25f0582e255"


def test_fixture_is_byte_pinned():
    with open(FIXTURE, "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == FIXTURE_SHA256


def test_fixture_regenerates_identically(tmp_path):
    """Training is a pure function of the pinned corpus: re-training
    reproduces the committed fixture byte-for-byte."""
    import importlib

    mk = importlib.import_module("tests.fixtures.make_bpe_merges")
    merges = train_bpe(mk.CORPUS, mk.N_MERGES)
    out = str(tmp_path / "m.txt")
    save_merges(merges, out)
    with open(out, "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == FIXTURE_SHA256


def test_early_merges_are_english_pairs():
    merges = load_merges(FIXTURE)
    assert len(merges) == 200
    assert ("h", "e") in merges[:5]       # 'he' from the/he/there
    assert ("t", "he") in merges[:5]      # 'the'
    assert ("in", "g") in merges[:12]     # '-ing' suffix


def test_encode_merges_common_words_to_single_tokens():
    merges = load_merges(FIXTURE)
    assert encode("the", merges) == ["the"]
    assert encode("and", merges) == ["and"]
    # compression property on real-ish text: chars > tokens >= words
    text = "the extraction pipeline processes the documents into text"
    toks = encode(text, merges)
    n_words = len(text.split())
    assert n_words <= len(toks) < len(text.replace(" ", ""))


def test_encode_word_applies_lowest_rank_first():
    # ranks: (a,b)=0 then (ab,c)=1 — "abc" must become ["abc"], not ["a","bc"]
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    assert encode_word("abc", ranks) == ["abc"]
    # without the cascade, (b,c) would win only if (a,b) were absent
    assert encode_word("xbc", ranks) == ["x", "bc"]


def test_pretokens_match_pretokenizer_regex_semantics():
    assert pretokens("Hello, World 42!") == ["hello", ",", "world", "42", "!"]
    assert pretokens("") == []
    assert pretokens("   ") == []


def test_encode_concat_identity():
    """BPE never alters bytes: concatenated tokens == concatenated
    pre-tokens (merges only join, never rewrite)."""
    merges = load_merges(FIXTURE)
    for text in (
        "the quick brown fox",
        "unseen-words like zyzzyva stay characterwise",
        "punctuation: yes, (even) this!",
        "numbers 12345 and 2024",
    ):
        assert "".join(encode(text, merges)) == "".join(pretokens(text))


def test_word_cache_changes_nothing():
    merges = load_merges(FIXTURE)
    text = "the cat and the dog and the cat again " * 5
    assert encode(text, merges, _cache={}) == encode(text, merges)


@pytest.mark.usefixtures("spark")
def test_engine_udf_matches_spec_on_corpus(spark):
    """Arrow-batched UDF == pure-Python spec, token-for-token, over real
    synthetic-corpus documents plus hostile rows."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.functions.textstats import (
        bpe_encode_udf,
        bpe_token_count_udf,
    )

    merges = load_merges(FIXTURE)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    hostile = spark.createDataFrame(
        [(9000001, None), (9000002, ""), (9000003, "   "), (9000004, "éè中文")],
        "doc_id long, text string",
    )
    df = docs.unionByName(hostile)
    got = {
        r["doc_id"]: (r["toks"], r["n"])
        for r in df.select(
            "doc_id",
            bpe_encode_udf(merges)("text").alias("toks"),
            bpe_token_count_udf(merges)("text").alias("n"),
        ).collect()
    }
    for row in df.collect():
        want = encode(row["text"], merges) if row["text"] is not None else []
        assert got[row["doc_id"]][0] == want, f"doc {row['doc_id']} diverged"
        assert got[row["doc_id"]][1] == len(want)


def test_load_save_roundtrip(tmp_path):
    merges = load_merges(FIXTURE)
    p = str(tmp_path / "rt.txt")
    save_merges(merges, p)
    assert load_merges(p) == merges
