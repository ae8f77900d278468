"""Dedup / similarity / textstats operator fixtures on hand-built data."""

import pyspark.sql.functions as F
import pytest

from gonova_document_parser_spark.functions.dedup import (
    exact_dup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from gonova_document_parser_spark.functions.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    lsh_bucket_candidates,
    pairwise_cosine_neardups,
)
from gonova_document_parser_spark.functions.textstats import (
    lang_id_expr,
    token_count_expr,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
    (3, "completely different text about spark and shuffles here"),
    (4, "THE  QUICK   brown fox jumps over the lazy dog"),  # ws/case variant
    (5, "short"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_groups(docs):
    groups = {r["fp"]: r for r in exact_dup_groups(docs).collect()}
    by_n = sorted(r["n_dups"] for r in groups.values())
    # 0,1,4 normalize to the same text -> one group of 3
    assert by_n == [1, 1, 1, 3]
    trio = next(r for r in groups.values() if r["n_dups"] == 3)
    assert trio["keeper"] == 0


def test_ngram_jaccard_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_candidates_superset_of_high_jaccard(docs):
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact <= cands  # identical-signature pairs always collide


def test_minhash_lsh_candidates_is_join_free_posting_list(docs):
    """VERDICT r4 #2: the old a-join-b self-join on (band_id, band_hash)
    recomputed the entire shingle->minhash->band lineage twice
    (ReusedExchange: 0).  The posting-list form has NO join at all — one
    signature aggregation, pairs expanded JVM-side inside the bucket
    array — so the executed plan must contain zero join operators."""
    plan = (
        minhash_lsh_candidates(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan


def test_minhash_affine_variant_valid_and_deterministic(docs):
    """Affine variant (one md5 -> 32 affine transforms mod 2^31-1): a real
    minhash family — identical docs share every signature, candidates cover
    the high-Jaccard pairs, values stay in [0, 2^31-1), runs reproduce."""
    from gonova_document_parser_spark.functions.dedup import minhash_signatures

    sig = minhash_signatures(docs, hash_fn="affine")
    rows = {r["doc_id"]: [r[f"sig_{i}"] for i in range(32)] for r in sig.collect()}
    assert rows[0] == rows[1] == rows[4]  # identical texts -> identical sigs
    assert all(0 <= v < (1 << 31) - 1 for vs in rows.values() for v in vs)
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, hash_fn="affine").collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact <= cands
    again = {r["doc_id"]: [r[f"sig_{i}"] for i in range(32)]
             for r in minhash_signatures(docs, hash_fn="affine").collect()}
    assert rows == again


def test_simhash_identity_and_distance(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[0] == sh[1] == sh[4]  # identical token multisets

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[0], sh[2]) < hamming(sh[0], sh[3])


def test_simhash_neardup_pairs_banding(spark, docs):
    from gonova_document_parser_spark.functions.dedup import simhash_neardup_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    # identical token multisets -> hamming 0, found via block join
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0 and pairs[(1, 4)] == 0
    # unrelated doc never pairs with the dup cluster
    assert not any(3 in p for p in pairs)
    # pigeonhole precondition enforced
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        simhash_neardup_pairs(docs, max_hamming=8, bands=4)


def test_token_count_and_lang(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat", "en"),
            (1, "le chat et la souris des champs", "fr"),
            (2, "el perro y los gatos de la casa", "es"),
            (3, "der hund und die katze das haus", "de"),
            (4, "这是中文文本", "zh"),
            (5, "zzz qqq xxx", "und"),
        ],
        "doc_id long, text string, expected string",
    )
    rows = df.select(
        "expected",
        lang_id_expr("text").alias("pred"),
        token_count_expr("text").alias("n"),
    ).collect()
    for r in rows:
        assert r["pred"] == r["expected"], r
    assert rows[0]["n"] == 6


def test_word_token_count(spark):
    from gonova_document_parser_spark.functions.textstats import word_token_count_expr

    df = spark.createDataFrame(
        [(0, "Hello, world! It's 42.")], "id long, text string"
    )
    n = df.select(word_token_count_expr("text").alias("n")).collect()[0]["n"]
    # hello , world ! it ' s 42 .  -> 9 BPE-ish tokens
    assert n == 9


EMB = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.999, 0.04, 0.0]),  # near dup of 0
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.0, 1.0]),
    (4, [0.7, 0.7, 0.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk(emb):
    top = brute_force_topk(emb, [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 1, 4]
    assert top[0]["cosine"] == 1.0


def test_pairwise_neardups(emb):
    pairs = {(r["id_a"], r["id_b"]) for r in pairwise_cosine_neardups(emb, 0.99).collect()}
    assert pairs == {(0, 1)}


def test_lsh_candidates_contain_near_dup_and_ann_finds_top1(emb):
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucket_candidates(emb, dim=3, n_tables=8, n_planes=4).collect()
    }
    assert (0, 1) in cands
    top = ann_topk_lsh(emb, [1.0, 0.0, 0.0], dim=3, k=2, n_tables=8, n_planes=4).collect()
    assert top[0]["vec_id"] == 0


def test_lsh_vectorized_buckets_match_expression_path(spark, emb):
    from gonova_document_parser_spark.functions.similarity import (
        lsh_buckets,
        lsh_buckets_vectorized,
    )

    a = {(r["vec_id"], r["table_id"]): r["bucket"] for r in lsh_buckets(emb, 3, 4, 6).collect()}
    b = {
        (r["vec_id"], r["table_id"]): r["bucket"]
        for r in lsh_buckets_vectorized(emb, 3, 4, 6).collect()
    }
    assert a == b and len(a) == 20


def test_ivf_topk_finds_exact_top1(spark):
    from gonova_document_parser_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(v) for v in emb.where("vec_id = 0").collect()[0]["embedding"]]
    top = ivf_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == 1.0
    # deterministic across runs (seeded kmeans)
    again = ivf_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()
    assert [r["vec_id"] for r in top] == [r["vec_id"] for r in again]


def test_ivf_materialize_probe(spark, tmp_path):
    """Materialize-once + probe (VERDICT r1 #4): the per-query plan has no
    KMeans fit, matches the inline path's results, and the scan partition-
    prunes to the n_probe probed cells."""
    from gonova_document_parser_spark.functions.similarity import (
        ivf_materialize,
        ivf_probe,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(v) for v in emb.where("vec_id = 0").collect()[0]["embedding"]]
    path = str(tmp_path / "ivf")
    ivf_materialize(emb, path, n_cells=8)
    probe = ivf_probe(spark, path, q, k=5, n_probe=3)
    got = probe.collect()
    # same answer as the inline convenience form (same seed, same kmeans)
    inline = ivf_topk(emb, q, k=5, n_cells=8, n_probe=3).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in inline]
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == 1.0
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "KMeans" not in plan
    # partition pruning: the cell IN-filter reaches the scan as a partition
    # filter (not a post-scan Filter), so only the 3 probed cell
    # directories are read
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "cell" in m.group(1)
    in_vals = re.search(r"IN \(([^)]*)\)", m.group(1))
    assert in_vals is not None and len(in_vals.group(1).split(",")) == 3
    import os

    n_cells_written = len(
        [d for d in os.listdir(os.path.join(path, "vectors")) if d.startswith("cell=")]
    )
    assert n_cells_written > 3  # index actually has more cells than probed


def test_bpe_token_count_expr(spark):
    """GPT-2-style pre-tokenizer: contractions split, letter/digit/punct
    runs each count once, space prefixes absorb into the next token."""
    from gonova_document_parser_spark.functions.textstats import (
        bpe_token_count_expr,
    )

    cases = [
        # "it's 2024, really?!" -> it|'s| 2024|,| really|?!
        ("it's 2024, really?!", 6),
        ("hello world", 2),
        ("", 0),
        ("a1b2", 4),  # letter/digit alternation splits each run
        ("   ", 1),  # bare whitespace is one token
    ]
    df = spark.createDataFrame(cases, "t string, expect int")
    for r in df.select("expect", bpe_token_count_expr("t").alias("n")).collect():
        assert r["n"] == r["expect"], r


def test_gopher_flags(spark):
    """Gopher rules discriminate: short docs fail word-count, symbol-heavy
    docs fail symbol-ratio, number-only docs fail alpha-words; a normal
    prose doc passes everything."""
    from gonova_document_parser_spark.functions.textstats import gopher_flags

    prose = "the quick brown fox jumps over the lazy dog near a quiet river " * 5
    short = "too short"
    hashy = ("word # " * 60).strip()  # 1 symbol per 2 words -> ratio 0.5
    nums = ("12345 67890 " * 30).strip()
    df = spark.createDataFrame(
        [("prose", prose), ("short", short), ("hashy", hashy), ("nums", nums),
         ("empty", "")],
        "name string, text string",
    )
    f = gopher_flags("text")
    rows = {
        r["name"]: r
        for r in df.select(
            "name", *(f[k].alias(k) for k in
                      ("n_words", "flag_word_count", "flag_mean_word_len",
                       "flag_symbol_ratio", "flag_alpha_words", "keep"))
        ).collect()
    }
    assert rows["prose"]["keep"] is True
    assert rows["short"]["flag_word_count"] is False and rows["short"]["keep"] is False
    assert rows["hashy"]["flag_symbol_ratio"] is False
    assert rows["nums"]["flag_alpha_words"] is False
    assert rows["empty"]["n_words"] == 0 and rows["empty"]["keep"] is False


def test_emb_neardups_lsh_finds_planted_dups(spark):
    """Quantized-LSH near-dup pairs: planted exact duplicates are all found
    (they share every bucket — structural recall), verified cosine is 1.0,
    and no random pair clears the 0.99 threshold."""
    from pyspark.sql import functions as F

    from gonova_document_parser_spark.functions.similarity import emb_neardups_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dup = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    pairs = emb_neardups_lsh(emb.unionByName(dup), dim=64, threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs}
    assert set(got) == {(i, i + 1000000) for i in range(20)}
    assert all(c == 1.0 for c in got.values())


def test_ivf_index_path_keyed_by_content(tmp_path):
    """The materialized-index path is a function of the embeddings CONTENT:
    identical corpora share one index; mutating a single embedding value
    changes the path (no stale-index cross-serving, VERDICT r2 #2)."""
    import pandas as pd

    import __spark_entry__ as E

    def write(dirname, vals):
        d = tmp_path / dirname
        d.mkdir()
        pd.DataFrame({"vec_id": [0, 1], "embedding": [vals, vals]}).to_parquet(
            d / "embeddings.parquet"
        )
        return str(d)

    a = write("a", [0.1, 0.2, 0.3])
    b = write("b", [0.1, 0.2, 0.3])
    c = write("c", [0.1, 0.2, 0.3000001])
    pa, pb, pc = (E._ivf_index_path(p) for p in (a, b, c))
    assert pa == pb  # same content -> same index
    assert pa != pc  # one mutated component -> different index


def test_ivf_index_completion_marker(spark, tmp_path):
    """A killed build (no _COMPLETE marker) is treated as absent."""
    from gonova_document_parser_spark.functions.similarity import (
        ivf_index_ready,
        ivf_materialize,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    assert not ivf_index_ready(path)
    ivf_materialize(emb, path, n_cells=4)
    assert ivf_index_ready(path)
    import os

    os.remove(os.path.join(path, "_COMPLETE"))
    assert not ivf_index_ready(path)


def test_single_shuffle_simhash_plan(docs):
    """SimHash64's 63 bit-votes run in ONE aggregation (single Exchange)."""
    plan = simhash64(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial+final HashAggregate, one shuffle (+AQE read)


def test_minhash_lsh_verified_equals_exact(docs):
    """LSH-candidates + exact-verify pipeline returns the same pairs as the
    exact shingle self-join on near-dup data (recall 1 at this threshold)."""
    from gonova_document_parser_spark.functions.dedup import minhash_lsh_verified

    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    verified = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_verified(docs, threshold=0.5).collect()
    }
    assert verified == exact and len(exact) > 0


def test_simhash_md5_variant_deterministic(docs):
    """md5-variant simhash: 60-bit values, stable across runs, near-dups
    still at small Hamming distance."""
    from gonova_document_parser_spark.functions.dedup import simhash_neardup_pairs

    sig = {r["doc_id"]: r["simhash"] for r in simhash64(docs, hash_fn="md5").collect()}
    assert all(0 <= v < (1 << 60) for v in sig.values())
    assert sig[0] == sig[1]  # exact dup -> same signature
    again = {r["doc_id"]: r["simhash"] for r in simhash64(docs, hash_fn="md5").collect()}
    assert sig == again
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(docs, max_hamming=3, bands=4, hash_fn="md5").collect()
    }
    assert (0, 1) in pairs


def test_embed_encoder_injection(spark):
    """make_embed_udf accepts an injected encoder; oracle_encode components
    round-trip to exact sha256 bytes."""
    import hashlib

    from gonova_document_parser_spark.functions.embeddings import (
        embed_expr,
        oracle_encode,
    )

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    vec = df.select(embed_expr("text", encoder=oracle_encode).alias("e")).collect()[0]["e"]
    digest = hashlib.sha256(b"hello world").digest()
    assert len(vec) == 32
    assert [round(v * 255) for v in vec] == list(digest)
    # custom injected encoder is actually used
    vec2 = df.select(
        embed_expr("text", encoder=lambda t: [float(len(t))]).alias("e")
    ).collect()[0]["e"]
    assert vec2 == [11.0]


def test_pii_scrub_and_counts(spark):
    from gonova_document_parser_spark.functions.pii import (
        pii_counts,
        repetition_ratio_expr,
        scrub_pii_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@sub.example.co.uk or call +1 (555) 123-4567"),
            (2, "server at 10.0.0.1 and 192.168.1.255, nothing else"),
            (3, "clean text with no contact info at all"),
            (4, "dup dup dup dup words words"),
        ],
        "doc_id long, text string",
    )
    c = pii_counts("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("e"),
            c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
            scrub_pii_expr("text").alias("s"),
            repetition_ratio_expr("text").alias("rep"),
        ).collect()
    }
    assert rows[1]["e"] == 1 and rows[1]["p"] >= 1
    assert "[EMAIL]" in rows[1]["s"] and "[PHONE]" in rows[1]["s"]
    assert "jane.doe" not in rows[1]["s"] and "555" not in rows[1]["s"]
    assert rows[2]["i"] == 2 and rows[2]["s"].count("[IP]") == 2
    assert rows[3]["e"] == rows[3]["i"] == 0 and rows[3]["s"] == df.collect()[2]["text"]
    # 6 tokens, 2 distinct -> 1 - 2/6
    assert abs(rows[4]["rep"] - (1 - 2 / 6)) < 1e-6
    assert rows[3]["rep"] < rows[4]["rep"]


def test_ann_quantized_matches_exact_top1_and_recall(spark):
    """Integer-quantized LSH: engine-reproducible buckets, recall within a
    few points of the float-hyperplane variant."""
    from gonova_document_parser_spark.functions.similarity import (
        ann_topk_lsh_quantized,
        brute_force_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = [float(v) for v in emb.where("vec_id = 0").collect()[0]["embedding"]]
    got = [r["vec_id"] for r in ann_topk_lsh_quantized(emb, q, dim=64, k=10).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    assert got[0] == exact[0] == 0  # the query vector itself is always found
    assert len(set(got) & set(exact)) >= 5  # recall@10 >= 0.5 on this corpus
    again = [r["vec_id"] for r in ann_topk_lsh_quantized(emb, q, dim=64, k=10).collect()]
    assert got == again  # deterministic


def test_url_canonicalization(spark):
    from gonova_document_parser_spark.functions.urls import canonical_url_expr

    cases = [
        (
            "HTTPS://WWW.Example.COM:443/Path/Doc?utm_source=x&id=7&utm_campaign=y#f",
            "https://example.com/Path/Doc?id=7",
        ),
        ("http://example.com:80/a?fbclid=abc", "http://example.com/a"),
        ("https://example.com/a?id=1&gclid=z&x=2", "https://example.com/a?id=1&x=2"),
        ("https://sub.example.com/CaseKept?Q=UPPER", "https://sub.example.com/CaseKept?Q=UPPER"),
        ("not a url at all", "not a url at all"),
        ("https://example.com/?utm_x=1&utm_y=2&z=3", "https://example.com/?z=3"),
        ("https://example.com:8080/keep-port", "https://example.com:8080/keep-port"),
        # default-port strip is scheme-matched: :443 on http (and :80 on
        # https) is a NON-default port naming a different resource — kept
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("https://example.com:80/x", "https://example.com:80/x"),
        ("http://example.com:80", "http://example.com"),
        ("https://example.com:443", "https://example.com"),
    ]
    df = spark.createDataFrame(cases, "url string, expect string")
    rows = df.select("expect", canonical_url_expr("url").alias("canon")).collect()
    for r in rows:
        assert r["canon"] == r["expect"], r


def test_line_dedup_drops_hot_lines_preserving_order(spark):
    from gonova_document_parser_spark.functions.lines import line_dedup

    banner = "accept our cookies"
    docs = [(i, f"unique opener {i}\n{banner}\n\nbody line {i}\n{banner}")
            for i in range(8)]
    # doc 99 has no boilerplate and a repeated (but doc-local) line
    docs.append((99, "solo line\nsolo line"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=5).collect()}
    for i in range(8):
        r = out[i]
        # both banner occurrences dropped; empty line (structural) kept
        assert r["clean_text"] == f"unique opener {i}\n\nbody line {i}"
        assert r["n_kept"] == 3 and r["n_dropped"] == 2
    # a line repeated only within ONE doc is not hot (count is per-doc)
    assert out[99]["clean_text"] == "solo line\nsolo line"
    assert out[99]["n_dropped"] == 0


def test_line_dedup_threshold_boundary(spark):
    from gonova_document_parser_spark.functions.lines import line_dedup

    # "shared" appears in exactly max_docs docs -> kept; +1 -> dropped
    df3 = spark.createDataFrame(
        [(i, "shared\nown " + str(i)) for i in range(3)],
        "doc_id long, text string",
    )
    kept = line_dedup(df3, max_docs=3).collect()
    assert all(r["clean_text"].startswith("shared") for r in kept)
    dropped = line_dedup(df3, max_docs=2).collect()
    assert all(not r["clean_text"].startswith("shared") for r in dropped)


def test_connected_components_chain_and_islands(spark):
    from gonova_document_parser_spark.functions.dedup import (
        connected_components,
        dedup_clusters,
    )

    # path 1-2-3-4-5 (needs multi-round propagation), island 10-11,
    # triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert all(comp[i] == 1 for i in (1, 2, 3, 4, 5))
    assert comp[10] == comp[11] == 10
    assert all(comp[i] == 20 for i in (20, 21, 22))

    out = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert out[5]["cluster_size"] == 5 and not out[5]["is_keeper"]
    assert out[1]["is_keeper"] and out[10]["is_keeper"] and out[20]["is_keeper"]
    assert sum(1 for r in out.values() if r["is_keeper"]) == 3


def test_dedup_clusters_query_chain_is_transitive(spark):
    """The planted sliding-window chain must land in ONE component even
    though its endpoints are below the pair threshold — the regression
    guard that the query exercises transitivity, not just cliques."""
    import __spark_entry__ as E

    rows = E.queries()["dedup_clusters"](spark, "/root/testdata/sf0.001").collect()
    chain = {r["doc_id"]: r for r in rows if r["doc_id"] >= 9000000}
    assert set(chain) == {9000000, 9000001, 9000002, 9000003}
    assert {r["cluster_id"] for r in chain.values()} == {9000000}
    assert chain[9000000]["cluster_size"] == 4
    # the 10 planted exact clones each pair with their source doc
    clones = [r for r in rows if 5000000 <= r["doc_id"] < 9000000]
    assert len(clones) == 10
    assert all(r["cluster_id"] == r["doc_id"] - 5000000 for r in clones)


def test_ngram_contamination_flags_leaks_only(spark):
    from gonova_document_parser_spark.functions.dedup import ngram_contamination

    bench = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = spark.createDataFrame(
        [
            (1, "prefix words here " + bench),        # leaked: shares 13-grams
            (2, "totally different content " + " ".join(f"w{i}" for i in range(20))),
            (3, "short doc"),                          # < 13 words: never flagged
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(0, bench)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_contamination(docs, ev, n=13).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit_ngrams"] > 0
    assert not out[2]["contaminated"] and out[2]["n_hit_ngrams"] == 0
    assert not out[3]["contaminated"]
    # scale shape: the eval-shingle side must broadcast (no full shuffle join)
    plan = ngram_contamination(docs, ev, n=13)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_deterministic_and_per_stratum(spark):
    from gonova_document_parser_spark.functions.sampling import stratified_sample

    d = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    got = stratified_sample(d, rates, default_rate=0.25).collect()
    again = stratified_sample(d, rates, default_rate=0.25).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    by_src = {}
    for r in got:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src["s0"] == 500          # rate 1.0 keeps everything
    assert "s2" not in by_src           # rate 0.0 keeps nothing
    assert 150 <= by_src["s1"] <= 350   # ~250 at rate 0.5
    assert 50 <= by_src.get("s3", 0) <= 200  # default 0.25 -> ~125
    # no shuffle: a pure filter, no Exchange in the plan
    plan = (
        stratified_sample(d, rates)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_hash_split_stable_under_append(spark):
    from gonova_document_parser_spark.functions.sampling import hash_split

    import pytest as _pytest

    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(small, splits).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, splits).collect()}
    assert all(b[k] == v for k, v in a.items())  # appends never move docs
    counts = {}
    for v in b.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 1000          # total partition: every doc
    with _pytest.raises(ValueError):
        hash_split(small, {"train": 0.5, "val": 0.1})  # doesn't sum to 1


def test_latest_snapshot_keeps_newest_with_tiebreak(spark):
    from datetime import datetime

    from gonova_document_parser_spark.functions.dedup import latest_snapshot

    t1, t2 = datetime(2026, 1, 1), datetime(2026, 1, 2)
    rows = [
        ("u1", t1, 1), ("u1", t2, 2),          # newest wins
        ("u2", t1, 3), ("u2", t1, 4),          # tie -> max tiebreak wins
        ("u3", t2, 5),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, snap_id long")
    out = {r["url"]: r["snap_id"]
           for r in latest_snapshot(df, ["url"], tiebreak_col="snap_id").collect()}
    assert out == {"u1": 2, "u2": 4, "u3": 5}


def test_duplicated_spans_interval_union(spark):
    from gonova_document_parser_spark.functions.dedup import duplicated_spans

    common = " ".join(f"c{i}" for i in range(12))      # 12 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "x0 x1 x2 " + common + " y0 y1"),       # 17 toks, block at 3..14
            (2, common + " z0 z1 z2 z3"),               # 16 toks, block at 0..11
            (3, common + " " + " ".join(f"m{i}" for i in range(10))
                + " " + common),                        # block twice: 34 toks
            (4, " ".join(f"u{i}" for i in range(15))),  # unrelated
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_spans(docs, window=10).collect()}
    # 12-token block -> 3 windows of 10; union covers exactly 12 tokens
    assert out[1]["n_dup_windows"] == 3
    assert out[1]["dup_frac"] == round(12 / 17, 6)
    assert out[2]["n_dup_windows"] == 3
    assert out[2]["dup_frac"] == round(12 / 16, 6)
    # two disjoint duplicated blocks: union = 24 of 34 tokens
    assert out[3]["n_dup_windows"] == 6
    assert out[3]["dup_frac"] == round(24 / 34, 6)
    assert out[4]["n_dup_windows"] == 0 and out[4]["dup_frac"] == 0.0


def test_outlink_host_graph_resolution(spark):
    from gonova_document_parser_spark.functions.webgraph import outlink_host_graph

    rows = [
        ("https://a.com/page", '<a href="/rel">x</a><a href=\'https://B.com/y\'>y</a>'
         '<a href="//c.com/z">z</a><a href="https://a.com/self">s</a>'),
        ("https://a.com/other", '<a href="#frag">f</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html_text string")
    edges = {(r["src_host"], r["dst_host"]): r["n_links"]
             for r in outlink_host_graph(df).collect()}
    # relative + fragment -> own host; absolute lowercased; proto-relative
    assert edges == {
        ("a.com", "a.com"): 3,   # /rel, /self (absolute same host), #frag
        ("a.com", "b.com"): 1,
        ("a.com", "c.com"): 1,
    }


def test_pagerank_integer_exact_vs_reference(spark):
    from gonova_document_parser_spark.functions.webgraph import pagerank_hosts

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "a", 1), ("c", "a", 3)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    got = {r["host"]: r["rank_scaled"]
           for r in pagerank_hosts(df, iters=5).collect()}

    # independent pure-Python replica of the integer recurrence
    SCALE, BASE = 1_000_000, 150_000
    hosts = {"a", "b", "c"}
    W = {"a": 3, "b": 1, "c": 3}
    r = {h: SCALE for h in hosts}
    for _ in range(5):
        nxt = {h: BASE for h in hosts}
        for s, d, w in edges:
            nxt[d] += (r[s] * 85 * w) // (100 * W[s])
        r = nxt
    assert got == r
    # determinism across runs (no float, no order dependence)
    again = {x["host"]: x["rank_scaled"]
             for x in pagerank_hosts(df, iters=5).collect()}
    assert got == again


def test_line_dedup_matches_python_reference_on_random_corpus(spark):
    import random

    from gonova_document_parser_spark.functions.lines import line_dedup

    rng = random.Random(1234)
    pool = [f"line {i} xyz" for i in range(30)]       # small pool -> hot lines
    docs = [
        (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 12))))
        for i in range(200)
    ]
    max_docs = 40
    # pure-Python reference with identical semantics
    from collections import defaultdict
    seen = defaultdict(set)
    for i, t in docs:
        for ln in t.split("\n"):
            if ln:
                seen[ln].add(i)
    hot = {ln for ln, s in seen.items() if len(s) > max_docs}
    expect = {}
    for i, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in hot]
        expect[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in line_dedup(df, max_docs=max_docs).collect()
    }
    assert got == expect


def test_script_stats_dominant_and_mixed(spark):
    from gonova_document_parser_spark.functions.textstats import script_stats

    rows = [
        (1, "plain english words only"),
        (2, "привет мир кириллица здесь"),
        (3, "مرحبا بالعالم نص عربي"),
        (4, "東京と大阪のデータ"),
        (5, "한국어 코퍼스 문서"),          # hangul counts as cjk range
        (6, "12345 67890"),               # digits only
        (7, ""),                          # none
        (8, "english текст пополам"),     # latin+cyrillic both >= 20% -> mixed
        (9, "word " * 50 + "я"),          # tiny cyrillic tail: NOT mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dominant_script"], r["mixed_script"])
        for r in script_stats(df).collect()
    }
    assert got[1] == ("latin", False)
    assert got[2] == ("cyrillic", False)
    assert got[3] == ("arabic", False)
    assert got[4] == ("cjk", False)
    assert got[5] == ("cjk", False)
    assert got[6] == ("digit", False)
    assert got[7] == ("none", False)
    assert got[8][1] is True
    assert got[9] == ("latin", False)


def test_rare_word_stats(spark):
    from gonova_document_parser_spark.functions.textstats import rare_word_stats

    docs = [
        (1, "common common common zyzzyva"),   # 1 rare of 4
        (2, "common words words xqxq wwvv"),   # xqxq wwvv rare; 'words' appears 3x total
        (3, "words common unique3"),           # unique3 rare
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for bc in (True, False):  # broadcast and shuffle paths agree
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_rare"], r["rare_ratio"])
            for r in rare_word_stats(df, max_count=2, broadcast_hot=bc).collect()
        }
        assert got[1] == (4, 1, 0.25)
        assert got[2] == (5, 2, 0.4)
        assert got[3] == (3, 1, round(1 / 3, 6))


def test_incremental_minhash_dedup_store_roundtrip(spark):
    """Appending a delta's kept bands to the store makes a REPLAY of the
    same delta all-duplicate (each doc resolves to its earlier self or
    its representative), and a second genuinely-new delta still keeps —
    the exactly-once property an incremental dedup store must have."""
    from gonova_document_parser_spark.functions.dedup import (
        incremental_minhash_dedup,
        minhash_bands,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus document {i} talks about topic{i} extensively "
              f"and then repeats topic{i} words topic{i} more") for i in range(20)],
        "doc_id long, text string",
    )
    store = minhash_bands(corpus)
    delta = spark.createDataFrame(
        [
            (100, "corpus document 3 talks about topic3 extensively "
                  "and then repeats topic3 words topic3 more"),  # exact copy
            (101, "fresh delta fresh content fresh words completely new here"),
        ],
        "doc_id long, text string",
    )
    v1, append1 = incremental_minhash_dedup(delta, store)
    r1 = {r["doc_id"]: r for r in v1.collect()}
    assert r1[100]["dup_of_store"] == 3 and not r1[100]["keep"]
    assert r1[101]["keep"]
    # only the keeper's bands append
    assert {r["doc_id"] for r in append1.select("doc_id").distinct().collect()} == {101}

    store2 = store.unionByName(append1)
    # replaying the same delta with NEW ids: both now duplicate
    replay = delta.selectExpr("doc_id + 1000 as doc_id", "text")
    v2, append2 = incremental_minhash_dedup(replay, store2)
    r2 = {r["doc_id"]: r for r in v2.collect()}
    assert r2[1100]["dup_of_store"] == 3 and not r2[1100]["keep"]
    assert r2[1101]["dup_of_store"] == 101 and not r2[1101]["keep"]
    assert append2.count() == 0


def test_crawl_diff_statuses(spark):
    from gonova_document_parser_spark.functions.diff import crawl_diff

    old = spark.createDataFrame(
        [("u1", "same text"), ("u2", "will change"), ("u3", "goes away")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("u1", "  Same   TEXT \n"),  # reformat-only: unchanged via normalization
            ("u2", "changed body"),
            ("u4", "brand new"),
        ],
        "url string, text string",
    )
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }
    # fingerprints present exactly where the side exists
    rows = {r["url"]: r for r in crawl_diff(old, new).collect()}
    assert rows["u3"]["new_fp"] is None and rows["u3"]["old_fp"] is not None
    assert rows["u4"]["old_fp"] is None and rows["u4"]["new_fp"] is not None


def test_governance_noindex_detection(spark):
    from pyspark.sql import functions as F

    from gonova_document_parser_spark.functions.governance import robots_noindex_expr

    rows = [
        (1, '<meta name="robots" content="noindex, nofollow">'),
        (2, "<meta content='NOINDEX' name=robots>"),            # reversed attrs
        (3, '<META NAME=robots CONTENT="NOINDEX">'),            # caps, bare attrs
        (4, '<meta name="robots" content="index, follow">'),    # indexable
        (5, '<meta name="googlebot" content="noindex">'),       # wrong name attr
        (6, "<p>the robots noindex directive is a meta tag</p>"),  # prose mention
        (7, '<meta name="description" content="robots"><meta name="robots" content="all">'),
        (8, '<meta name="robots-extra" content="noindex-when-stale">'),  # wrong name token
        (9, '<meta name="robots" content="nonoindexable">'),              # substring, not token
        (10, '<meta name=robots><meta content="noindex" name=x>'),        # must not span tags
        (11, '<meta name="robots" content="noindex">'),                   # bare value
    ]
    df = spark.createDataFrame(rows, "id long, html_text string")
    got = {
        r["id"]: r["f"]
        for r in df.select("id", robots_noindex_expr().alias("f")).collect()
    }
    assert got == {
        1: True, 2: True, 3: True, 4: False, 5: False, 6: False, 7: False,
        8: False, 9: False, 10: False, 11: True,
    }


def test_governance_domain_blocklist_label_boundary(spark):
    from pyspark.sql import functions as F

    from gonova_document_parser_spark.functions.governance import domain_blocked_expr

    rows = [
        (1, "https://spam.example.net/x"),        # exact
        (2, "https://a.b.spam.example.net/x"),    # deep subdomain
        (3, "https://notspam.example.net/x"),     # label boundary: NOT blocked
        (4, "https://example.net/x"),             # parent of blocked: NOT blocked
        (5, "https://SPAM.Example.NET/x"),        # case-insensitive
        (6, "https://clean.example.com/x"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id", domain_blocked_expr(["spam.example.net"]).alias("b")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True, 6: False}


def test_pack_sequences_matches_python_prefix_sum(spark):
    """The distributed two-phase prefix sum must equal the sequential
    cumulative sum, at several range-partition counts (including more
    partitions than rows)."""
    import random

    from gonova_document_parser_spark.functions.sampling import pack_sequences

    rng = random.Random(7)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in range(137)]
    budget = 64
    acc, expect = 0, {}
    for i, t in docs:
        n = len(t.split())
        expect[i] = (n, acc, acc // budget)
        acc += n

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n_parts in (1, 4, 16, 300):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_offset"], r["chunk_id"])
            for r in pack_sequences(df, budget, n_partitions=n_parts).collect()
        }
        assert got == expect, f"n_partitions={n_parts} diverged"


def test_pack_sequences_append_stable(spark):
    """Appending docs with larger ids never moves existing docs between
    chunks (monotone ids extend the token stream at the end)."""
    from gonova_document_parser_spark.functions.sampling import pack_sequences

    base = [(i, "a b c d e") for i in range(50)]
    grown = base + [(i, "x y z") for i in range(50, 80)]
    a = {
        r["doc_id"]: (r["start_offset"], r["chunk_id"])
        for r in pack_sequences(
            spark.createDataFrame(base, "doc_id long, text string"), 32
        ).collect()
    }
    b = {
        r["doc_id"]: (r["start_offset"], r["chunk_id"])
        for r in pack_sequences(
            spark.createDataFrame(grown, "doc_id long, text string"), 32
        ).collect()
    }
    assert all(b[i] == a[i] for i in a)


def test_pack_sequences_with_bpe_counts_matches_python(spark):
    """count_expr seam: packing budgets denominated in merge-table BPE
    tokens (the real pipeline's unit) must equal a pure-Python replica
    that encodes each doc with the SAME spec encoder and cumulates
    sequentially.  The UDF variant is non-driver (the plan guard keeps
    BatchEvalPython out of driver queries); this pins the seam itself."""
    import os

    from gonova_document_parser_spark.functions.sampling import pack_sequences
    from gonova_document_parser_spark.functions.textstats import (
        bpe_token_count_udf,
    )
    from gonova_document_parser_spark.spec.bpe import encode, load_merges

    merges = load_merges(
        os.path.join(os.path.dirname(__file__), "fixtures", "bpe_merges.txt")
    )
    docs = [
        (0, "the running river was nothing like the sea"),
        (1, "she said that there is nothing running here"),
        (2, "a b c"),
        (3, "ing ing ing the the the"),
        (4, "completely unrelated words sprawl everywhere tonight"),
    ]
    budget = 16
    acc, expect = 0, {}
    for i, t in docs:
        n = len(encode(t, merges))
        expect[i] = (n, acc, acc // budget)
        acc += n

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["chunk_id"])
        for r in pack_sequences(
            df,
            budget,
            n_partitions=3,
            count_expr=bpe_token_count_udf(merges)("text"),
        ).collect()
    }
    assert got == expect


def test_remove_duplicated_spans_first_occurrence_survives(spark):
    """Pinned rule: the corpus-wide first occurrence (min (doc_id, pos))
    keeps its text verbatim; every other occurrence loses exactly the
    covered tokens, order preserved."""
    from gonova_document_parser_spark.functions.dedup import remove_duplicated_spans

    span = " ".join(f"w{i}" for i in range(10))
    d1 = f"{span} unique tail one"
    d2 = f"front part here {span} and more text"
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, window=10).collect()}
    assert out[1]["clean_text"] == d1
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "front part here and more text"
    assert out[2]["n_removed"] == 10 and out[2]["n_kept"] == 6


def test_remove_duplicated_spans_overlapping_windows_union(spark):
    """Two overlapping duplicated windows in one doc remove the UNION of
    their covered tokens, not double-count it."""
    from gonova_document_parser_spark.functions.dedup import remove_duplicated_spans

    run = " ".join(f"t{i}" for i in range(6))  # 6 shared tokens -> 3 windows of 4
    d1 = f"{run} alpha beta"
    d2 = f"x y {run} z"
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, window=4).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "x y z"
    assert out[2]["n_removed"] == 6


def test_remove_duplicated_spans_matches_python_reference(spark):
    """Seeded random corpus vs a pure-Python replica of the pinned rule."""
    import random

    from gonova_document_parser_spark.functions.dedup import remove_duplicated_spans

    rng = random.Random(4242)
    vocab = [f"v{i}" for i in range(12)]
    w = 4
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(w, 25))))
        for i in range(80)
    ]
    # python replica
    occs: dict[str, list[tuple[int, int]]] = {}
    toks = {i: t.split() for i, t in docs}
    for i, tk in toks.items():
        for p in range(len(tk) - w + 1):
            occs.setdefault(" ".join(tk[p : p + w]), []).append((i, p))
    expect = {}
    removed_at = {i: set() for i, _ in docs}
    for win, lst in occs.items():
        if len({d for d, _ in lst}) < 2:
            continue
        first = min(lst)
        for d, p in lst:
            if (d, p) != first:
                removed_at[d].update(range(p, p + w))
    for i, tk in toks.items():
        kept = [t for j, t in enumerate(tk) if j not in removed_at[i]]
        expect[i] = (" ".join(kept), len(kept), len(tk) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicated_spans(df, window=w).collect()
    }
    assert got == expect


def test_connected_components_matches_union_find_on_random_graph(spark):
    import random

    from gonova_document_parser_spark.functions.dedup import connected_components

    rng = random.Random(99)
    edges = sorted({(rng.randint(0, 59), rng.randint(0, 59)) for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(60))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    expect = {v: find(v) for v in touched}
    # canonical label = min node id in component
    comp_min = {}
    for v, r in expect.items():
        comp_min.setdefault(r, v)
        comp_min[r] = min(comp_min[r], v)
    expect = {v: comp_min[find(v)] for v in touched}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == expect
    # large-star/small-star must produce the identical labeling
    star = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, algorithm="star").collect()
    }
    assert star == expect


def test_connected_components_string_ids_converge(spark):
    """Regression for the label-sum convergence witness: string ids made
    sum(lbl) NULL, so the old witness compared None == None after round 1
    and exited with unconverged labels on any diameter-3+ component."""
    from gonova_document_parser_spark.functions.dedup import connected_components

    # a diameter-4 path of url-like string ids
    urls = [f"https://ex.com/p{i}" for i in range(5)]
    edges = [(urls[i], urls[i + 1]) for i in range(4)]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == {u: urls[0] for u in urls}


def test_large_small_star_path_graph_log_rounds(spark):
    """Kiveris et al. property: a planted 10k-node path converges in
    ~log-n rounds, not n — the adversarial-chain escalation min-label
    propagation can't handle (it would need 10k rounds)."""
    from gonova_document_parser_spark.functions.dedup import _cc_large_small_star

    n = 10_000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels, rounds = _cc_large_small_star(df, max_iter=60)
    assert rounds <= 40, f"path graph took {rounds} rounds — not log-n behavior"
    agg = labels.groupBy("cluster_id").count().collect()
    assert len(agg) == 1 and agg[0]["cluster_id"] == 0 and agg[0]["count"] == n


def test_domain_cap_quota_and_ranking(spark):
    from gonova_document_parser_spark.functions.sampling import domain_cap

    rows = [(i, "big" if i < 20 else "small", float(i % 7)) for i in range(26)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = domain_cap(df, 3, key_col="source", order_col="q").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["big"]) == 3
    assert len(by_src["small"]) == 3
    # highest q wins (q=6 at ids 6 and 13), then q=5 at id 5; ties break
    # by lowest doc_id
    assert sorted(by_src["big"]) == [5, 6, 13]
    assert sorted(by_src["small"]) == [20, 24, 25]


def test_domain_cap_salted_matches_single_window(spark):
    """The two-phase salted cap keeps the EXACT same rows as the naive
    one-window form, on a hot-key shape (one source holding ~50% of rows)
    and across salt counts — the byte-identity proof VERDICT r3 #2 asks
    for."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from gonova_document_parser_spark.functions.sampling import domain_cap

    rows = [
        (i, "hot.example" if i % 2 == 0 else f"s{i % 7}", float((i * 37) % 101))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")

    w = Window.partitionBy("source").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    naive = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 5)
        .drop("_rn")
    )
    expect = sorted(tuple(r) for r in naive.collect())
    # hot_threshold=10 forces hot.example (200 rows) down the salted
    # two-phase path; the default (250 here) keeps everything cold; 0
    # salts every key — the keeper set must be identical on every route,
    # including the auto per-key sqrt(H/k) sizing
    for n_salts in (1, 4, 16, "auto"):
        for hot_threshold in (None, 10, 0):
            got = sorted(
                tuple(r)
                for r in domain_cap(
                    df,
                    5,
                    key_col="source",
                    order_col="q",
                    n_salts=n_salts,
                    hot_threshold=hot_threshold,
                ).collect()
            )
            assert got == expect, (
                f"n_salts={n_salts} hot_threshold={hot_threshold} "
                "diverged from one-window cap"
            )


def test_domain_cap_plan_has_salted_partial_window(spark):
    """The executed plan must show (a) the phase-1 window keyed by
    (key, _salt) — the hot key's reduce-side input split across salt
    cells — and (b) WindowGroupLimit nodes on BOTH windows: Spark's
    InferWindowGroupLimit turns the row_number()<=k filter into a
    map-side partial top-k (measured 1.2M -> 113k shuffled records on
    the bench corpus); losing the pattern (e.g. by switching to rank
    computed post-hoc) would silently re-shuffle everything."""
    from gonova_document_parser_spark.functions.sampling import domain_cap

    rows = [(i, "hot", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    plan = (
        domain_cap(df, 3, key_col="source", order_col="q")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan  # phase-1 partial window partitions on (source, _salt)
    # Partial+Final per window, two windows
    assert plan.count("WindowGroupLimit") >= 4


def test_top_ngrams_plan_uses_topk_not_full_sort(spark):
    import __spark_entry__ as E

    df = E.queries()["top_ngrams"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # per-partition heap top-k
    rows = df.collect()
    assert len(rows) == 50
    assert all(rows[i]["n"] >= rows[i + 1]["n"] for i in range(len(rows) - 1))


def test_line_dedup_crlf_matches_lf(spark):
    from gonova_document_parser_spark.functions.lines import line_dedup

    banner = "accept all cookies now"
    docs = [(i, f"opener {i}\r\n{banner}") for i in range(4)]
    docs += [(10 + i, f"opener {10 + i}\n{banner}") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=5).collect()}
    # banner is hot across CRLF and LF docs combined (8 > 5) and dropped
    # from both; output is LF-normalized
    for i in list(range(4)) + list(range(10, 14)):
        assert out[i]["clean_text"] == f"opener {i}"
        assert out[i]["n_dropped"] == 1


def test_semantic_dedup_keep_first_within_cell(spark):
    """Smaller id wins inside a cell; cross-cell near-dups are missed by
    construction; a dup clique drops EVERYTHING but its smallest id even
    when a dropped vector is the only witness above tau for another."""
    from gonova_document_parser_spark.functions.similarity import semantic_dedup

    rows = [
        # cell 0: 1 and 2 are clones of 0 -> both dropped (1's witness 0
        # also covers 2 transitively via 0 itself; keep-first semantics)
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0]),
        # cell 0: orthogonal vector survives
        (3, 0, [0.0, 1.0, 0.0]),
        # cell 1: clone of id 0's vector, but DIFFERENT cell -> kept
        (4, 1, [1.0, 0.0, 0.0]),
        # cell 1: near-dup of 4 (cos ~0.9806 >= 0.95) -> dropped
        (5, 1, [1.0, 0.2, 0.0]),
        # cell 1: below tau vs both (cos(4,6)=0.7071) -> kept
        (6, 1, [1.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(df, tau=0.95).collect()}
    assert out == {0: True, 1: False, 2: False, 3: True, 4: True, 5: False, 6: True}


def test_semantic_dedup_verdict_independent_of_partitioning(spark):
    """The verdict is a pure function of the input: 1-partition and
    8-partition runs agree row for row."""
    from gonova_document_parser_spark.functions.similarity import semantic_dedup

    rows = [
        (i, i % 4, [float((i * 7 + j * 3) % 11) for j in range(8)])
        for i in range(64)
    ] + [(1000 + i, i % 4, [float((i * 7 + j * 3) % 11) for j in range(8)])
         for i in range(16)]  # planted same-cell clones of i<16
    df = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )
    one = sorted(
        (r["vec_id"], r["keep"])
        for r in semantic_dedup(df.coalesce(1), tau=0.95).collect()
    )
    many = sorted(
        (r["vec_id"], r["keep"])
        for r in semantic_dedup(df.repartition(8), tau=0.95).collect()
    )
    assert one == many
    kept = dict(one)
    for i in range(16):  # clone of vec i sits in i's cell -> dropped
        assert kept[1000 + i] is False and kept[i % 4 * 0 + i] is not None


def test_lm_perplexity_orders_fluent_below_noise(spark):
    """Docs made of reference bigrams must score lower nll than the same
    vocabulary scrambled, which must score lower than full OOV noise."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.functions.lm import lm_perplexity_scores

    ref = "the quick brown fox jumps over the lazy dog " * 5
    docs = [
        (0, ref),                                     # train (doc_id%10==0)
        (10, ref),                                    # train
        (1, "the quick brown fox jumps over the lazy dog"),   # fluent
        (2, "dog the over fox brown lazy jumps quick the"),   # scrambled
        (3, "zxq wvu tsr qpo nml kji hgf edc ba9"),           # OOV
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["nll"]
        for r in lm_perplexity_scores(df, F.col("doc_id") % 10 == 0).collect()
    }
    assert out[1] < out[2] < out[3]
    # train docs score their own data well below the scrambled doc (they
    # carry the cross-repeat "dog the" bigram, so they can sit a hair
    # above the pure-substring doc 1 — that ordering is not asserted)
    assert out[0] < out[2] and out[10] < out[2]


def test_lm_scoring_plan_broadcasts_model(spark):
    """The scored corpus must meet the model via broadcast joins — the
    per-doc explode never sort-merge-joins on token keys."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.functions.lm import lm_perplexity_scores

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = lm_perplexity_scores(df, F.col("doc_id") % 10 == 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_lm_shuffle_join_fallback_matches_broadcast(spark):
    """VERDICT r5 #3: broadcast_model=False (the at-scale path for
    few-GB CCNet models that would OOM a forced broadcast) must produce
    identical scores via plain token-key equi-joins."""
    import pyspark.sql.functions as F

    from gonova_document_parser_spark.functions.lm import lm_perplexity_scores

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i % 7} zeta") for i in range(60)],
        "doc_id long, text string",
    )
    train = F.col("doc_id") % 10 == 0
    via_bc = {
        (r["doc_id"], r["n_bigrams"], r["nll"])
        for r in lm_perplexity_scores(df, train).collect()
    }
    via_shuffle = {
        (r["doc_id"], r["n_bigrams"], r["nll"])
        for r in lm_perplexity_scores(df, train, broadcast_model=False).collect()
    }
    assert via_bc == via_shuffle and len(via_bc) == 60


def test_pack_sequences_null_ids_and_float_ids(spark):
    """Round-6 regression guards for the arithmetic-bucket prefix sum:
    NULL integral ids take bucket 0 (sorted first, like the range
    partitioner placed them), and float ids fall back to the sampled
    range path so NaN ordering semantics survive."""
    import math

    from pyspark.sql import functions as F

    from gonova_document_parser_spark.functions.sampling import pack_sequences

    rows = [(None, "a b c"), (5, "d e"), (1, "f g h i")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["start_offset"], r["n_tokens"])
           for r in pack_sequences(df, budget=4, n_partitions=4).collect()}
    # null sorts first: offsets follow null(3 tokens) -> 1(4) -> 5(2)
    assert out[None] == (0, 3) and out[1] == (3, 4) and out[5] == (7, 2)
    fdf = spark.createDataFrame(
        [(1.5, "a b"), (float("nan"), "c"), (0.5, "d e f")],
        "doc_id double, text string",
    )
    got = {("nan" if (r["doc_id"] != r["doc_id"]) else r["doc_id"]): r["start_offset"]
           for r in pack_sequences(fdf, budget=4, n_partitions=2).collect()}
    # Spark orders NaN greater than any double: 0.5 -> 1.5 -> NaN
    assert got[0.5] == 0 and got[1.5] == 3 and got["nan"] == 5
