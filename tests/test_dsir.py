"""DSIR hashed-n-gram importance resampling on hand-built corpora."""

import hashlib
import math
import re

import pyspark.sql.functions as F

from gonova_document_parser_spark.functions.dsir import (
    dsir_resample,
    hashed_ngram_features,
    importance_weights,
)

# target rows (id < 3) read like documentation; raw noise rows do not
CORPUS = [
    (0, "the spark engine shuffles data across the cluster during a join"),
    (1, "the spark optimizer prunes columns and pushes filters to the scan"),
    (2, "a spark job splits into stages and the stages into tasks"),
    (3, "the spark scheduler runs the stages of a job across the cluster"),
    (4, "buy cheap pills now best price discount casino bonus click"),
    (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
]
def _target():
    return F.col("doc_id") < 3
B = 512


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _py_feats(text: str) -> list[str]:
    ws = [w for w in re.split(r"\s+", text.lower().strip()) if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_bucket(f: str) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B


def test_target_like_docs_score_higher(spark):
    w = {
        r["doc_id"]: r["logw"]
        for r in importance_weights(_df(spark), _target(), n_buckets=B).collect()
    }
    assert len(w) == len(CORPUS)
    # doc 3 shares the target's vocabulary; 4 and 5 share almost none
    assert w[3] > w[4]
    assert w[3] > w[5]


def test_affine_matches_python_replica(spark):
    from collections import Counter

    ct, cr = Counter(), Counter()
    for doc_id, text in CORPUS:
        bs = [_py_bucket(f) for f in _py_feats(text)]
        cr.update(bs)
        if doc_id < 3:
            ct.update(bs)
    n_t, n_r = sum(ct.values()), sum(cr.values())
    dt, dr = n_t + 1.0 * B, n_r + 1.0 * B
    expected = {}
    for doc_id, text in CORPUS:
        lw = sum(
            math.log((ct.get(b, 0) + 1.0) / dt) - math.log((cr[b] + 1.0) / dr)
            for b in (_py_bucket(f) for f in _py_feats(text))
        )
        expected[doc_id] = round(lw, 4)
    got = {
        r["doc_id"]: round(r["logw"], 4)
        for r in importance_weights(
            _df(spark), _target(), n_buckets=B, hash_fn="affine"
        ).collect()
    }
    assert got == expected


def test_resample_is_deterministic_topk(spark):
    a = dsir_resample(_df(spark), _target(), k=3, n_buckets=B).collect()
    b = dsir_resample(_df(spark), _target(), k=3, n_buckets=B).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 3
    assert {r["doc_id"] for r in a} <= {d for d, _ in CORPUS}


def test_scoring_plan_broadcasts_ratio_table(spark):
    plan = (
        importance_weights(_df(spark), _target(), n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
