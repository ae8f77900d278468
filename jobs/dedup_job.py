"""spark-submit entrypoint: incremental minhash dedup against a store.

Usage:
  spark-submit --py-files gonova.zip jobs/dedup_job.py \
      <delta_docs_parquet> <store_path> \
      [--id-col doc_id] [--text-col text] [--hash xxhash64|md5|affine] \
      [--ngram 3] [--hashes 32] [--bands 8]

Each invocation treats its input parquet as ONE crawl delta: load the
band store accumulated under ``store_path``, dedup the delta against it
(and within itself), commit the delta's verdicts and its kept documents'
band rows.  Re-invoking after a kill -9 — or with the same input twice —
is idempotent: delta identity is a content digest, commits are
per-delta-directory overwrites gated on ``_SUCCESS``, and bands are
re-derivable from committed verdicts (see
gonova_document_parser_spark/dedup_store.py for the resume matrix).

Prints one summary JSON line:
  {"snapshot": ..., "n_delta": N, "kept": N, "dup_of_store": N,
   "dup_in_delta": N, "resumed": "full"|"bands-only"|"noop"}
"""

from __future__ import annotations

import json
import sys

from gonova_document_parser_spark.dedup_store import run_delta_dedup
from gonova_document_parser_spark.session import get_spark


def main(argv: list[str]) -> None:
    def opt(flag: str, default: str) -> str:
        if flag in argv:
            i = argv.index(flag)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    id_col = opt("--id-col", "doc_id")
    text_col = opt("--text-col", "text")
    hash_fn = opt("--hash", "xxhash64")
    n = int(opt("--ngram", "3"))
    num_hashes = int(opt("--hashes", "32"))
    bands = int(opt("--bands", "8"))
    source, store = argv[0], argv[1]
    spark = get_spark(app_name="gonova-dedup")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(source).select(id_col, text_col)
    summary = run_delta_dedup(
        spark,
        docs,
        store,
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        hash_fn=hash_fn,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
