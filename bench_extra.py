#!/usr/bin/env python
"""Round-6 optimization harness — NOT the driver bench (bench.py is frozen).

Measures a chosen subset of queries with bench.py's exact methodology
(same session configs, System.gc between queries, TWO warm passes,
median-of-3 timed .count()), and optionally dumps .explain("formatted")
for each query to plans/r06/<name>_<tag>.txt so plan claims in
OPTIMIZATION_r06.md are reviewable.

Usage:
  python bench_extra.py --queries dsir_weights,minhash_lsh_pairs [--plans before]
  python bench_extra.py --iterative dedup_clusters,host_pagerank
  python bench_extra.py --steal-probe     # quiet-host check before recording

A pre-flight steal probe (--steal-probe, also run automatically before a
measurement pass) times a fixed single-core arithmetic loop and compares
it to the pinned quiet-host value; ratios > 1.3 mean the host is loud and
the pass should be re-run (VERDICT r5 #1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(REPO, "plans", "r06")

# pinned on this host with an idle box (median of 5); the probe is a pure
# python integer loop so it measures CPU steal, not Spark state
_QUIET_PROBE_SEC = float(os.environ.get("GONOVA_QUIET_PROBE_SEC", "0.62"))


def steal_probe() -> float:
    def one() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc = (acc + (i ^ (acc >> 3))) & 0xFFFFFFFFFFFF
        return time.perf_counter() - t0

    walls = sorted(one() for _ in range(5))
    return walls[2]


def _spark(master: str):
    sys.path.insert(0, REPO)
    from gonova_document_parser_spark.session import get_spark

    spark = get_spark(
        app_name="gonova-bench-extra",
        master=master,
        shuffle_partitions=2 * CPUS,
        configs={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "2m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _prod_variants() -> dict:
    import __spark_entry__ as E
    from gonova_document_parser_spark.functions.dedup import (
        minhash_lsh_candidates,
        simhash64,
    )

    return {
        "simhash_prod": lambda spark, sf: simhash64(
            E._docs(spark, sf), hash_fn="xxhash64"
        ),
        "minhash_lsh_prod": lambda spark, sf: minhash_lsh_candidates(
            E._docs(spark, sf), hash_fn="xxhash64"
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--iterative", default="")
    ap.add_argument("--plans", default="", help="tag: dump explain to plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="time with noop sink instead of count()")
    ap.add_argument("--steal-probe", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    probe = steal_probe()
    ratio = probe / _QUIET_PROBE_SEC
    if args.steal_probe:
        print(json.dumps({"probe_sec": round(probe, 3), "quiet_ratio": round(ratio, 2)}))
        return

    names = [n for n in args.queries.split(",") if n]
    iter_names = [n for n in args.iterative.split(",") if n]
    spark = _spark(f"local[{CPUS}]")
    import __spark_entry__ as E

    qs = {**E.queries(), **_prod_variants()}
    timings: dict[str, float] = {}
    for name in names + iter_names:
        fn = qs[name]
        if args.plans:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        spark.sparkContext._jvm.System.gc()

        def run():
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        warms = 2 if name not in iter_names else 1
        for _ in range(warms):
            run()
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            run()
            walls.append(time.time() - t0)
        timings[name] = round(sorted(walls)[len(walls) // 2], 3)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "quiet_ratio": round(ratio, 2),
                "timings": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
