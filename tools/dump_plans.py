"""Regenerate PLANS.md — physical-plan audit of the headline operators.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from spark_bestfit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.cpu_count() or 4
    spark = get_spark(
        app_name="dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    from spark_bestfit_spark.operators.dedup import minhash_dedup_pairs
    from spark_bestfit_spark.operators.histogram import histogram_df
    from spark_bestfit_spark.operators.similarity import self_topk
    from spark_bestfit_spark.operators.stats import column_stats, valid_column

    sections = []

    st = column_stats(li, "l_extendedprice")
    edges = np.linspace(st["min"], st["max"] * (1 + 1e-10), 51)
    sections.append((
        "keystone histogram (A4) — histogram_df(lineitem.l_extendedprice, "
        "50 bins)",
        "The engine's hottest aggregate. What to look for: a single-column\n"
        "`ReadSchema` (column pruning reached the parquet scan), two\n"
        "`HashAggregate` nodes around one bins-sized `Exchange` (map-side "
        "partial\naggregation — the shuffle carries <=50 rows per map task, "
        "never data\nrows), and `WholeStageCodegen` spans covering the bucket "
        "arithmetic.\nAt 100 TB the scan parallelism scales with input splits "
        "while the\nshuffle stays O(bins x tasks).",
        explain_str(histogram_df(li, "l_extendedprice", edges)),
    ))

    vdf = valid_column(li, "l_extendedprice").agg(
        F.min("l_extendedprice"),
        F.max("l_extendedprice"),
        F.count("l_extendedprice"),
    )
    sections.append((
        "stats scan (A1/P6) — valid_column + single-pass min/max/count",
        "NaN/inf/null cleaning is expressed as a Catalyst filter, so it "
        "shows\nup in `PushedFilters` at the scan and the `ReadSchema` "
        "carries exactly\none column. One job, no shuffle beyond the final "
        "1-row aggregate.",
        explain_str(vdf),
    ))

    sections.append((
        "MinHash -> LSH -> verified Jaccard (dedup) — minhash_dedup_pairs",
        "Candidate generation is a groupBy on (band, bucket-hash) — no\n"
        "self-join of the corpus, so there is no O(n^2) term anywhere in "
        "the\nplan. The exact-Jaccard verification joins shingle arrays onto "
        "the\ncandidate pair relation only. At 100 TB the quadratic work is "
        "confined\ninside buckets (bounded by max_bucket_size); everything "
        "else is one\nscan plus candidate-sized joins.",
        explain_str(minhash_dedup_pairs(docs, threshold=0.7)),
    ))

    sections.append((
        "ANN exact baseline — self_topk(embeddings, k=5, 5 queries)",
        "The query side is broadcast (the 5 query vectors, never the "
        "corpus);\ndot products run as JVM higher-order functions inside "
        "codegen, no\nPython in the loop. The corpus is scanned once; "
        "per-query top-k is a\nWindow over the scored relation. The scale "
        "path for large query sets is\nlsh_topk/ivf_topk (bucketed "
        "candidates), also in the driver contract.",
        explain_str(self_topk(emb, k=5, query_ids=[0, 1, 2, 3, 4])),
    ))

    from spark_bestfit_spark.operators.stats import two_sample_ks_df

    ks = two_sample_ks_df(
        li.filter("l_returnflag = 'A'"),
        li.filter("l_returnflag = 'N'"),
        "l_quantity",
        exact=True,
    )
    sections.append((
        "exact two-sample K-S — two_sample_ks_df(A vs N, exact=True)",
        "The EXACT D statistic with no global sort: per-value ECDF jumps\n"
        "(groupBy v, map-side combine), equi-width value buckets, exclusive\n"
        "bucket offsets broadcast back, and ONE hash-partitioned Window\n"
        "(partitionBy bucket) for the local prefix sums. What to look for:\n"
        "the Window's input Exchange is `hashpartitioning(bk, ...)` — never\n"
        "`SinglePartition` — and the only SinglePartition exchange in the\n"
        "plan is the final one-row max aggregate. At 100 TB both relations\n"
        "stream through hash exchanges sized by |distinct v| per bucket.",
        explain_str(ks),
    ))

    import __spark_entry__ as entry_mod

    from spark_bestfit_spark.operators.asof import asof_join

    ev = entry_mod._read(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    sections.append((
        "as-of join (events) — asof_join(views, clicks, by=user_id)",
        "Implemented as union + window carry-forward: one shuffle on the "
        "`by`\nkey, one sort within partitions — never a "
        "broadcast-nested-loop\ninequality join. At 100 TB this is the "
        "textbook shape: cost is one\nexchange of both inputs on user_id.",
        explain_str(asof_join(views, clicks, time_col="ts", by=["user_id"])),
    ))

    from spark_bestfit_spark.operators.curation import temperature_sample
    from spark_bestfit_spark.operators.dedup import duplicated_ngram_stats

    sections.append((
        "temperature sampling (domain mixture) — temperature_sample(docs)",
        "The per-domain rate relation comes from one groupBy on the "
        "domain\nkey (the shuffle carries one row per domain), normalizes "
        "inside the\nplan over that tiny aggregate, and is broadcast back "
        "into a map-side\njoin — look for `BroadcastExchange` feeding a "
        "`BroadcastHashJoin` on\nthe corpus side. The keep predicate is "
        "pure integer arithmetic in\ncodegen. At 100 TB the corpus is "
        "scanned once with no wide exchange.",
        explain_str(temperature_sample(docs)),
    ))

    sections.append((
        "cross-doc repeated n-grams — duplicated_ngram_stats(docs, n=8)",
        "Substring-dedup candidate phase. One explode scan feeds a "
        "groupBy\non the gram key with map-side partial counts (shingles "
        "are distinct\nper doc, so count(*) IS the distinct-doc count); the "
        "small surviving\nduplicated-gram set semi-joins back on the same "
        "gram key, then one\ngroupBy on doc_id. What to look for: no join "
        "without an equi-key, no\nbroadcast of the big side, no cartesian "
        "anywhere — the same\nmap-reduce shape the published suffix-array "
        "pipelines use.",
        explain_str(duplicated_ngram_stats(docs, n=8)),
    ))

    from spark_bestfit_spark.operators.textstats import bm25_topk

    sections.append((
        "BM25 top-k — bm25_topk(docs, 3 terms, k=10)",
        "Text retrieval with NO full-corpus join: the document length\n"
        "rides the exploded token stream (folded into the tf aggregate via\n"
        "`first(dl)`), so the only relations crossing an Exchange are the\n"
        "term-matched rows. What to look for: every `Join` in the plan is a\n"
        "`BroadcastHashJoin`/`BroadcastNestedLoopJoin` (the <=|query|-row\n"
        "idf relation and the 1-row corpus stats) — no SortMergeJoin, no\n"
        "ShuffledHashJoin anywhere. At 100 TB the corpus is scanned once\n"
        "and the shuffles carry a handful of rows per matching document.",
        explain_str(bm25_topk(docs, ["data", "model", "training"], k=10)),
    ))

    from spark_bestfit_spark.operators.curation import chunk_documents

    sections.append((
        "document chunking — chunk_documents(docs, 512, overlap=64)",
        "Within-document context windows: `sequence` + higher-order\n"
        "`filter` + `posexplode` + `slice`, all JVM column work. What to\n"
        "look for: ZERO Exchange nodes and no Python evaluator anywhere —\n"
        "the operator is a pure map over the scan, so at 100 TB it\n"
        "parallelizes with input splits and writes partition-local output.",
        explain_str(chunk_documents(docs, 512, overlap=64)),
    ))

    from spark_bestfit_spark.operators.stats import grouped_robust_stats_df

    sections.append((
        "grouped robust stats — grouped_robust_stats_df(lineitem, "
        "l_extendedprice, l_returnflag)",
        "Per-group median/MAD/IQR gates: one grouped percentile\n"
        "aggregation, then the G-row medians relation rejoins the cleaned\n"
        "corpus by BROADCAST for the MAD pass. What to look for: every\n"
        "Join is a BroadcastHashJoin (medians + final G-row combine) —\n"
        "no SortMergeJoin, no per-row wide relation crossing an Exchange.",
        explain_str(
            grouped_robust_stats_df(li, "l_extendedprice", "l_returnflag")
        ),
    ))

    from spark_bestfit_spark.operators.stats import psi_by_group

    sections.append((
        "per-group PSI drift — psi_by_group(F vs O lineitem, by "
        "returnflag)",
        "Per-segment drift, fully in-plan. What to look for: the\n"
        "per-group [lo, width] relation reaches BOTH corpus scans via\n"
        "BroadcastHashJoin; the only SortMergeJoin is the full-outer\n"
        "combine of the two (group, bin)-sized aggregates (Spark has no\n"
        "broadcast full-outer) — bins-bounded rows, never corpus-sized —\n"
        "and the per-group totals ride a Window on the partitioning that\n"
        "join just produced. No driver collect anywhere.",
        explain_str(
            psi_by_group(
                li.filter("l_linestatus = 'F'"),
                li.filter("l_linestatus = 'O'"),
                "l_extendedprice",
                "l_returnflag",
            )
        ),
    ))

    from spark_bestfit_spark.operators.stats import two_sample_ks_by_group

    sections.append((
        "per-group exact K-S — two_sample_ks_by_group(F vs O, by "
        "returnflag)",
        "The grouped prefix-sum spine with NO driver action: per-group\n"
        "bounds arrive by BroadcastExchange, the exclusive bucket offsets\n"
        "come from a Window over (group)-hash-partitioned bucket totals,\n"
        "and the cumsum Window is hash-partitioned on (group, bucket).\n"
        "What to look for: no SinglePartition exchange anywhere except\n"
        "nothing — every Window input is `hashpartitioning(g, ...)` and\n"
        "the scan-side relations only cross value/bucket hash exchanges.",
        explain_str(
            two_sample_ks_by_group(
                li.filter("l_linestatus = 'F'"),
                li.filter("l_linestatus = 'O'"),
                "l_quantity",
                "l_returnflag",
            )
        ),
    ))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write(
            "# PLANS — physical-plan audit of the headline operators\n\n"
            f'`df.explain("formatted")` output captured at sf0.1 on '
            f"local[{cpus}], with\ncommentary on what makes each plan "
            "survive a 100x scale-up. The\nfit fan-out itself (mapInPandas "
            "over LPT-packed kernel bins) is audited\nin operators/fit.py's "
            "module docstring and COVERAGE.md — its plan is a\nconstant-size "
            "Range + single ArrowEval (one bin per range partition,\nbin "
            "contents broadcast), independent of table size.\n\n"
        )
        for title, comment, plan in sections:
            f.write(f"## {title}\n\n{comment}\n\n```\n{plan.strip()}\n```\n\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
