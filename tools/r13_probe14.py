from spark_bestfit_spark.operators.dedup import ensure_parallelism, portable_hash64, _normalized, winnow_neardup_pairs
k, window = 8, 4
dd = ensure_parallelism(docs)
norm = _normalized("text")
# OLD: norm inline in the expr (per-element re-eval risk)
kgs_old = F.when(F.length(norm) >= k, F.expr(
    f"transform(sequence(1, length(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) - {k} + 1),"
    f" i -> substring(regexp_replace(lower(trim(text)), '\\\\s+', ' '), i, {k}))")).otherwise(F.array(norm))
old_hs = dd.select("doc_id", F.transform(kgs_old, lambda g: portable_hash64(g)).alias("_hs"))
# NEW: normalized text bound once as a column
dn = dd.select(F.col("doc_id"), norm.alias("_nt"))
kgs_new = F.when(F.length("_nt") >= k, F.expr(
    f"transform(sequence(1, length(_nt) - {k} + 1), i -> substring(_nt, i, {k}))")).otherwise(F.array(F.col("_nt")))
new_hs = dn.select("doc_id", F.transform(kgs_new, lambda g: portable_hash64(g)).alias("_hs"))
t("winnow hs OLD", lambda: noop(old_hs), 3)
t("winnow hs NEW", lambda: noop(new_hs), 3)
a = old_hs.select("doc_id", F.explode("_hs").alias("h")).groupBy("doc_id","h").count()
b = new_hs.select("doc_id", F.explode("_hs").alias("h")).groupBy("doc_id","h").count()
print("winnow diff:", a.exceptAll(b).count() + b.exceptAll(a).count())
t("q_winnow_pairs FULL current", lambda: winnow_neardup_pairs(docs).count(), 3)
