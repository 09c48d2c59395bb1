# identity check: with_repetition_ratio old vs new
import importlib, spark_bestfit_spark.operators.textstats as T
importlib.reload(T)
toks = T._tokens(F.col("text")); kk = 3
idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - kk, F.lit(0)))
old_sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, kk)))
old_ratio = F.when(F.size(toks) < kk, F.lit(0.0)).otherwise(
    1.0 - F.size(F.array_distinct(old_sh)) / F.size(old_sh).cast("double"))
a = docs1.select("doc_id", F.round(old_ratio, 6).alias("r"))
b = T.with_repetition_ratio(docs1).select("doc_id", F.col("dup_shingle_ratio").alias("r"))
print("repratio diff:", a.exceptAll(b).count() + b.exceptAll(a).count())
