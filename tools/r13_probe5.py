# verify-side profile of tfidf prefix mode at sf1
from pyspark.sql import Window
from spark_bestfit_spark.operators.dedup import word_shingles, ensure_parallelism
from spark_bestfit_spark.operators.textstats import _tokens

id_col, text_col, prefix_size, shingle_k, threshold, min_df = "doc_id", "text", 4, 3, 0.9, 1
d1 = ensure_parallelism(docs1)
toks = d1.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")).filter(F.col("tok") != "")
tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
n_docs = d1.agg(F.countDistinct(id_col).cast("double").alias("_n_docs"))
w = (tf.join(dfreq, "tok").crossJoin(F.broadcast(n_docs))
     .select(F.col(id_col), "tok", "df",
             (F.col("tf") * F.log((F.lit(1.0) + F.col("_n_docs")) / (F.col("df") + F.lit(1.0)))).alias("w")))
entries = w.groupBy(id_col).agg(F.collect_list(F.struct("tok", "df", "w")).alias("_l"))
norm = F.sqrt(F.aggregate("_l", F.lit(0.0), lambda a, e: a + e["w"] * e["w"]))
vecs = (entries.withColumn("_norm", norm).filter(F.col("_norm") > 0)
        .select(id_col, F.map_from_entries(F.transform(F.col("_l"),
            lambda e: F.struct(e["tok"].alias("tok"), (e["w"] / F.col("_norm")).alias("wn")))).alias("_vec")))
t("w relation", lambda: noop(w), 2)
t("vecs (maps)", lambda: noop(vecs), 2)
# candidates
sh = d1.select(F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, shingle_k))).alias("_sh"))
sh_w = Window.partitionBy("_sh"); rank_w = Window.partitionBy(id_col).orderBy(F.col("_sdf").asc(), F.col("_sh"))
idx = (sh.withColumn("_sdf", F.count(F.lit(1)).over(sh_w)).withColumn("_r", F.row_number().over(rank_w))
       .filter(F.col("_r") <= prefix_size).select("_sh", id_col))
psz_w = Window.partitionBy("_sh")
idx = idx.withColumn("_psz", F.count("*").over(psz_w)).filter(F.col("_psz") <= 1000).drop("_psz")
buckets = idx.groupBy("_sh").agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids")).filter(F.size("_ids") > 1)
n_ids = F.size("_ids")
pair_structs = F.flatten(F.transform("_ids", lambda x, i: F.transform(
    F.slice("_ids", i + 2, F.greatest(n_ids - i - 1, F.lit(0))),
    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
cand = (buckets.select(F.explode(pair_structs).alias("_p")).select(F.col("_p.id_a"), F.col("_p.id_b")).distinct())
t("cand pairs", lambda: noop(cand), 2)
print("cand count:", cand.count(), " vec count:", vecs.count())
