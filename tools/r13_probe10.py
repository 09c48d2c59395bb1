from spark_bestfit_spark.operators.linkage import fuzzy_join, _deletion1_keys
from spark_bestfit_spark.operators.dedup import ensure_parallelism
t("q_fuzzy_join_sf1 FULL", lambda: fuzzy_join(cust1, cust1, "c_name","c_name","c_custkey","c_custkey",1).filter("id_l < id_r").count(), 3)
# internals
left = ensure_parallelism(cust1)
right = left
index = (right.select(F.col("c_custkey").alias("id_r"), F.col("c_name").alias("_sr"))
    .filter(F.col("_sr").isNotNull())
    .select("id_r","_sr",F.explode(F.transform(_deletion1_keys(F.col("_sr")), lambda k: F.xxhash64(k))).alias("_h")))
probe_ = (left.select(F.col("c_custkey").alias("id_l"), F.col("c_name").alias("_sl"))
    .filter(F.col("_sl").isNotNull())
    .select("id_l","_sl",F.explode(F.transform(_deletion1_keys(F.col("_sl")), lambda k: F.xxhash64(k))).alias("_h")))
t("fj index keys", lambda: noop(index), 2)
joined = probe_.join(index, "_h")
print("fj rows:", cust1.count(), " keys:", index.count(), " joined candidates:", joined.count())
dist = F.levenshtein(F.col("_sl"), F.col("_sr"), 1)
ver_fj = joined.withColumn("dist", dist).filter(F.col("dist") >= 0).select("id_l","id_r",F.col("dist").cast("int").alias("dist"))
t("fj join+verify (no distinct)", lambda: noop(ver_fj), 2)
t("fj + distinct", lambda: ver_fj.distinct().count(), 2)
