# set_similarity_join sf1 piecewise
from spark_bestfit_spark.operators.linkage import set_similarity_join
L = docs1.filter("doc_id % 10 != 0").selectExpr("doc_id AS id_l", "text AS ta")
R = docs1.filter("doc_id % 10 = 0").selectExpr("doc_id AS id_r", "text AS tb")
t("q_set_similarity_sf1 FULL", lambda: set_similarity_join(L, R, "ta","tb","id_l","id_r", 0.95).count(), 3)

# now the internals, mirrored
threshold = 0.95
def _toks(df, on, idc):
    return df.select(idc, F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col(on))), r"\s+"))).alias("_tok"))
lt = _toks(L, "ta", "id_l"); rt = _toks(R, "tb", "id_r")
tok_ids = (lt.select("_tok").unionByName(rt.select("_tok")).groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    .orderBy("_df","_tok").withColumn("_tid", F.monotonically_increasing_id()).select("_tok","_tid")
    .localCheckpoint(eager=False))
def _ordered_sets(toks, idc):
    return toks.join(tok_ids, on="_tok", how="inner").groupBy(idc).agg(
        F.array_sort(F.collect_list("_tid")).alias("_set"), F.count(F.lit(1)).cast("int").alias("_n"))
lsets = _ordered_sets(lt, "id_l"); rsets = _ordered_sets(rt, "id_r")
def _prefix(sets, idc):
    plen = F.col("_n") - F.ceil(F.lit(float(threshold)) * F.col("_n")).cast("int") + F.lit(1)
    return sets.select(idc, F.col("_n"), F.posexplode(F.slice("_set", 1, plen)).alias("_p","_tid"))
lpre = _prefix(lsets,"id_l").withColumnRenamed("_n","_nl").withColumnRenamed("_p","_pl")
rpre = _prefix(rsets,"id_r").withColumnRenamed("_n","_nr").withColumnRenamed("_p","_pr")
tt = float(threshold)
alpha = F.ceil((F.lit(tt) * (F.col("_nl") + F.col("_nr"))) / F.lit(1.0 + tt) - F.lit(1e-9))
ubound = F.lit(1) + F.least(F.col("_nl")-F.col("_pl")-F.lit(1), F.col("_nr")-F.col("_pr")-F.lit(1))
cand = (lpre.join(rpre, on="_tid", how="inner")
    .filter((F.col("_nr") >= F.ceil(F.lit(tt)*F.col("_nl"))) & (F.col("_nr")*F.lit(tt) <= F.col("_nl")) & (ubound >= alpha))
    .select("id_l","id_r").distinct())
t("ss lsets+rsets", lambda: (noop(lsets), noop(rsets)), 2)
t("ss cand", lambda: noop(cand), 2)
print("ss cand count:", cand.count())
lv = lsets.select("id_l", F.col("_set").alias("_sa")); rv = rsets.select("id_r", F.col("_set").alias("_sb"))
inter = F.size(F.array_intersect("_sa","_sb")).cast("double"); union = F.size(F.array_union("_sa","_sb")).cast("double")
ver = (cand.join(lv, on="id_l").join(rv, on="id_r").withColumn("jaccard", F.round(inter/union,6))
    .filter(F.col("jaccard") >= threshold).select("id_l","id_r","jaccard"))
t("ss verify full", lambda: ver.count(), 2)
