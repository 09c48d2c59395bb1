# A/B: prefer shuffled-hash join + AQE SMJ->SHJ conversion
from spark_bestfit_spark.operators.linkage import set_similarity_join
spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
t("ss FULL shj", lambda: set_similarity_join(L, R, "ta","tb","id_l","id_r", 0.95).count(), 3)
# inter-only jaccard variant on the mirror
lv2 = lsets.select("id_l", F.col("_n").alias("_na"), F.col("_set").alias("_sa"))
rv2 = rsets.select("id_r", F.col("_n").alias("_nb"), F.col("_set").alias("_sb"))
inter2 = F.size(F.array_intersect("_sa","_sb")).cast("double")
ver2 = (cand.join(lv2, on="id_l").join(rv2, on="id_r")
    .withColumn("jaccard", F.round(inter2/(F.col("_na")+F.col("_nb")-inter2),6))
    .filter(F.col("jaccard") >= threshold).select("id_l","id_r","jaccard"))
t("ss verify inter-only (shj conf)", lambda: ver2.count(), 2)
spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
t("ss verify inter-only (smj conf)", lambda: ver2.count(), 2)
t("ss FULL smj again", lambda: set_similarity_join(L, R, "ta","tb","id_l","id_r", 0.95).count(), 2)
