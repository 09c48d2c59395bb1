# piecewise tfidf_neardup prefix profile at sf1
from pyspark.sql import Window
from spark_bestfit_spark.operators.dedup import word_shingles, ensure_parallelism
from spark_bestfit_spark.operators.textstats import tfidf_neardup_pairs, _tokens

id_col, text_col, prefix_size, shingle_k = "doc_id", "text", 4, 3
d1 = ensure_parallelism(docs1)
sh = d1.select(F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, shingle_k))).alias("_sh"))
sh_w = Window.partitionBy("_sh")
rank_w = Window.partitionBy(id_col).orderBy(F.col("_sdf").asc(), F.col("_sh"))
with_sdf = sh.withColumn("_sdf", F.count(F.lit(1)).over(sh_w))
idx = with_sdf.withColumn("_r", F.row_number().over(rank_w)).filter(F.col("_r") <= prefix_size).select("_sh", id_col)
t("sh explode only", lambda: noop(sh), 2)
t("with_sdf (count window)", lambda: noop(with_sdf), 2)
t("idx (count+rank windows)", lambda: noop(idx), 2)
toks = d1.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")).filter(F.col("tok") != "")
tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
t("tf groupBy", lambda: noop(tf), 2)
t("FULL operator count", lambda: tfidf_neardup_pairs(docs1, threshold=0.9, candidates="prefix").count(), 3)
