import importlib
import spark_bestfit_spark.operators.dedup as D
importlib.reload(D)
t("clusters WITHCKPT redo", lambda: D.neardup_clusters(D.minhash_dedup_pairs(docs1, threshold=0.7)).count(), 3)
t("minhash WITHCKPT redo", lambda: D.minhash_dedup_pairs(docs1, threshold=0.7).count(), 3)
