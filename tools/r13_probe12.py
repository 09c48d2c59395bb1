import importlib
import spark_bestfit_spark.operators.dedup as D
importlib.reload(D)
t("q_minhash_sf1 noCKPT", lambda: D.minhash_dedup_pairs(docs1, threshold=0.7).count(), 4)
t("q_neardup_clusters_sf1 noCKPT", lambda: D.neardup_clusters(D.minhash_dedup_pairs(docs1, threshold=0.7)).count(), 3)
t("q_minhash_dedup sf0.1 noCKPT", lambda: D.minhash_dedup_pairs(docs, threshold=0.7).count(), 3)
