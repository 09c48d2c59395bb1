import importlib
import spark_bestfit_spark.operators.dedup as D
importlib.reload(D)
t("q_winnow_pairs NEW", lambda: D.winnow_neardup_pairs(docs, min_shared=20, max_bucket_size=200).count(), 3)
t("winnow_fingerprints NEW", lambda: D.winnow_fingerprints(docs).count(), 2)
