import importlib
import spark_bestfit_spark.operators.linkage as L2
importlib.reload(L2)
t("ss FULL inter-only", lambda: L2.set_similarity_join(L, R, "ta","tb","id_l","id_r", 0.95).count(), 3)
