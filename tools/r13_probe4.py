from spark_bestfit_spark.operators.textstats import tfidf_neardup_pairs
from spark_bestfit_spark.operators.dedup import minhash_dedup_pairs, neardup_clusters
from spark_bestfit_spark.operators.curation import decontaminate_fuzzy
t("q_tfidf_neardup_sf1", lambda: tfidf_neardup_pairs(docs1, threshold=0.9, candidates="prefix").count(), 3)
t("q_minhash_sf1", lambda: minhash_dedup_pairs(docs1, threshold=0.7).count(), 3)
t("q_fuzzy_decontam_sf1", lambda: decontaminate_fuzzy(docs1.filter("doc_id % 10 != 0"), docs1.filter("doc_id % 10 = 0"), threshold=0.7).count(), 3)
t("q_neardup_clusters_sf1", lambda: neardup_clusters(minhash_dedup_pairs(docs1, threshold=0.7)).count(), 3)
