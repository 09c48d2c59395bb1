from importlib import reload
import spark_bestfit_spark.operators.dedup as D
from spark_bestfit_spark.operators.dedup import clip_duplicate_spans, duplicate_spans
t("q_clip_spans_sf1 NEW", lambda: clip_duplicate_spans(docs1, n=8).agg(F.sum("n_removed")).first(), 3)
t("q_duplicate_spans_sf1 NEW", lambda: duplicate_spans(docs1).count(), 3)
from spark_bestfit_spark.operators.textstats import with_repetition_ratio
t("repetition_ratio NEW", lambda: noop(with_repetition_ratio(docs1)), 2)
