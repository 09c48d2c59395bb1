t("toks explode", lambda: noop(toks), 2)
t("tf groupBy", lambda: noop(tf), 2)
t("dfreq", lambda: noop(dfreq), 2)
s = plan(w)
import re
print("w plan joins:", re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", s))
print("w plan exchanges:", s.count("Exchange"))
# per_pair regroup + dot timing
melted = cand.select("id_a","id_b",F.explode(F.array("id_a","id_b")).alias(id_col))
per_pair = (melted.join(vecs, id_col).groupBy("id_a","id_b")
    .agg(F.collect_list(F.struct(F.col(id_col).alias("_m"), F.col("_vec"))).alias("_vv"))
    .filter(F.size("_vv") == 2))
t("per_pair regroup", lambda: noop(per_pair), 2)
pick = lambda side: F.filter("_vv", lambda e: e["_m"] == F.col(side))[0]["_vec"]
dot = F.aggregate(F.map_values(F.map_zip_with(F.col("_va"), F.col("_vb"),
    lambda k,x,y: F.when(x.isNotNull() & y.isNotNull(), x*y).otherwise(F.lit(0.0)))),
    F.lit(0.0), lambda acc,v: acc+v)
final = (per_pair.select("id_a","id_b",pick("id_a").alias("_va"),pick("id_b").alias("_vb"))
         .select("id_a","id_b",F.round(dot,6).alias("cosine")).filter(F.col("cosine") >= threshold))
t("final dot+filter", lambda: final.count(), 2)
