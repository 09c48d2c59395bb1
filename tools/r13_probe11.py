# PROTOTYPE: fuzzy_join deletion1 on DISTINCT strings + id expansion
lu = left.select(F.col("c_name").alias("_sl")).filter(F.col("_sl").isNotNull()).distinct()
ru = lu  # self-join: same relation
print("distinct names:", lu.count())
iu = ru.select(F.col("_sl").alias("_sr")).select("_sr", F.explode(F.transform(_deletion1_keys(F.col("_sr")), lambda kk: F.xxhash64(kk))).alias("_h"))
pu = lu.select("_sl", F.explode(F.transform(_deletion1_keys(F.col("_sl")), lambda kk: F.xxhash64(kk))).alias("_h"))
cand_u = pu.join(iu, "_h")
print("uniq candidates:", cand_u.count())
dist = F.levenshtein(F.col("_sl"), F.col("_sr"), 1)
spairs = (cand_u.withColumn("dist", dist).filter(F.col("dist") >= 0)
          .select("_sl","_sr",F.col("dist").cast("int").alias("dist")).distinct())
lnames = left.select(F.col("c_custkey").alias("id_l"), F.col("c_name").alias("_sl")).filter(F.col("_sl").isNotNull())
rnames = left.select(F.col("c_custkey").alias("id_r"), F.col("c_name").alias("_sr")).filter(F.col("_sr").isNotNull())
out = (spairs.join(lnames, "_sl").join(rnames, "_sr").select("id_l","id_r","dist"))
t("fj UNIQ full", lambda: out.filter("id_l < id_r").count(), 3)
# equivalence vs old output
old = fuzzy_join(cust1, cust1, "c_name","c_name","c_custkey","c_custkey",1).filter("id_l < id_r")
new = out.filter("id_l < id_r")
print("equiv diff:", old.exceptAll(new).count() + new.exceptAll(old).count())
