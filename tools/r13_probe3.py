# variant C: k-1 zip_with passes over shifted slices
def ws_zip(text_col, k=3):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    m = n - k + 1  # number of shingles when n >= k
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array(F.concat_ws(" ", toks)))

sh_zip = docs1.select("doc_id", F.explode(ws_zip("text")).alias("_sh"))
t("sh ZIP shifted slices", lambda: noop(sh_zip), 3)
a = sh_old.groupBy("doc_id","_sh").count()
c = sh_zip.groupBy("doc_id","_sh").count()
print("diff rows zip:", a.exceptAll(c).count() + c.exceptAll(a).count())
# also split-only baseline to see the floor
sp = docs1.select("doc_id", F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n"))
t("split only floor", lambda: noop(sp), 3)
