# A/B: word_shingles construction variants (must be string-identical)
k = 3
def ws_old(text_col, k=3):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle_at))).otherwise(
        F.array(F.concat_ws(" ", toks)))

def ws_new(text_col, k=3):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(k)])
    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle_at))).otherwise(
        F.array(F.concat_ws(" ", toks)))

sh_old = docs1.select("doc_id", F.explode(ws_old("text")).alias("_sh"))
sh_new = docs1.select("doc_id", F.explode(ws_new("text")).alias("_sh"))
t("sh OLD slice+concat_ws", lambda: noop(sh_old), 3)
t("sh NEW element_at concat", lambda: noop(sh_new), 3)
# identity check: full anti-join both ways must be 0
a = sh_old.groupBy("doc_id","_sh").count()
b = sh_new.groupBy("doc_id","_sh").count()
print("diff rows:", a.exceptAll(b).count() + b.exceptAll(a).count())
