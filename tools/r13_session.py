"""Interactive probe session for r13 A/Bs: builds the bench's exact
inputs and exposes helpers. Run with python -i."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from spark_bestfit_spark import get_spark
from pyspark.sql import functions as F

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="r13-probe", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
sf_dir = "/root/testdata/sf0.1"
scale_dir = "/root/repo/.scale_cache/sf1"
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs1 = spark.read.parquet(f"{scale_dir}/documents.parquet")
cust01 = spark.read.parquet(f"{sf_dir}/customer.parquet")
cust1 = spark.read.parquet(f"{scale_dir}/customer.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
emb1 = spark.read.parquet(f"{scale_dir}/embeddings.parquet")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def t(label, fn, n=3):
    """Time fn() n times, print each wall + min."""
    walls = []
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{label}#{i}")
        t0 = time.perf_counter()
        r = fn()
        walls.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"[{label}] walls={[round(w,3) for w in walls]} min={min(walls):.3f} last_result={r if not hasattr(r,'collect') else ''}")
    return min(walls)

def plan(df, path=None):
    s = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted") if False else df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    if path:
        open(path, "w").write(s)
        print("wrote", path, "Exchanges:", s.count("Exchange"), "Scans:", s.count("Scan parquet"))
    return s
print("ready: spark, docs, docs1, cust01, cust1, emb, emb1, noop, t, plan")
