"""Quickstart: fit distributions to a column, inspect, generate.

Run from the repo root:  python examples/quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_bestfit_spark import (
    DistributionFitter,
    GaussianCopula,
    get_spark,
)
from spark_bestfit_spark.operators.generate import sample_best_fit

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # 1. fit the library to one column
    results = DistributionFitter(spark).fit(
        lineitem, column="l_extendedprice"
    )
    print(f"\n{results.count()} successful fits")
    best = results.best(3, metric="ks_statistic")
    for r in best:
        print(f"  {r.distribution:15s} ks={r.ks_statistic:.4f} "
              f"aic={r.aic:.1f}")

    # 2. interrogate the winner
    winner = best[0]
    print("\nwinner params:", dict(zip(winner.get_param_names(),
                                       winner.parameters)))
    ci = winner.confidence_intervals(spark, n_resamples=200)
    print("bootstrap CIs:", {k: tuple(round(x, 3) for x in v)
                             for k, v in ci.items()})

    # 3. generate synthetic data from the fit (distributed)
    synthetic = sample_best_fit(spark, winner, 100_000, num_partitions=8)
    synthetic.summary("mean", "stddev", "min", "max").show()

    # 4. correlated synthetic data across columns via the copula
    multi = DistributionFitter(spark).fit(
        lineitem, columns=["l_extendedprice", "l_quantity"],
        max_distributions=12,
    )
    copula = GaussianCopula.fit(multi, lineitem)
    copula.sample_distributed(spark, 100_000).show(5)

    # 5. re-include excluded-set distributions (slow/specialist kernels
    # kept out of the default 91, exactly like the reference registry)
    from spark_bestfit_spark.functions.distributions.registry import (
        DistributionRegistry,
    )

    reg = DistributionRegistry(custom_exclusions=set())
    specialist = DistributionFitter(spark, registry=reg).fit(
        lineitem, column="l_extendedprice",
        distributions=["mielke", "recipinvgauss", "exponpow", "gamma"],
    )
    print("\nspecialist fits (re-included excluded-set kernels):")
    specialist.df.select("distribution", "sse", "aic").show()

    # 6. per-GROUP fitting: one stats pass, one histogram scan, one
    # sample pass, one fan-out — job count constant in #groups
    grouped = DistributionFitter(spark).fit_grouped(
        lineitem, "l_extendedprice", "l_returnflag", max_distributions=8
    )
    print("best fit per return flag:")
    for label, rows in sorted(
        grouped.best_per_column(n=1, metric="aic").items()
    ):
        print(f"  {label}: {rows[0].distribution}")
    spark.stop()


if __name__ == "__main__":
    main()
