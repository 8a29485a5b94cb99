"""Round-13 additions #4: Poisson bootstrap and Cramér's V.

Bootstrap: CI brackets the true mean on a well-behaved fixture; the
weight distribution is Poisson(1)-shaped (mean weight ≈ 1, so n_eff ≈
n per replicate); determinism across partitionings.

Cramér's V: V == 0 on an exactly-independent product table; V == 1 on
a perfectly-dependent (copy) column; the completed-table discipline
(an empty cell raises association above the observed-cells-only
value).
"""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.dq import cramers_v
from cbts_datalake_synnex_spark.operators.sampling import poisson_bootstrap


def test_bootstrap_ci_brackets_mean_and_neff(spark):
    rows = [(i, float(100 + (i % 21) - 10)) for i in range(2000)]  # mean 100
    df = spark.createDataFrame(rows, "id long, v double")
    out = poisson_bootstrap(df, "id", "v", n_replicates=32).collect()
    assert len(out) == 32
    lo, hi = out[0]["ci_low"], out[0]["ci_high"]
    assert lo <= 100.0 <= hi
    # Poisson(1) weights: n_eff within 4*sqrt(n) of n for every replicate
    for r in out:
        assert abs(r["n_eff"] - 2000) < 4 * 2000 ** 0.5


def test_bootstrap_partitioning_invariant(spark):
    rows = [(i, float(i % 37)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = {
        r["replicate"]: r["boot_mean"]
        for r in poisson_bootstrap(df, "id", "v", n_replicates=8).collect()
    }
    b = {
        r["replicate"]: r["boot_mean"]
        for r in poisson_bootstrap(
            df.repartition(17), "id", "v", n_replicates=8
        ).collect()
    }
    assert a == b


def test_cramers_v_independent_product(spark):
    # exact product table: every (a,b) combo equally frequent -> V = 0
    rows = [(f"a{i % 3}", f"b{j % 4}") for i in range(3) for j in range(4)
            for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0
    assert r["association"] == "weak"


def test_cramers_v_perfect_dependence(spark):
    rows = [(f"k{i % 4}", f"k{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r["cramers_v"] == 1.0
    assert r["association"] == "strong"


def test_cramers_v_counts_empty_cells(spark):
    # diagonal-only support: strongly associated BECAUSE the off-
    # diagonal cells are empty — dropping them would report chi2 = 0
    rows = [("a", "p")] * 30 + [("b", "q")] * 30
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r["n_levels_a"] == 2 and r["n_levels_b"] == 2
    assert r["cramers_v"] == 1.0
