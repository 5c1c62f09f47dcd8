"""Round-9 contracts: the Arrow PQ-assign kernel must be
bit-identical to the HOF form it replaced, and the half-up µ-unit
rounding helper must replay the engines' ROUND exactly."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.operators import similarity


def test_round_e6_half_up_matches_spark_round(spark):
    """_round_e6_i64 vs Spark's CAST(round(x*1e6) AS BIGINT) on a
    grid that includes exact halves, negatives, and irrational-ish
    quotients — the three places HALF_UP, banker's, and truncation
    disagree."""
    import numpy as np

    vals = (
        [k / 2e6 for k in range(-9, 10)]  # exact ±half µ-units
        + [x / 7e0 for x in range(-20, 21)]
        + [0.0, 1e-12, -1e-12, 0.1234565, -0.1234565]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    want = [
        r[0]
        for r in df.select(
            F.expr("CAST(round(x * 1e6) AS BIGINT)")
        ).collect()
    ]
    got = list(similarity._round_e6_i64(np.array(vals, dtype=np.float64)))
    assert got == want


def test_round_e6_exact_half_up_on_binary_value():
    """Round-9 ADVICE: the old ``floor(v + 0.5)`` emulation carries v
    over an integer boundary when v sits within half an ulp below x.5
    (JDK-8010430 class: floor(0.49999999999999994 + 0.5) == 1, but
    BigDecimal HALF_UP of that double's exact value is 0). The
    rewritten kernel must agree with decimal ROUND_HALF_UP on the
    double's EXACT binary expansion for every v = arr*1e6 — checked
    here on a dense grid around halves plus random magnitudes, with
    the decimal module as the independent oracle."""
    import decimal
    import random

    import numpy as np

    rng = random.Random(0x9E6)
    arrs = [k / 2e6 for k in range(-41, 42)]  # exact ±half µ-units
    arrs += [rng.uniform(-s, s) for s in (1e-6, 1e-3, 1.0, 1e6) for _ in range(200)]
    # ulp-neighbors of half-µ points: the boundary the old form broke on
    for k in range(-9, 10):
        base = np.float64(k / 2e6)
        arrs += [float(np.nextafter(base, -1)), float(np.nextafter(base, 1))]
    a = np.array(arrs, dtype=np.float64)
    got = similarity._round_e6_i64(a)
    for x, g in zip(a, got):
        # Decimal(float) is the double's EXACT binary expansion —
        # the same value BigDecimal(double) sees engine-side
        v = decimal.Decimal(float(np.float64(x) * 1e6))
        want = int(v.quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
        assert g == want, (float(x), float(np.float64(x) * 1e6), g, want)


def test_pq_assign_kernel_bit_identical_to_hof(spark, sf_dir):
    """The round-9 Arrow kernel replays the broadcast-join + window
    argmin exactly: same integer µ²-unit distance (integer addition
    is order-free), same (dist, cent_id) tiebreak. The nation_pagerank
    discipline — the replaced plan is rebuilt inline here and the two
    assignments compared key-by-key."""
    sub = similarity._subvectors(similarity._emb(spark, sf_dir))
    cb_rows = [
        (r.m, r.vec_id, r.sv)
        for r in sub.filter(F.col("vec_id") < similarity.PQ_K).collect()
    ]
    kernel = {
        (r.vec_id, r.m): (r.cent_id, r.dist)
        for r in similarity._pq_assign(sub, cb_rows).collect()
    }
    # the pre-round-9 plan, verbatim
    cb = spark.createDataFrame(
        cb_rows, "m INT, cent_id BIGINT, cvec ARRAY<DOUBLE>"
    )
    dist = F.expr(
        "aggregate(zip_with(sv, cvec,"
        " (x, c) -> CAST(round(x * 1e6) AS BIGINT)"
        " - CAST(round(c * 1e6) AS BIGINT)),"
        " 0L, (a, v) -> a + v * v)"
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "cent_id")
    hof = {
        (r.vec_id, r.m): (r.cent_id, r.dist)
        for r in (
            sub.join(F.broadcast(cb), "m")
            .withColumn("dist", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "m", "cent_id", "dist")
        ).collect()
    }
    assert kernel == hof
    assert len(kernel) > 0


def test_subvectors_kernel_bit_identical_to_hof(spark, sf_dir):
    """The round-9 Arrow _subvectors must replay the HOF
    normalize+slice plan bit-for-bit: same integer ssq, same
    (x·1e6)/sqrt(ssq) doubles, same PQ_M slices."""
    e = similarity._emb(spark, sf_dir)
    kernel = {
        (r.vec_id, r.m): tuple(r.sv)
        for r in similarity._subvectors(e).collect()
    }
    # the pre-round-9 plan, verbatim
    normed = (
        e.withColumn(
            "ssq",
            F.expr(
                "aggregate(vec, 0L, (a, x) ->"
                " a + CAST(round(x * 1e6) AS BIGINT)"
                " * CAST(round(x * 1e6) AS BIGINT))"
            ),
        )
        .filter(F.col("ssq") > 0)
        .withColumn(
            "nvec", F.expr("transform(vec, x -> x * 1e6 / sqrt(ssq))")
        )
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.expr(
                    f"slice(nvec, {m * similarity.PQ_SUBDIM + 1},"
                    f" {similarity.PQ_SUBDIM})"
                ).alias("sv"),
            )
            for m in range(similarity.PQ_M)
        ]
    )
    hof = {
        (r.vec_id, r.m): tuple(r.sv)
        for r in normed.select(
            "vec_id", F.explode(slices).alias("s")
        )
        .select("vec_id", "s.m", "s.sv")
        .collect()
    }
    assert kernel == hof
    assert len(kernel) > 0
