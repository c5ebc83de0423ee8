"""Inverse standard-normal CDF (probit) as ENGINE-MIRRORED expressions.

Normal-scores rank tests (van der Waerden, Fligner–Killeen, rank-based
normalization in general) need Φ⁻¹ evaluated identically by Spark and by
the DuckDB oracle. Neither engine ships a probit, so both sides evaluate
the SAME rational approximation — Acklam's algorithm (P. J. Acklam,
"An algorithm for computing the inverse normal cumulative distribution
function", 2003; relative error < 1.15e-9 over (0,1)) — generated from
one coefficient table so the operation ORDER is character-identical:
:func:`norm_ppf` builds the Spark Column, :func:`sql_norm_ppf` the SQL
fragment. The only libm calls are LN and SQRT (the same exposure every
registered likelihood statistic carries); consumers quantize the scores
before any cross-row fold, so a last-ulp divergence cannot re-order a
sum — it can only move a single quantized unit, which the registered
tests round away.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Acklam coefficients (exact decimal literals, shared by both emitters).
_A = (
    "-3.969683028665376e+01", "2.209460984245205e+02",
    "-2.759285104469687e+02", "1.383577518672690e+02",
    "-3.066479806614716e+01", "2.506628277459239e+00",
)
_B = (
    "-5.447609879822406e+01", "1.615858368580409e+02",
    "-1.556989798598866e+02", "6.680131188771972e+01",
    "-1.328068155288572e+01",
)
_C = (
    "-7.784894002430293e-03", "-3.223964580411365e-01",
    "-2.400758277161838e+00", "-2.549732539343734e+00",
    "4.374664141464968e+00", "2.938163982698783e+00",
)
_D = (
    "7.784695709041462e-03", "3.224671290700398e-01",
    "2.445134137142996e+00", "3.754408661907416e+00",
)

_P_LOW = "0.02425"


def _horner(coeffs: tuple[str, ...], var: str) -> str:
    """((c0*v + c1)*v + c2)...  — explicit parens fix evaluation order."""
    expr = coeffs[0]
    for c in coeffs[1:]:
        expr = f"(({expr}) * ({var}) + {c})"
    return expr


def _sql_central(p: str) -> str:
    q = f"(({p}) - 0.5)"
    r = f"({q} * {q})"
    num = _horner(_A, r)
    den = f"({_horner(_B, r)} * ({r}) + 1.0)"
    return f"(({num}) * {q} / {den})"


def _sql_tail(q: str, sign: str) -> str:
    num = _horner(_C, q)
    den = f"({_horner(_D, q)} * ({q}) + 1.0)"
    return f"({sign}({num}) / {den})"


def sql_norm_ppf(p: str) -> str:
    """DuckDB fragment for Φ⁻¹(p), p an expression in (0, 1)."""
    low = _sql_tail(f"SQRT(-2.0 * LN({p}))", "")
    high = _sql_tail(f"SQRT(-2.0 * LN(1.0 - ({p})))", "-")
    return (
        f"(CASE WHEN ({p}) < {_P_LOW} THEN {low}"
        f" WHEN ({p}) <= 1.0 - {_P_LOW} THEN {_sql_central(p)}"
        f" ELSE {high} END)"
    )


def norm_ppf(p: Column) -> Column:
    """Spark Column for Φ⁻¹(p) — same Acklam evaluation order as the SQL
    emitter (Horner with explicit parentheses, same literals), so both
    engines produce identical doubles for identical inputs up to the
    last-ulp LN exposure (measured: 2 of 4099 dense-grid points differ
    by 1 ulp, both in a tail branch — tests/test_normdist.py)."""

    def horner(coeffs, var):
        expr = F.lit(float(coeffs[0]))
        for c in coeffs[1:]:
            expr = expr * var + float(c)
        return expr

    def tail(q, sign):
        num = horner(_C, q)
        den = horner(_D, q) * q + 1.0
        return sign * num / den

    qc = p - 0.5
    rc = qc * qc
    central = horner(_A, rc) * qc / (horner(_B, rc) * rc + 1.0)
    low = tail(F.sqrt(-2.0 * F.log(p)), F.lit(1.0))
    high = tail(F.sqrt(-2.0 * F.log(1.0 - p)), F.lit(-1.0))
    pl = float(_P_LOW)
    return (
        F.when(p < pl, low)
        .when(p <= 1.0 - pl, central)
        .otherwise(high)
    )


# Abramowitz–Stegun 7.1.26 erf coefficients (|error| < 1.5e-7), shared by
# both emitters of the FORWARD CDF Φ(z) = (1 + erf(z/√2))/2. Coarser than
# the Acklam probit above — fine for distance statistics that round at
# 1e-6, and deterministic because both engines evaluate the identical
# polynomial (the libm calls are EXP and SQRT).
_ERF_P = "0.3275911"
_ERF_A = (
    "0.254829592", "-0.284496736", "1.421413741",
    "-1.453152027", "1.061405429",
)


def sql_norm_cdf(z: str) -> str:
    """DuckDB fragment for Φ(z) via A&S 7.1.26 on |z|/√2, sign-folded."""
    x = f"(ABS({z}) / 1.4142135623730951)"
    t = f"(1.0 / (1.0 + {_ERF_P} * {x}))"
    poly = _horner(tuple(reversed(_ERF_A)), t)
    erf = f"(1.0 - ({poly}) * ({t}) * EXP(-({x}) * ({x})))"
    return (
        f"(CASE WHEN ({z}) >= 0 THEN (1.0 + {erf}) / 2.0"
        f" ELSE (1.0 - {erf}) / 2.0 END)"
    )


def norm_cdf(z: Column) -> Column:
    """Spark Column for Φ(z) — same A&S evaluation order as the SQL
    emitter (same Horner direction, same literals)."""
    x = F.abs(z) / 1.4142135623730951
    t = F.lit(1.0) / (1.0 + float(_ERF_P) * x)
    coeffs = tuple(reversed(_ERF_A))
    poly = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        poly = poly * t + float(c)
    erf = 1.0 - poly * t * F.exp(-x * x)
    return F.when(z >= 0, (1.0 + erf) / 2.0).otherwise((1.0 - erf) / 2.0)
