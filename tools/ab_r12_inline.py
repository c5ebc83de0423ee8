"""In-session interleaved A/B: retrieval lane gate + old-vs-new hdr/winsorized."""
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_processor_spark import get_spark, queries
import hive_processor_spark.operators.retrieval as R
from hive_processor_spark.sources.tables import load_table
from hive_processor_spark.functions.orderstat import with_global_order

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-inline", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
qs = queries()


def t(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# ---- old hdr (r11 shape): est lane scans orders; exact lane groupBy c (x3)
def old_hdr(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("c"))
    e = (F.length(F.bin(F.col("c"))) - 1).alias("e")
    bucketed = v.select(
        e,
        (F.expr("(c * 32) div (shiftleft(CAST(1 AS BIGINT), length(bin(c)) - 1))") - 32).alias("s"),
    )
    hist = bucketed.groupBy("e", "s").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cum = Window.orderBy("e", "s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("e", "s").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select("e", "s", F.sum("cnt").over(w_cum).alias("cc"), F.sum("cnt").over(w_all).alias("n"))
    _QS = [("0.5", 0.50), ("0.9", 0.90), ("0.99", 0.99), ("0.999", 0.999)]

    def _probe(df, val_col, out):
        one = df.agg(*[
            F.min(F.when(F.col("cc") >= F.ceil(F.lit(q) * F.col("n")).cast("long"), val_col)).alias(f"_p{i}")
            for i, (_, q) in enumerate(_QS)
        ])
        return one.select(
            F.explode(F.array(*[
                F.struct(F.lit(q).alias("q"), F.col(f"_p{i}").alias(out))
                for i, (_, q) in enumerate(_QS)
            ])).alias("_e")
        ).select("_e.q", f"_e.{out}")

    lo_bound = F.expr("shiftleft(CAST(1 AS BIGINT), e) + s * (shiftleft(CAST(1 AS BIGINT), e) div 32)")
    est = _probe(cum, lo_bound, "lo_bound")
    dc = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dn = dc.agg(F.sum("cnt").cast("long").alias("n"))
    dcc = with_global_order(dc, "c", cumsums={"cc": "cnt"}, bounds=(0.0, 1e8)).crossJoin(F.broadcast(dn))
    exact = _probe(dcc, F.col("c"), "exact_c")
    return (
        est.join(exact, "q")
        .select(
            F.col("q").alias("quantile"),
            F.round(F.col("lo_bound") / 100.0, 2).alias("hdr_estimate"),
            F.round(F.col("exact_c") / 100.0, 2).alias("exact_value"),
            F.round(F.abs(F.col("lo_bound") - F.col("exact_c").cast("double")) / F.col("exact_c"), 6).alias("rel_err"),
            F.lit(0.03125).alias("guaranteed_bound"),
        )
        .orderBy("quantile")
    )


# ---- old winsorized (r11 shape)
def old_winsorized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    nn = v.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def _th(col, bounds):
        grp = v.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        cum = (
            with_global_order(grp, col, cumsums={"cum": "c"}, bounds=bounds)
            .crossJoin(F.broadcast(nn))
            .select(col, "cum", F.col("n"), F.floor(0.1 * F.col("n")).cast("long").alias("g"))
        )
        return cum.agg(
            F.min(F.when(F.col("cum") >= F.col("g") + 1, F.col(col))).alias("lo"),
            F.min(F.when(F.col("cum") >= F.col("n") - F.col("g"), F.col(col))).alias("hi"),
        )

    xth = _th("x", (0.0, 2e7)).select(F.col("lo").alias("xlo"), F.col("hi").alias("xhi"))
    yth = _th("y", (0.0, 64.0)).select(F.col("lo").alias("ylo"), F.col("hi").alias("yhi"))
    clipped = v.crossJoin(F.broadcast(xth)).crossJoin(F.broadcast(yth)).select(
        F.greatest(F.col("xlo"), F.least(F.col("xhi"), F.col("x"))).alias("xw"),
        F.greatest(F.col("ylo"), F.least(F.col("yhi"), F.col("y"))).alias("yw"),
        "x", "y",
    )
    s = clipped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xw").cast("long").alias("sxw"),
        F.sum("yw").cast("long").alias("syw"),
        F.sum(F.col("xw").cast("decimal(38,0)") * F.col("xw")).alias("sxxw"),
        F.sum(F.col("yw") * F.col("yw")).cast("long").alias("syyw"),
        F.sum(F.col("xw") * F.col("yw")).cast("long").alias("sxyw"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n")

    def _r(sxy, sx, sy, sxx, syy):
        return (n.cast("double") * F.col(sxy) - F.col(sx).cast("double") * F.col(sy)) / F.sqrt(
            (n.cast("double") * F.col(sxx).cast("double") - F.col(sx).cast("double") * F.col(sx))
            * (n.cast("double") * F.col(syy) - F.col(sy).cast("double") * F.col(sy))
        )

    return s.select(
        n,
        F.round(_r("sxy", "sx", "sy", "sxx", "syy"), 6).alias("r_raw"),
        F.round(_r("sxyw", "sxw", "syw", "sxxw", "syyw"), 6).alias("r_winsorized"),
    )


def lane(mass):
    R._KERNEL_MIN_PAIRS = mass


REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

variants = {
    "hdr_old": lambda: old_hdr(spark, SF),
    "hdr_new": lambda: qs["agg_hdr_histogram"](spark, SF),
    "win_old": lambda: old_winsorized(spark, SF),
    "win_new": lambda: qs["stats_winsorized_correlation"](spark, SF),
}
for name, mk in variants.items():
    t(mk())  # warmup
res = {k: [] for k in variants}
for _ in range(REPS):
    for name, mk in variants.items():
        res[name].append(t(mk()))

BIG = 10**18
retr = ["sim_precision_at_k", "sim_mrr", "sim_map_at_k", "sim_ivf_recall_curve"]
for q in retr:
    lane(BIG); t(qs[q](spark, SF))
    lane(0); t(qs[q](spark, SF))  # warmups both lanes
for q in retr:
    for lbl, m in (("hof", BIG), ("kern", 0)):
        lane(m)
        res[f"{q}_{lbl}"] = []
for _ in range(REPS):
    for q in retr:
        for lbl, m in (("hof", BIG), ("kern", 0)):
            lane(m)
            res[f"{q}_{lbl}"].append(t(qs[q](spark, SF)))

for k, v in res.items():
    print(f"{k}: best={min(v):.3f} all=[{', '.join(f'{x:.3f}' for x in v)}]")
