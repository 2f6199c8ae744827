"""TPC-H q2/q11/q20 shapes over a DERIVED partsupp table.

The driver fixtures ship no partsupp, which is the only reason these three
shapes were missing from the sweep (plans/tpch_shapes.py covers the other
19). Rather than leave the plan families untested, partsupp is derived
deterministically from part × supplier with pure integer arithmetic that
both engines replay identically:

    ps_suppkey   = (p_partkey * N_PS_SUPP + i) % n_supp  for i in 0..N_PS_SUPP-1
    ps_availqty  = (p_partkey*31 + ps_suppkey*17) % 9999 + 1
    ps_cents     = (p_partkey*13 + ps_suppkey*7) % 100000 + 100
    ps_supplycost = ps_cents / 100.0   (one IEEE division — bit-identical)

Four suppliers per part (consecutive residues mod n_supp, distinct for
n_supp >= 4), quantities and costs integer-derived, so every float either
engine sees comes from the same integer by the same single operation —
exact oracle parity with no rounding traps. q11's share threshold is kept
fully integer (value_cents * N > total_cents) for the same reason.

Plan families these add (the classic reasons the queries exist):
- q2: per-group scalar MIN subquery feeding an equality filter
  (decorrelated into aggregate + join), under a 5-table dim chain.
- q11: group aggregate filtered against a global aggregate of itself
  (HAVING share-of-total — the broadcast-1-row-total pattern).
- q20: nested semi-join chain (suppliers ⟕ parts ⟕ shipped volume) with a
  per-(part,supplier) scalar subquery threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

N_PS_SUPP = 4  # suppliers per part

# Every occurrence of the supplier count/multiplier derives from N_PS_SUPP
# so the Spark derivation and the oracle CTE can never drift apart.
_PS_SQL = f"""
    ns AS (SELECT count(*) AS n_supp FROM supplier),
    ps AS (
      SELECT p.p_partkey AS ps_partkey,
             CAST((p.p_partkey * {N_PS_SUPP} + t.i) % ns.n_supp AS BIGINT) AS ps_suppkey,
             CAST((p.p_partkey * 31 + ((p.p_partkey * {N_PS_SUPP} + t.i) % ns.n_supp) * 17) % 9999 + 1
                  AS BIGINT) AS ps_availqty,
             CAST((p.p_partkey * 13 + ((p.p_partkey * {N_PS_SUPP} + t.i) % ns.n_supp) * 7) % 100000 + 100
                  AS BIGINT) AS ps_cents
      FROM part p CROSS JOIN ns, unnest([{", ".join(str(i) for i in range(N_PS_SUPP))}]) AS t(i)
    )
"""


def derive_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_cents) derived
    from part × a broadcast 1-row supplier count — map-side explode, no
    shuffle; at any scale this is a projection over the part scan."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    ns = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    i = F.explode(F.array(*[F.lit(x) for x in range(N_PS_SUPP)])).alias("i")
    base = part.crossJoin(F.broadcast(ns)).select("p_partkey", "n_supp", i)
    suppkey = (F.col("p_partkey") * N_PS_SUPP + F.col("i")) % F.col("n_supp")
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.cast("long").alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + suppkey * 17) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        ((F.col("p_partkey") * 13 + suppkey * 7) % 100000 + 100)
        .cast("long")
        .alias("ps_cents"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL},
    regional AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_cents / 100.0 AS cost,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT r.s_acctbal, r.s_name, r.n_name, r.ps_partkey AS p_partkey,
           p.p_type, round(r.cost, 2) AS supplycost
    FROM regional r
    JOIN part p ON p.p_partkey = r.ps_partkey
    WHERE p.p_size = 15
      AND r.cost = (SELECT min(r2.cost) FROM regional r2
                    WHERE r2.ps_partkey = r.ps_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the ASIA supplier(s) offering
    the regional minimum supply cost — a correlated scalar-MIN subquery
    Catalyst decorrelates into (groupBy min) ⋈ equality. Cost doubles are
    the same single integer division in both engines, so the MIN equality
    never ULP-splits.

    At 100 TB: region/nation broadcast; the min-cost aggregate and the
    equality join co-partition on ps_partkey."""
    ps = derive_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    # Prune partsupp to the selected parts BEFORE the supplier joins and
    # the min aggregate: the per-part regional minimum doesn't depend on
    # other parts, so this is result-identical while shrinking every
    # downstream operator by the part filter's selectivity (the oracle
    # computes the unpruned form — results provably equal).
    ps = ps.join(
        F.broadcast(p.select("p_partkey")), ps.ps_partkey == F.col("p_partkey")
    ).drop("p_partkey")
    regional = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_cents") / 100.0).alias("cost"),
            "s_name",
            "s_acctbal",
            "n_name",
        )
    )
    min_cost = regional.groupBy("ps_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        regional.join(min_cost, "ps_partkey")
        .where(F.col("cost") == F.col("min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_type",
            F.round("cost", 2).alias("supplycost"),
        )
    )


Q11_FRACTION_DENOM = 200  # keep part groups holding > 1/200 of total value


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_SQL},
    national AS (
      SELECT ps.ps_partkey, ps.ps_cents, ps.ps_availqty
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    grouped AS (
      SELECT ps_partkey, CAST(sum(ps_cents * ps_availqty) AS BIGINT) AS value_cents
      FROM national GROUP BY ps_partkey
    ),
    tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM grouped)
    SELECT g.ps_partkey, round(g.value_cents / 100.0, 2) AS stock_value
    FROM grouped g CROSS JOIN tot
    WHERE g.value_cents * {Q11_FRACTION_DENOM} > tot.total_cents
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value within one nation's
    suppliers, keeping parts whose value exceeds 1/N of the national
    total — a group aggregate HAVING-filtered against a global aggregate
    of itself. The share test stays ALL-INTEGER (value_cents * N >
    total_cents): no float threshold can ULP-flip row membership.

    At 100 TB: nation filter broadcasts; one groupBy(ps_partkey) with
    map-side partials; the grand total is a broadcast 1-row cross join."""
    ps = derive_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    grouped = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cents") * F.col("ps_availqty")).alias("value_cents"))
    )
    tot = grouped.agg(F.sum("value_cents").alias("total_cents"))
    return (
        grouped.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * Q11_FRACTION_DENOM > F.col("total_cents"))
        .select(
            "ps_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("stock_value"),
        )
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PS_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * sh.qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    WHERE n.n_regionkey = 2
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region holding excess stock of
    'red' parts — availqty above half the 1996 shipped volume for that
    (part, supplier). A semi-join chain where the inner threshold is a
    per-(part,supplier) scalar aggregate. Quantities are integral doubles,
    so 0.5*sum is exact and the comparison cannot ULP-flip.

    At 100 TB: shipped volume is one (partkey, suppkey) groupBy with
    partials; the 'red' part filter broadcasts; the final supplier join
    is a semi join on the deduped excess set."""
    ps = derive_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    red = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    excess = (
        ps.join(
            F.broadcast(red.select("p_partkey")),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey)
        .select("s_suppkey", "s_name", "n_name")
    )
