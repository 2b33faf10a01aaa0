"""Relational query surface over the TPC-H-ish star schema.

Covers the full join / aggregation / window / set-op / restructuring
inventory from SURVEY.md §2.3–§2.7 (the reference itself only ever runs
one anti-join; the rest is the analytics surface it exists to feed —
SURVEY.md §0 item 2).

Oracle-parity conventions (see plans.__init__):

- **Money in scaled integers.** A double SUM is order-dependent in its
  last bits, and Spark and DuckDB will sum in different orders; a rounded
  double can still flip at an exact decimal boundary. Prices/discounts/
  taxes in the corpus are exact 2-dp decimals, so ``CAST(ROUND(x*100) AS
  BIGINT)`` recovers the exact integer cents; all arithmetic then happens
  in int64 where every engine agrees bit-for-bit. Columns carry a suffix
  stating the unit: ``_c`` = cents (1e-2), ``_c4`` = 1e-4 units, ``_c6`` =
  1e-6 units.
- **Averages as one division of agreed integers** — a single IEEE op on
  identical inputs is identical everywhere.
- **Raw columns pass through untouched** (both engines read the same
  parquet bytes).
- **Every ORDER BY under a LIMIT has a unique tiebreaker key.**
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.merge import insert_if_absent
from ..sources.tables import load_table
from . import QueryRegistry

REGISTRY = QueryRegistry()


def cents(col: str | Column) -> Column:
    """Exact integer cents from a 2-dp double (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


# SQL twin of :func:`cents`.
def _cents_sql(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan → filter → hash agg.
# Catalyst plans a partial+final HashAggregate with the shipdate predicate
# pushed into the parquet scan; no join, one shuffle on the 6-row key space.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)          AS sum_qty,
      CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT)     AS sum_base_price_c,
      CAST(SUM({_cents_sql('l_extendedprice')}
             * {_cents_sql('1 - l_discount')}) AS BIGINT)      AS sum_disc_price_c4,
      CAST(SUM({_cents_sql('l_extendedprice')}
             * {_cents_sql('1 - l_discount')}
             * {_cents_sql('1 + l_tax')}) AS BIGINT)           AS sum_charge_c6,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)      AS avg_qty,
      CAST(SUM({_cents_sql('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price_c,
      CAST(SUM({_cents_sql('l_discount')}) AS DOUBLE) / COUNT(*)      AS avg_disc_c,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price_c4 = cents("l_extendedprice") * cents(1 - F.col("l_discount"))
    charge_c6 = disc_price_c4 * cents(1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(cents("l_extendedprice")).alias("sum_base_price_c"),
        F.sum(disc_price_c4).alias("sum_disc_price_c4"),
        F.sum(charge_c6).alias("sum_charge_c6"),
        (
            F.sum(F.col("l_quantity").cast("long")).cast("double") / F.count("*")
        ).alias("avg_qty"),
        (F.sum(cents("l_extendedprice")).cast("double") / F.count("*")).alias(
            "avg_price_c"
        ),
        (F.sum(cents("l_discount")).cast("double") / F.count("*")).alias("avg_disc_c"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority (TPC-H Q3 shape): 3-way equi-join → agg → top-k.
# customer is filtered to 1/5 before joining (Catalyst pushes the segment
# predicate below the join); AQE broadcasts the filtered build sides when
# runtime stats allow, else sort-merge on the shuffle keys.
# --------------------------------------------------------------------------
_REVENUE_SQL = (
    f"CAST(SUM({_cents_sql('l_extendedprice')} * {_cents_sql('1 - l_discount')}) "
    "AS BIGINT)"
)


@REGISTRY.register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      {_REVENUE_SQL} AS revenue_c4,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_c4 DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    revenue_c4 = cents("l_extendedprice") * cents(1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_c4).alias("revenue_c4"))
        .select(
            "l_orderkey",
            "revenue_c4",
            # ISO string, not DateType: date objects round-trip differently
            # through Spark-pandas vs DuckDB-pandas and can hash-mismatch.
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume (TPC-H Q5 shape): 6-way join with a
# co-location condition (c_nationkey = s_nationkey) → agg by nation.
# region/nation are fixed-cardinality dims → explicit broadcast() hints;
# the big lineitem⋈orders⋈customer chain stays shuffle-partitioned.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REVENUE_SQL} AS revenue_c4
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    revenue_c4 = cents("l_extendedprice") * cents(1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_c4).alias("revenue_c4"))
    )


# --------------------------------------------------------------------------
# Top-k, both shapes in one relation (SURVEY.md §2.6): per-group via
# row_number over a partition (the scalable idiom — no global sort, one
# shuffle on the group key), and global via orderBy+limit (Spark plans
# TakeOrderedAndProject: each partition keeps N, the driver merges).
# `scope` = segment name for the per-group rows, '_global' for the top-20.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment AS scope, o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rn <= 5
    UNION ALL
    SELECT '_global' AS scope, o_orderkey, o_custkey, price_c,
           CAST(ROW_NUMBER() OVER (ORDER BY price_c DESC, o_orderkey)
                AS INTEGER) AS rn
    FROM (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders
      ORDER BY price_c DESC, o_orderkey
      LIMIT 20
    )
    """,
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    per_segment = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("scope"),
            "o_orderkey",
            "o_custkey",
            cents("o_totalprice").alias("price_c"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )
    # the post-limit window runs on 20 rows — a single trivial partition,
    # not a global sort of the table (that happened in TakeOrderedAndProject)
    top20 = (
        orders.select(
            "o_orderkey", "o_custkey", cents("o_totalprice").alias("price_c")
        )
        .orderBy(F.col("price_c").desc(), F.col("o_orderkey"))
        .limit(20)
    )
    global_topn = top20.select(
        F.lit("_global").alias("scope"),
        "o_orderkey",
        "o_custkey",
        "price_c",
        F.row_number()
        .over(Window.orderBy(F.col("price_c").desc(), F.col("o_orderkey")))
        .alias("rn"),
    )
    return per_segment.unionByName(global_topn)


def order_history_window_base(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The original running-sum/lag/row_number relation (round-2 shape),
    kept standalone so bench.py keeps timing it round-over-round (the
    DIRECT-map convention) while the registry slot below carries the
    round-5 RANGE-frame and ranking columns too."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_epoch_s"),
        cents("o_totalprice").alias("price_c"),
        F.sum(cents("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_spend_c"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.row_number().over(w).alias("order_seq"),
    )



# --------------------------------------------------------------------------
# Window: running aggregate + lag (SURVEY.md §2.5) per customer order
# history. Running sums accumulate in integer cents so frame-order
# summation is exact on both engines.
#
# Round 5: RANGE (value-based) frames join the slot — trailing-30-day
# spend/count per customer, the time-windowed rolling aggregate every
# activity dashboard needs. RANGE differs from ROWS exactly where it
# matters: same-day peer orders all land in each other's frame, and the
# window spans calendar distance, not row count. Ordered by integer
# epoch DAYS (both engines), frame = 29 PRECEDING .. CURRENT ROW; sums
# stay in integer cents so peer-order summation is exact. Same single
# hashpartitioning(o_custkey) exchange serves every window in the
# relation — adding the RANGE frames costs zero extra shuffles (two
# sort specs share one cluster key).
#
# Also round 5, the rest of the ranking family: RANK/DENSE_RANK over a
# tie-BEARING order (o_orderdate alone — same-day orders tie, which is
# the whole point; both functions are deterministic under ties, unlike
# row_number), NTILE(4) over the total order, and PERCENT_RANK /
# CUME_DIST re-derived as integer basis points from (seq, n) with floor
# division — the engine-native functions return doubles whose rounding
# convention differs at .5 between engines, the integer formula cannot.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "customer_order_history_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch_s,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_spend_c,
           LAG(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_orderkey,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS INTEGER) AS order_seq,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT) // 86400
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing30_spend_c,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT) // 86400
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing30_n,
           CAST(RANK() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
           ) AS INTEGER) AS date_rank,
           CAST(DENSE_RANK() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
           ) AS INTEGER) AS date_dense_rank,
           CAST(NTILE(4) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS INTEGER) AS quartile,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY o_custkey) > 1
                THEN ((ROW_NUMBER() OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) - 1) * 10000)
                     // (COUNT(*) OVER (PARTITION BY o_custkey) - 1)
                ELSE 0 END AS BIGINT) AS pr_bp,
           CAST((ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) * 10000)
                // COUNT(*) OVER (PARTITION BY o_custkey)
             AS BIGINT) AS cd_bp
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
)
def customer_order_history_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    wp = Window.partitionBy("o_custkey")
    day = F.expr("unix_timestamp(o_orderdate) div 86400")
    w30 = (
        Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-29, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_epoch_s"),
        cents("o_totalprice").alias("price_c"),
        F.sum(cents("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_spend_c"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.row_number().over(w).alias("order_seq"),
        F.sum(cents("o_totalprice")).over(w30).alias("trailing30_spend_c"),
        F.count(F.lit(1)).over(w30).alias("trailing30_n"),
        F.rank().over(wd).cast("int").alias("date_rank"),
        F.dense_rank().over(wd).cast("int").alias("date_dense_rank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        # row_number() is INT; widen BEFORE the basis-point multiply or
        # a partition past 214,748 rows overflows int32 under ANSI —
        # found by the 30x adversarial-skew run (hot customer with
        # ~1.35M orders; DuckDB's ROW_NUMBER is BIGINT so only the
        # Spark side tripped).
        F.when(
            F.count(F.lit(1)).over(wp) > 1,
            F.expr(
                "((cast(row_number() over (partition by o_custkey "
                "order by o_orderdate, o_orderkey) as bigint) - 1) "
                "* 10000) div "
                "(count(1) over (partition by o_custkey) - 1)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pr_bp"),
        F.expr(
            "(cast(row_number() over (partition by o_custkey "
            "order by o_orderdate, o_orderkey) as bigint) * 10000) div "
            "count(1) over (partition by o_custkey)"
        )
        .cast("long")
        .alias("cd_bp"),
    )


# --------------------------------------------------------------------------
# Rollup (SURVEY.md §2.4 note): hierarchical totals region → nation.
# --------------------------------------------------------------------------
# Driver-slot composite: ROLLUP (customers by geography) and CUBE
# (orders by status × priority) share a slot via a tagged union on an
# aligned (scope, g1, g2, f1, f2, n, measure_c) schema. grouping()
# flags (f1/f2) distinguish subtotal NULLs from data NULLs on both
# sides; the cube side carries a NULL money measure.
@REGISTRY.register(
    "rollup_cube_grouping",
    oracle="""
    SELECT 'customer_geo_rollup' AS scope, r_name AS g1, n_name AS g2,
           CAST(GROUPING(r_name) AS INTEGER) AS f1,
           CAST(GROUPING(n_name) AS INTEGER) AS f2,
           COUNT(c_custkey) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS measure_c
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'order_status_cube' AS scope, o_orderstatus AS g1,
           o_orderpriority AS g2,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS f1,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS f2,
           COUNT(*) AS n,
           CAST(NULL AS BIGINT) AS measure_c
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    -- explicit GROUPING SETS (round 5): the two marginal breakdowns
    -- WITHOUT the cross terms or grand total a CUBE would compute —
    -- the dashboard shape (one query, several independent groupings,
    -- one scan)
    SELECT 'order_marginals_sets', o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER),
           CAST(GROUPING(o_orderpriority) AS INTEGER),
           COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def rollup_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    geo = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("f1"),
            F.grouping("n_name").cast("int").alias("f2"),
            F.count("c_custkey").alias("n"),
            F.sum(cents("c_acctbal")).alias("measure_c"),
        )
        .select(
            F.lit("customer_geo_rollup").alias("scope"),
            F.col("r_name").alias("g1"),
            F.col("n_name").alias("g2"),
            "f1",
            "f2",
            "n",
            "measure_c",
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    status = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("f1"),
            F.grouping("o_orderpriority").cast("int").alias("f2"),
            F.count("*").alias("n"),
        )
        .select(
            F.lit("order_status_cube").alias("scope"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "f1",
            "f2",
            "n",
            F.lit(None).cast("long").alias("measure_c"),
        )
    )
    # explicit GROUPING SETS (Spark 4 DataFrame API): the two marginal
    # breakdowns only — no cross terms, no grand total
    marginals = (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("f1"),
            F.grouping("o_orderpriority").cast("int").alias("f2"),
            F.count("*").alias("n"),
            F.sum(cents("o_totalprice")).alias("measure_c"),
        )
        .select(
            F.lit("order_marginals_sets").alias("scope"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "f1",
            "f2",
            "n",
            "measure_c",
        )
    )
    return geo.unionByName(status).unionByName(marginals)


# --------------------------------------------------------------------------
# Set operations + semi/anti joins (SURVEY.md §2.7, §2.3) in one tagged
# relation over a unified (op, key, name) schema: repeat customers via
# INTERSECT, churned via EXCEPT (name NULL — set ops carry keys only),
# the reference's J1 anti-join shape, and its semi dual. Spark plans all
# four as aggregates/joins — no custom code.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "set_ops_semi_anti",
    oracle="""
    SELECT 'intersect' AS op, CAST(o_custkey AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS name
    FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT 'except' AS op, CAST(o_custkey AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS name
    FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT 'semi' AS op, CAST(p_partkey AS BIGINT) AS key, p_name AS name
    FROM part
    WHERE p_size <= 5
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    UNION ALL
    SELECT 'anti' AS op, CAST(c_custkey AS BIGINT) AS key, c_name AS name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def set_ops_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    def tagged(df: DataFrame, op: str, key: str, name=None) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.col(key).cast("long").alias("key"),
            (F.col(name) if name else F.lit(None).cast("string")).alias(
                "name"
            ),
        )

    repeat = tagged(year(1995).intersect(year(1996)), "intersect", "o_custkey")
    churned = tagged(year(1995).subtract(year(1996)), "except", "o_custkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    li = load_table(spark, sf_dir, "lineitem")
    semi = tagged(
        part.join(li, part.p_partkey == li.l_partkey, "left_semi"),
        "semi",
        "p_partkey",
        "p_name",
    )
    cust = load_table(spark, sf_dir, "customer")
    anti = tagged(
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti"),
        "anti",
        "c_custkey",
        "c_name",
    )
    return repeat.unionByName(churned).unionByName(semi).unionByName(anti)


# --------------------------------------------------------------------------
# Incremental merge (the reference's core semantics, SURVEY.md §2.3 J1 /
# §2.4 A5 / §2.7 U1-U2) demonstrated on the corpus: an "existing" sink and
# an overlapping "incoming" batch; existing rows must win.
# --------------------------------------------------------------------------
@REGISTRY.register(
    "merge_insert_if_absent",
    oracle="""
    WITH existing AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, 'sink' AS src
      FROM orders WHERE o_orderkey % 3 = 0
    ), incoming AS (
      SELECT o_orderkey, o_custkey, 'overwrite-attempt' AS o_orderstatus,
             'batch' AS src
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT * FROM existing
    UNION ALL
    SELECT i.* FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = i.o_orderkey)
    """,
)
def merge_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated through the BLOOM-pruned two-phase path
    (operators.bloom.insert_if_absent_bloom, sharded bitmap): rows the
    filter rules out bypass the anti-join, the "maybe" sliver takes the
    exact path — and the result is row-for-row identical to the plain
    operator (no false negatives), which is precisely what the
    unchanged plain-SQL oracle verifies."""
    from ..operators.bloom import (
        build_bloom,
        insert_if_absent_bloom,
        optimal_params,
    )

    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.lit("sink").alias("src")
    )
    incoming = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("overwrite-attempt").alias("o_orderstatus"),
        F.lit("batch").alias("src"),
    )
    m, k = optimal_params(existing.count())
    m = ((m + 64 * 4 - 1) // (64 * 4)) * (64 * 4)  # divisible by 4 shards
    bloom = build_bloom(existing, "o_orderkey", m, k, shards=4)
    return insert_if_absent_bloom(
        existing, incoming, keys=["o_orderkey"], bloom=bloom
    )
