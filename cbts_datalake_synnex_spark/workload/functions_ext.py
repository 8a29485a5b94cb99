"""Second scalar-function sweep + native event-time window twins.

Deepens SURVEY §2.7 (stats/bitwise/interval/array-aggregate/string
families the first pass left implicit) and adds batch twins for the
§2.8 T4 sliding/session windows using Spark's *native*
``F.window``/``F.session_window`` operators (the streaming goldens in
``tests/test_streaming.py`` exercise the same operators under
watermarks; these entries give them driver-checkable oracles).

All are pure projections or single-shuffle aggregates — nothing here
adds an exchange beyond the groupBy key, so every query is
100 TB-shaped by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.workload.base import load_table, query


# ----------------------------------------------------------------------
# §2.7 math/stats family — the bivariate/statistical aggregates the
# first-pass f_math_funcs (moments only) skipped. All are single-pass
# mergeable aggregates (partial+final hash agg, one shuffle on the
# 3-value group key).
@query(
    "f_stats_funcs",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
           round(covar_pop(l_quantity, l_extendedprice), 4)   AS qty_price_covp,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS qty_price_covs,
           round(var_pop(l_quantity), 6)                      AS qty_varp,
           round(var_samp(l_quantity), 6)                     AS qty_vars,
           round(stddev_pop(l_quantity), 6)                   AS qty_stdp,
           round(regr_slope(l_extendedprice, l_quantity), 4)  AS price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_intercept
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="SURVEY §2.7 math/stats — corr/covar/variance/regression aggregates; "
    "all mergeable single-pass (partial+final), one shuffle on l_returnflag.",
)
def f_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covs"),
        F.round(F.var_pop("l_quantity"), 6).alias("qty_varp"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_vars"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stdp"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("price_intercept"),
    )


# ----------------------------------------------------------------------
# §2.7 bitwise family — scalar shifts/masks/popcount feeding the
# bit_and/bit_or/bit_xor aggregates. Sums are wrapped CAST AS BIGINT on
# the oracle side because DuckDB widens sum(BIGINT) to HUGEINT.
@query(
    "f_bitwise_funcs",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey & 255)                          AS key_and,
           bit_or(o_orderkey & 255)                           AS key_or,
           bit_xor(o_orderkey & 255)                          AS key_xor,
           CAST(sum(bit_count(CAST(o_orderkey AS BIGINT))) AS BIGINT) AS total_bits,
           CAST(sum(o_orderkey << 2) AS BIGINT)               AS lshift_sum,
           CAST(sum(o_orderkey >> 2) AS BIGINT)               AS rshift_sum
    FROM orders GROUP BY o_orderpriority
    """,
    doc="SURVEY §2.7 bitwise — &/shiftleft/shiftright/bit_count scalars + "
    "bit_and/bit_or/bit_xor aggregates, one shuffle on priority.",
)
def f_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(F.expr("o_orderkey & 255")).alias("key_and"),
        F.bit_or(F.expr("o_orderkey & 255")).alias("key_or"),
        F.bit_xor(F.expr("o_orderkey & 255")).alias("key_xor"),
        F.sum(F.bit_count("o_orderkey").cast("bigint")).cast("bigint").alias("total_bits"),
        F.sum(F.shiftleft(F.col("o_orderkey"), 2)).cast("bigint").alias("lshift_sum"),
        F.sum(F.shiftright(F.col("o_orderkey"), 2)).cast("bigint").alias("rshift_sum"),
    )


# ----------------------------------------------------------------------
# §2.7 date/time interval family — calendar arithmetic beyond the
# first-pass extraction functions. Results emitted as strings/bigints
# per the oracle conventions (base.py docstring).
@query(
    "f_interval_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus_3mo,
           strftime(CAST(o_orderdate - INTERVAL 10 DAY AS DATE), '%Y-%m-%d')  AS minus_10d,
           strftime(last_day(o_orderdate), '%Y-%m-%d')                        AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT)                               AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT)                            AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT)                             AS doy,
           CAST(day(o_orderdate) AS BIGINT)                                   AS dom
    FROM orders
    """,
    doc="SURVEY §2.7 date/time — calendar interval arithmetic "
    "(add_months/date_sub/last_day) + quarter/ISO-week/day extraction; "
    "pure projection, fuses into the scan.",
)
def f_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.date_format(F.date_sub(d, 10), "yyyy-MM-dd").alias("minus_10d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
    )


# ----------------------------------------------------------------------
# §2.7 array-aggregate family — collect_list/collect_set with a
# deterministic order imposed AFTER collection (array_sort), because
# collection order under distribution is arbitrary; sorting makes the
# aggregate partitioning-independent and hence oracle-comparable.
@query(
    "f_array_agg_funcs",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name)  AS nations_csv,
           array_to_string(list_sort(list(DISTINCT substring(n_name, 1, 1))), ',')
                                                     AS initials_csv,
           CAST(count(*) AS BIGINT)                  AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="SURVEY §2.7 array-agg — collect_list/collect_set made "
    "order-deterministic via array_sort (collection order is "
    "partitioning-dependent; the sort restores value semantics).",
)
def f_array_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.array_join(
            F.array_sort(F.collect_set(F.substring("n_name", 1, 1))), ","
        ).alias("initials_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


# ----------------------------------------------------------------------
# §2.7 string family, second pass — regex capture, position search,
# reverse/repeat/translate. Pure projection.
@query(
    "f_string_regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)  AS first_word,
           CAST(strpos(p_name, 'a') AS BIGINT)    AS a_pos,
           reverse(p_brand)                        AS brand_rev,
           repeat(p_brand, 2)                      AS brand_twice,
           translate(p_type, 'aeiou', '_____')     AS type_devoweled
    FROM part
    """,
    doc="SURVEY §2.7 string (2nd pass) — regexp_extract capture group, "
    "instr/strpos, reverse, repeat, translate.",
)
def f_string_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.instr("p_name", "a").cast("bigint").alias("a_pos"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.translate("p_type", "aeiou", "_____").alias("type_devoweled"),
    )


# ----------------------------------------------------------------------
# §2.8 T4 batch twin: SLIDING window via the native F.window operator
# (10-min width, 5-min slide). Each event lands in exactly width/slide
# = 2 windows; the oracle reproduces that as a union of the two
# shifted 5-min tumbling grids (both engines epoch-align buckets).
@query(
    "t_sliding_window",
    oracle="""
    WITH g AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w0, event_type FROM events
    ), s AS (
      SELECT w0 AS ws, event_type FROM g
      UNION ALL
      SELECT w0 - INTERVAL 5 MINUTE AS ws, event_type FROM g
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY ws, event_type
    """,
    doc="SURVEY §2.8 T4 — native sliding event-time window "
    "(F.window width 10m slide 5m); the streaming twin runs the same "
    "operator under a watermark (streaming/windows.py).",
)
def t_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


# ----------------------------------------------------------------------
# §2.8 T4 batch twin: SESSION window via the native F.session_window
# operator (30-min gap). Session start == min(ts) by definition; the
# oracle is the classic gaps-and-islands rewrite (lag → new-session
# flag → running sum as session id). Avoids window.end (Spark defines
# it as last_ts + gap, which plain SQL states differently).
@query(
    "t_session_window",
    oracle="""
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), y AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM x
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
           CAST(count(*) AS BIGINT)               AS n_events
    FROM y GROUP BY user_id, sess_id
    """,
    doc="SURVEY §2.8 T4 — native session window (F.session_window, 30-min "
    "gap) in batch mode; oracle = gaps-and-islands. One shuffle on user_id.",
)
def t_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("last_event"),
            "n_events",
        )
    )


# ----------------------------------------------------------------------
# §2.7 binning — width_bucket equal-width histogram. The oracle spells
# out the bucket arithmetic (DuckDB has no width_bucket): below-range
# → 0, at-or-above the upper bound → n+1, else floor((v-lo)/w)+1 with
# w = (hi-lo)/n chosen so the division is exact in IEEE double. One
# hash aggregate on the bucket id — the canonical first pass of any
# distribution profile over a 100 TB fact column.
@query(
    "f_histogram",
    oracle="""
    SELECT CASE WHEN l_extendedprice < 0 THEN 0
                WHEN l_extendedprice >= 110000 THEN 12
                ELSE CAST(floor(l_extendedprice / 10000.0) AS BIGINT) + 1
           END                                        AS bucket,
           CAST(count(*) AS BIGINT)                   AS n,
           CAST(min(l_extendedprice) AS DOUBLE)       AS lo,
           CAST(max(l_extendedprice) AS DOUBLE)       AS hi
    FROM lineitem GROUP BY 1
    """,
    doc="SURVEY §2.7 binning — F.width_bucket equal-width histogram "
    "(11 buckets over [0, 110000) + under/overflow buckets 0 and 12) "
    "with per-bucket count/min/max; single hash aggregate.",
)
def f_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.width_bucket(
        F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(11)
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").cast("double").alias("lo"),
            F.max("l_extendedprice").cast("double").alias("hi"),
        )
    )


# ----------------------------------------------------------------------
# Count-min sketch (round 10): the remaining classic mergeable sketch
# beside HLL / Misra-Gries / GK — the fixed-size frequency table a
# shard/day pipeline merges counter-wise. Bucket hashing is the md5
# idiom, so DuckDB re-derives the ENTIRE depth×width sketch and every
# point estimate bit-for-bit; the published one-sided guarantee
# (never undercounts) is emitted per item and asserted by the oracle.
# Item domain event_type:user_id (~750) vs width 256 forces REAL
# collisions, so the overcount column is non-trivially exercised.
@query(
    "f_count_min_sketch",
    oracle="""
    WITH it AS (
      SELECT event_type || ':' || CAST(user_id AS VARCHAR) AS item FROM events
    ),
    cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_cnt FROM it GROUP BY item),
    ds AS (SELECT range AS d FROM range(0, 4)),
    sk AS (
      SELECT d,
             CAST(('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || item), 1, 8)) AS BIGINT) % 256 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM it CROSS JOIN ds GROUP BY 1, 2
    ),
    probe AS (
      SELECT c.item, ds.d,
             CAST(('0x' || substr(md5('cms:' || CAST(ds.d AS VARCHAR) || ':' || c.item), 1, 8)) AS BIGINT) % 256 AS bucket
      FROM cnt c CROSS JOIN ds
    ),
    est AS (
      SELECT probe.item, min(sk.cnt) AS cms_est
      FROM probe JOIN sk USING (d, bucket) GROUP BY probe.item
    )
    SELECT cnt.item, cnt.exact_cnt,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(est.cms_est - cnt.exact_cnt AS BIGINT) AS overcount,
           est.cms_est >= cnt.exact_cnt AS never_under
    FROM cnt JOIN est USING (item)
    """,
    doc="[EXT] sketch tier — count-min sketch (Cormode 2005): "
    "depth=4 x width=256 counter table built in one exploded hash "
    "agg (KB-sized, broadcast, counter-wise mergeable); per-item "
    "point estimates = min over rows, one-sided never-undercount "
    "guarantee asserted per item "
    "(operators/sketches.count_min_build/count_min_estimate).",
)
def f_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events").select(
        F.concat_ws(
            ":", F.col("event_type"), F.col("user_id").cast("string")
        ).alias("item")
    )
    sk = sketches.count_min_build(ev, "item", depth=4, width=256)
    est = sketches.count_min_estimate(sk, ev, "item", depth=4, width=256)
    exact = ev.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    return exact.join(est, "item").select(
        "item",
        "exact_cnt",
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        (F.col("cms_est") >= F.col("exact_cnt")).alias("never_under"),
    )


# ----------------------------------------------------------------------
# CMS inner-product join-size estimate (round 10): the published
# count-min application a planner actually uses — "how big is this
# equi-join" answered from two KB-sized sketches without scanning
# either side. Width 64 << 150 keys forces real collision cross-terms,
# so the one-sided bound (est >= true, asserted) is non-trivially
# exercised; DuckDB re-derives both sketches, the inner product, AND
# the exact join size.
@query(
    "f_cms_join_estimate",
    oracle="""
    WITH ea AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
    eb AS (SELECT CAST(o_custkey % 150 AS VARCHAR) AS item FROM orders),
    ds AS (SELECT range AS d FROM range(0, 4)),
    sa AS (
      SELECT d,
             CAST(('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || item), 1, 8)) AS BIGINT) % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ea CROSS JOIN ds GROUP BY 1, 2
    ),
    sb AS (
      SELECT d,
             CAST(('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || item), 1, 8)) AS BIGINT) % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM eb CROSS JOIN ds GROUP BY 1, 2
    ),
    ip AS (
      SELECT sa.d, sum(sa.cnt * sb.cnt) AS ip
      FROM sa JOIN sb USING (d, bucket) GROUP BY sa.d
    ),
    est AS (SELECT min(ip) AS e FROM ip),
    tru AS (
      SELECT sum(ca.c * cb.c) AS t
      FROM (SELECT item, count(*) AS c FROM ea GROUP BY item) ca
      JOIN (SELECT item, count(*) AS c FROM eb GROUP BY item) cb USING (item)
    )
    SELECT CAST(est.e AS BIGINT) AS est_join_size,
           CAST(tru.t AS BIGINT) AS true_join_size,
           est.e >= tru.t AS never_under
    FROM est CROSS JOIN tru
    """,
    doc="[EXT] sketch tier — CMS inner-product join-cardinality "
    "estimate (Cormode 2005 §4.2): est = min_d sum_b cntA*cntB over "
    "two width-64 sketches of events.user_id and orders.o_custkey%150; "
    "one-sided est >= true asserted, exact join size re-derived "
    "(operators/sketches.cms_inner_product).",
)
def f_cms_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.operators import sketches

    ea = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("item")
    )
    eb = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).cast("string").alias("item")
    )
    sa = sketches.count_min_build(ea, "item", depth=4, width=64)
    sb = sketches.count_min_build(eb, "item", depth=4, width=64)
    est = sketches.cms_inner_product(sa, sb)
    ca = ea.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
    cb = eb.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    tru = (
        ca.join(cb, "item")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(tru)).select(
        "est_join_size",
        "true_join_size",
        (F.col("est_join_size") >= F.col("true_join_size")).alias("never_under"),
    )


# ----------------------------------------------------------------------
# Round 12 — VARIANT semi-structured lane (Spark 4): the modern form
# of the reference's dynamic-JSON ingest (utils.py json_normalize →
# string-first columns). JSON records built deterministically from
# orders (heterogeneous: the 'extra' key exists only on even keys, a
# variable-length array, a nested object) parse ONCE to VARIANT;
# typed fields project via try_variant_get (missing path → NULL, the
# one-poisoned-record-must-not-fail-the-batch rule); per-row
# schema_of_variant states the dynamic schema. The oracle states
# ground truth directly from the base columns — the JSON roundtrip
# is exactly what the Spark side must invert.
@query(
    "f_variant_extract",
    oracle="""
    SELECT o_orderkey AS k,
           o_orderkey AS po_num,
           o_orderstatus AS po_status,
           CAST(o_orderkey % 3 + 1 AS INT) AS n_lines,
           CASE WHEN o_orderkey % 2 = 0 THEN 'rush' END AS extra,
           CASE WHEN o_orderkey % 2 = 0
                THEN 'OBJECT<extra: STRING, lines: ARRAY<BIGINT>, po: OBJECT<num: BIGINT, status: STRING>>'
                ELSE 'OBJECT<lines: ARRAY<BIGINT>, po: OBJECT<num: BIGINT, status: STRING>>'
           END AS vschema
    FROM orders WHERE o_orderkey <= 2000
    """,
    doc="SURVEY §2.3/§2.7 [EXT] — Spark 4 VARIANT ingest: parse-once "
    "semi-structured records, lazy typed extraction with "
    "try_variant_get (missing key → NULL), per-row dynamic schema via "
    "schema_of_variant (functions/ingest_policy.variant_fields).",
)
def f_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.functions.ingest_policy import variant_fields

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    js = F.to_json(
        F.struct(
            F.struct(
                F.col("o_orderkey").alias("num"),
                F.col("o_orderstatus").alias("status"),
            ).alias("po"),
            F.sequence(F.lit(1), (F.col("o_orderkey") % 3 + 1).cast("int"))
            .cast("array<bigint>")
            .alias("lines"),
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("rush")).alias("extra"),
        )
    )
    recs = o.select(F.col("o_orderkey").alias("k"), js.alias("rec"))
    out = variant_fields(
        recs,
        "rec",
        {
            "po_num": ("$.po.num", "bigint"),
            "po_status": ("$.po.status", "string"),
            "lines": ("$.lines", "array<bigint>"),
            "extra": ("$.extra", "string"),
        },
        keep=["k"],
        variant_out="v",
    )
    return out.select(
        "k",
        "po_num",
        "po_status",
        F.size("lines").alias("n_lines"),
        "extra",
        F.schema_of_variant(F.col("v")).alias("vschema"),
    )


# ----------------------------------------------------------------------
# Bloom-filter membership (round 12): the existence sketch completing
# the HLL/CMS/MG/GK family — "has this key ever been seen", answered
# from a ≤ n_bits position set without touching the data side. Build
# over the customers that placed orders, probe EVERY customer, and
# state the whole confusion picture beside the exact twin: zero false
# negatives by construction (asserted per key), false positives
# allowed and visible. Bits are md5-derived, so DuckDB re-derives the
# ENTIRE filter and every verdict bit-for-bit.
def _bench_bloom_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deploy path only: build + probe (the registry fn additionally
    runs the exact-membership twin for certification — scaffolding
    the bench must not time, per the bench_fn discipline)."""
    from cbts_datalake_synnex_spark.operators import sketches

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bits = sketches.bloom_build(orders, "o_custkey", n_bits=4096, k=3)
    return sketches.bloom_probe(bits, cust, "c_custkey", n_bits=4096, k=3)


@query(
    "f_bloom_filter",
    bench_fn=_bench_bloom_raw,
    oracle="""
    WITH ks AS (SELECT range AS i FROM range(0, 3)),
    build AS (
      SELECT DISTINCT
        CAST(('0x' || substr(md5('bloom:' || CAST(o_custkey AS VARCHAR)), 1 + 8 * i, 8)) AS BIGINT) % 4096 AS pos
      FROM orders CROSS JOIN ks
      WHERE o_custkey IS NOT NULL
    ),
    probe AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL),
    ph AS (
      SELECT c_custkey,
        CAST(('0x' || substr(md5('bloom:' || CAST(c_custkey AS VARCHAR)), 1 + 8 * i, 8)) AS BIGINT) % 4096 AS pos
      FROM probe CROSS JOIN ks
    ),
    verdict AS (
      SELECT c_custkey, count(b.pos) = 3 AS bloom_member
      FROM ph LEFT JOIN build b USING (pos)
      GROUP BY c_custkey
    ),
    tru AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT CAST(v.c_custkey AS BIGINT) AS c_custkey,
           v.bloom_member,
           t.c_custkey IS NOT NULL AS true_member,
           v.bloom_member OR t.c_custkey IS NULL AS no_false_negative
    FROM verdict v LEFT JOIN tru t USING (c_custkey)
    """,
    doc="SURVEY §2.7++/§2.10 [EXT] — Bloom-filter existence sketch: "
    "build (≤ n_bits one-int position rows) over orders.o_custkey, "
    "probe every customer; member iff all k md5-derived positions "
    "set; zero-false-negative guarantee asserted per key beside the "
    "exact twin (operators/sketches.bloom_build/bloom_probe).",
)
def f_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.operators import sketches

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bits = sketches.bloom_build(orders, "o_custkey", n_bits=4096, k=3)
    verdict = sketches.bloom_probe(bits, cust, "c_custkey", n_bits=4096, k=3)
    tru = orders.select(F.col("o_custkey").alias("c_custkey")).distinct().select(
        "c_custkey", F.lit(True).alias("__t")
    )
    return verdict.join(tru, "c_custkey", "left").select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "bloom_member",
        F.coalesce(F.col("__t"), F.lit(False)).alias("true_member"),
        (F.col("bloom_member") | F.col("__t").isNull()).alias("no_false_negative"),
    )


# ----------------------------------------------------------------------
# §2.10 [EXT] sketch tier completion (round 13) — KMV / theta sketch:
# SET-OPERATION cardinalities over independently built sketches, the
# one capability HLL lacks (HLL unions, but cannot intersect). Items
# are the per-type distinct value-cents of the events stream (floored,
# so both engines derive the identical integer grid); sketches are
# built per event_type, then |view ∪ purchase| comes from the merged
# sketch and |view ∩ purchase| from the theta rule θ = min(θ_a, θ_b),
# est = |{h ∈ A∩B : h < θ}|·2^60/θ. Every hash, rank, and estimate is
# md5-deterministic, so the oracle re-derives the WHOLE pipeline —
# including the exact ground truths and per-scope relative errors —
# bit-for-bit. k=128 < the ~1.5k per-type cardinality at sf0.01, so
# the ESTIMATOR path (not the exact-count short-circuit) is what
# certifies.
@query(
    "f_theta_sketch",
    oracle="""
    WITH it AS (
      SELECT DISTINCT event_type, CAST(floor(value * 100) AS BIGINT) AS item
      FROM events
    ),
    hh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('kmv:' || CAST(item AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM it
    ),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
      FROM hh
    ),
    sk AS (SELECT * FROM rk WHERE rank <= 128),
    est AS (
      SELECT event_type, count(*) AS n_kept,
             CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
                  ELSE 127.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
             END AS e
      FROM sk GROUP BY 1
    ),
    ex AS (SELECT event_type, count(DISTINCT item) AS exact_distinct FROM it GROUP BY 1),
    singles AS (
      SELECT est.event_type AS scope, n_kept, round(e, 6) AS kmv_est, exact_distinct
      FROM est JOIN ex USING (event_type)
    ),
    a AS (SELECT h FROM sk WHERE event_type = 'view'),
    b AS (SELECT h FROM sk WHERE event_type = 'purchase'),
    u AS (SELECT h FROM a UNION SELECT h FROM b),
    urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM u),
    usk AS (SELECT * FROM urk WHERE rank <= 128),
    uest AS (
      SELECT count(*) AS n_kept,
             CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
                  ELSE 127.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
             END AS e
      FROM usk
    ),
    uex AS (
      SELECT count(DISTINCT item) AS exact_distinct
      FROM it WHERE event_type IN ('view', 'purchase')
    ),
    union_row AS (
      SELECT 'view_union_purchase' AS scope, n_kept, round(e, 6) AS kmv_est,
             exact_distinct
      FROM uest CROSS JOIN uex
    ),
    th AS (
      SELECT least(
        (SELECT CASE WHEN count(*) >= 128 THEN max(h)
                     ELSE 1152921504606846976 END FROM a),
        (SELECT CASE WHEN count(*) >= 128 THEN max(h)
                     ELSE 1152921504606846976 END FROM b)) AS theta
    ),
    common AS (SELECT a.h FROM a JOIN b USING (h)),
    iagg AS (
      SELECT (SELECT count(*) FROM common, th WHERE h < theta) AS n_common,
             (SELECT theta FROM th) AS theta
    ),
    iex AS (
      SELECT count(*) AS exact_distinct FROM (
        SELECT item FROM it WHERE event_type = 'view'
        INTERSECT
        SELECT item FROM it WHERE event_type = 'purchase')
    ),
    irow AS (
      SELECT 'view_intersect_purchase' AS scope, n_common AS n_kept,
             round(CAST(n_common AS DOUBLE) * 1152921504606846976.0
                   / CAST(theta AS DOUBLE), 6) AS kmv_est,
             exact_distinct
      FROM iagg CROSS JOIN iex
    ),
    allrows AS (
      SELECT * FROM singles
      UNION ALL SELECT * FROM union_row
      UNION ALL SELECT * FROM irow
    )
    SELECT scope, CAST(n_kept AS BIGINT) AS n_kept, kmv_est,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round(abs(kmv_est - exact_distinct) / exact_distinct, 6) AS rel_err
    FROM allrows
    """,
    doc="SURVEY §2.10 [EXT] — KMV/theta distinct sketch (k=128): per-type "
    "distinct estimates plus sketch-only |view ∪ purchase| (merged sketch) and "
    "|view ∩ purchase| (theta rule) with exact ground truths and relative "
    "errors; md5-deterministic, oracle re-derives every estimate bit-for-bit.",
)
def f_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.operators import sketches

    k = 128
    ev = load_table(spark, sf_dir, "events")
    items = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("item")
    )
    sk = sketches.kmv_build(items, "item", ["event_type"], k=k)
    per_type = sketches.kmv_estimate(sk, ["event_type"], k=k)
    exact = items.groupBy("event_type").agg(
        F.count_distinct("item").alias("exact_distinct")
    )
    singles = per_type.join(exact, "event_type").select(
        F.col("event_type").alias("scope"), "n_kept", "kmv_est", "exact_distinct"
    )
    a = sk.filter(F.col("event_type") == "view")
    b = sk.filter(F.col("event_type") == "purchase")
    u_sk = sketches.kmv_merge(a, b, (), k=k)
    u_est = sketches.kmv_estimate(u_sk, (), k=k)
    u_exact = (
        items.filter(F.col("event_type").isin("view", "purchase"))
        .agg(F.count_distinct("item").alias("exact_distinct"))
    )
    u_row = u_est.crossJoin(u_exact).select(
        F.lit("view_union_purchase").alias("scope"),
        "n_kept", "kmv_est", "exact_distinct",
    )
    i_est = sketches.kmv_intersect_estimate(a, b, (), k=k)
    va = items.filter(F.col("event_type") == "view").select("item").distinct()
    vb = items.filter(F.col("event_type") == "purchase").select("item").distinct()
    i_exact = va.join(vb, "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    i_row = i_est.crossJoin(i_exact).select(
        F.lit("view_intersect_purchase").alias("scope"),
        F.col("n_common").alias("n_kept"), "kmv_est", "exact_distinct",
    )
    out = singles.unionByName(u_row).unionByName(i_row)
    return out.withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("kmv_est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ),
    )


# ----------------------------------------------------------------------
# §2.7/X8 [EXT] round 13 — the Poisson bootstrap: uncertainty for
# corpus-scale aggregates. Classical bootstrap resampling (n draws
# WITH replacement) is a global operation no partitioned engine can
# do; the Poisson limit makes each row's resample multiplicity an
# independent Poisson(1) draw, so ONE corpus scan computes ALL R
# replicates (explode ×R → map-side-combined agg to R rows). Weights
# come from per-(replicate,row) md5 uniforms pushed through a LITERAL
# Poisson CDF ladder (no runtime transcendentals), so the oracle
# re-derives every weight, every replicate mean, and both CI order
# statistics exactly. boot_mean rounds at 2dp — the grid where
# corpus-sized float-sum ulps cannot flip (the engine's established
# summation-order discipline).
@query(
    "f_poisson_bootstrap",
    oracle="""
    WITH reps AS (SELECT range AS r FROM range(0, 32)),
    w AS (
      SELECT r,
        (CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.9810118431238463 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.9994058151824183 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.999916758850712 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.9999897508033253 THEN 1 ELSE 0 END
         + CASE WHEN u >= 0.999998874797402 THEN 1 ELSE 0 END) AS wt,
        x
      FROM (
        SELECT r,
               CAST(('0x' || substr(md5('boot:' || CAST(r AS VARCHAR) || ':'
                     || CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
                 / 4503599627370496.0 AS u,
               o_totalprice AS x
        FROM orders CROSS JOIN reps
      )
    ),
    means AS (
      SELECT r AS replicate, CAST(sum(wt) AS BIGINT) AS n_eff,
             round(sum(wt * x) / sum(wt), 2) AS boot_mean
      FROM w GROUP BY 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY boot_mean, replicate) AS rk
      FROM means
    )
    SELECT replicate, n_eff, boot_mean,
           (SELECT boot_mean FROM ranked WHERE rk = 2) AS ci_low,
           (SELECT boot_mean FROM ranked WHERE rk = 31) AS ci_high
    FROM means
    """,
    doc="§2.7/X8 [EXT] — Poisson bootstrap (32 replicates) of the mean "
    "order price: md5-uniform -> literal Poisson(1) CDF ladder -> weighted "
    "means in ONE corpus scan; CI from the 2nd/31st order statistics of the "
    "rounded replicate means (operators/sampling.poisson_bootstrap).",
)
def f_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cbts_datalake_synnex_spark.operators.sampling import poisson_bootstrap

    orders = load_table(spark, sf_dir, "orders")
    return poisson_bootstrap(
        orders, "o_orderkey", "o_totalprice", n_replicates=32
    )
