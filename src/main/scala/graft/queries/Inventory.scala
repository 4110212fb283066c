package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType}

import graft.tables.Tables

/**
 * Canonical relational query inventory (SURVEY.md §5.3 / FIXTURES.md §3):
 * one representative per delegated-SQL category the reference engine admits
 * through its gate (reference: src/iceberg_explorer/query/executor.py:107 —
 * arbitrary read-only WITH/SELECT passes straight to DuckDB).
 *
 * Every query is a declarative DataFrame pipeline so Catalyst owns pushdown,
 * pruning, join selection and AQE; SQL form is used only where the DataFrame
 * API has no construct (correlated scalar subqueries). Each query carries a
 * total-order ORDER BY and canonicalized numeric types so results
 * hash-compare against the DuckDB oracle (`oracle` map, DuckDB dialect).
 *
 * Hash-parity rules (SURVEY §5.2(4)):
 *  - monetary sums: `sum(double)` THEN cast DECIMAL(18,2) THEN cast back to
 *    DOUBLE (`money`/`money6` below). The fixtures are 2-decimal-intent
 *    values, so the true sum is an exact 2-dp rational and both engines
 *    round to it regardless of float summation order. Casting each value
 *    BEFORE the sum would be wrong: Spark rounds the shortest decimal
 *    representation of a double while DuckDB rounds its binary value, so
 *    per-value rounding diverges at .xx5 boundaries. The final
 *    DOUBLE cast exists because the driver reads Spark parquet via
 *    pandas/pyarrow (DECIMAL → decimal.Decimal, str "3.40") but the oracle
 *    via duckdb fetchdf (DECIMAL → float64, str "3.4") — a written DECIMAL
 *    column hash-mismatches on any trailing-zero value (round-1 failures
 *    j01/q14/q20/q27/q30/q31). Both sides must end in DOUBLE.
 *  - `round` only on values exactly representable at the target scale
 *    (same boundary-divergence reason).
 *  - integer-typed outputs cast to identical widths on the oracle side
 *    (DuckDB `length`/`year`/`row_number`/`ceil` return BIGINT/DOUBLE where
 *    Spark returns INT/LONG).
 *  - no array/struct/map output columns on oracle-checked queries: the
 *    driver's pandas sort_values crashes on unhashable cells (round-1
 *    q36/q37) — project nested results down to scalars.
 */
object Inventory {

  private val dec2 = DecimalType(18, 2)
  private val dec6 = DecimalType(18, 6)

  /** Deterministic 2-dp rounding that still hashes as a plain double on
    * both the pandas (Spark parquet) and duckdb (oracle) read paths. */
  private def money(c: Column): Column = c.cast(dec2).cast("double")
  private def money6(c: Column): Column = c.cast(dec6).cast("double")

  /** Spark-side implementations, keyed by stable query id. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scan / project / filter ------------------------------------
    "q01_scan_filter" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures — order
        // by every output column so the result is totally determined.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // --- joins --------------------------------------------------------
    "q02_inner_join" -> { (s, d) =>
      val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "F")
      val c = Tables(s, d, "customer")
      // orders ⋈ customer on custkey: customer is the smaller side at any
      // scale factor; Catalyst/AQE broadcasts it when it fits.
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
        .orderBy(col("o_orderkey"))
    },
    "q03_left_join_agg" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, o("o_custkey") === c("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n"))
        .orderBy(col("c_custkey"))
    },
    "q04_semi_join" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    "q05_anti_join" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    },
    "q06_three_way_join" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      // nation (25 rows) and region (5 rows) are broadcast dims at ANY
      // scale factor — explicit hint so the big fact side never shuffles.
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // --- aggregation ---------------------------------------------------
    "q07_groupby_agg" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          money(sum(col("l_extendedprice"))).as("total"),
          money6(avg(col("l_discount"))).as("avg_disc"),
          min(col("l_quantity")).as("minq"),
          max(col("l_quantity")).as("maxq"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q08_distinct_agg" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("custs"))
        .orderBy(col("o_orderstatus"))
    },
    "q09_rollup" -> { (s, d) =>
      Tables(s, d, "nation")
        .rollup(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_regionkey").asc_nulls_first,
                 col("n_nationkey").asc_nulls_first)
    },
    "q10_cube" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    },
    "q11_grouping_sets" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    },
    "q12_having" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(col("o_custkey"))
    },

    // --- window functions ------------------------------------------------
    "q13_window_rank" -> { (s, d) =>
      // All rank windows are KEYED: a global (unpartitioned) ORDER BY
      // window funnels every row through one partition — an anti-pattern
      // at 100 TB, so the shipped inventory doesn't contain one (it did
      // until round 3; a global top-k is q15's TakeOrderedAndProject, and
      // a distributed global rank would be range-partition + offset join).
      val byNation = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      // rank/dense_rank order WITHOUT the unique-key tiebreak: with it
      // there are never peer rows and both collapse to row_number — the
      // ties are the semantics this entry exists to exercise. (Still
      // deterministic: peers share the output value by definition.)
      val byBal = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc)
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          row_number().over(byNation).as("rn"),
          rank().over(byBal).as("rk"),
          dense_rank().over(byBal).as("drk"))
        .orderBy(col("c_custkey"))
    },
    "q14_window_analytic" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          money(sum(col("o_totalprice")).over(w.rowsBetween(-1, 0)))
            .as("run2"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // --- sort / limit / pagination ----------------------------------------
    "q15_topk" -> { (s, d) =>
      // ORDER BY + LIMIT → TakeOrderedAndProject: true distributed top-k,
      // no global sort even at 100 TB.
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },
    "q16_offset" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .offset(250).limit(100)
    },

    // --- set operations -----------------------------------------------
    "q17_union_all" -> { (s, d) =>
      Tables(s, d, "nation").select(col("n_name").as("name"))
        .unionAll(Tables(s, d, "region").select(col("r_name").as("name")))
        .orderBy(col("name"))
    },
    "q18_intersect" -> { (s, d) =>
      Tables(s, d, "nation").select(col("n_regionkey").as("k"))
        .intersect(Tables(s, d, "region").select(col("r_regionkey").as("k")))
        .orderBy(col("k"))
    },
    "q19_except" -> { (s, d) =>
      Tables(s, d, "customer").select(col("c_nationkey").as("k"))
        .except(Tables(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    },

    // --- CTE / subqueries ----------------------------------------------
    "q20_cte" -> { (s, d) =>
      val big = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(money(sum(col("o_totalprice"))).as("spend"))
        .filter(col("spend") > 200000)
      val c = Tables(s, d, "customer")
      big.join(c, c("c_custkey") === big("o_custkey"))
        .select(col("c_name"), col("spend"))
        .orderBy(col("c_name"))
    },
    "q21_correlated_subquery" -> { (s, d) =>
      // Correlated scalar subquery has no DataFrame-API construct; SQL form
      // — Catalyst decorrelates it into a left outer aggregate join.
      Tables.register(s, d)
      s.sql("""SELECT c_custkey,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n
               FROM customer c ORDER BY c_custkey""")
    },

    // --- scalar functions ----------------------------------------------
    "q22_string_fns" -> { (s, d) =>
      Tables(s, d, "part")
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("pfx"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_brand"), lit("#"), lit("-")).as("brand2"),
          concat(col("p_type"), lit("/"), col("p_brand")).as("tb"))
        .orderBy(col("p_partkey"))
    },
    "q23_regexp" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("w"))
        .orderBy(col("p_partkey"))
    },
    "q24_date_fns" -> { (s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("mstart"),
          datediff(col("o_orderdate").cast(DateType),
                   lit(java.sql.Date.valueOf("2026-01-01"))).as("dd"))
        .orderBy(col("o_orderkey"))
    },
    "q25_math_fns" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          // l_quantity is integral, so quantity/2 is exactly .0/.5 and
          // round(_, 1) is exact in both engines (see file header).
          round(col("l_quantity") / 2, 1).as("r1"),
          abs(col("l_discount") - 0.05).as("a"),
          ceil(col("l_quantity")).as("c"),
          floor(col("l_tax") * 100).as("f"),
          (col("l_orderkey") % 7).as("m"),
          sqrt(col("l_quantity")).as("sq"))
        // order over all (deterministically derived) output columns:
        // (l_orderkey, l_linenumber) alone is not a total order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("r1"),
                 col("a"), col("f"))
        .limit(500)
    },
    "q26_case_coalesce" -> { (s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 150000, "hi")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("lo").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"))
        .orderBy(col("o_orderkey"))
    },
    "q27_cast_matrix" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qi"),
          col("l_orderkey").cast("string").as("ks"),
          col("l_discount").cast(DecimalType(8, 4)).cast("double").as("dd"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("qi"), col("dd"))
        .limit(200)
    },
    "q28_array_fns" -> { (s, d) =>
      Tables(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("e1"))
        .orderBy(col("vec_id"))
    },
    "q29_approx_distinct" -> { (s, d) =>
      // HLL sketch values differ across engines, so the ±5 % tolerance
      // check runs IN-QUERY and the emitted columns are engine-independent
      // (exact distinct count + the boolean verdict) — hash-checkable by
      // the DuckDB gate while still exercising approx_count_distinct.
      // ScalaTest additionally asserts the raw sketch value is within
      // tolerance of exact.
      Tables(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("ad"),
             countDistinct(col("l_partkey")).as("exact_nd"))
        .select(col("exact_nd"),
          (abs(col("ad") - col("exact_nd")).cast("double") /
            col("exact_nd") <= lit(0.05)).as("within_tol"))
    },
    "q30_events_agg" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          money(sum(col("value"))).as("sv"),
          min(col("ts")).cast(DateType).as("first_day"))
        .orderBy(col("event_type"))
    },

    // --- generators / recursion (reference exercises range() at
    //     tests/test_executor.py:292,417; recursive CTE is new in Spark 4.1)
    "q33_recursive_cte" -> { (s, d) =>
      s.sql("""WITH RECURSIVE t(n) AS (
                 SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100)
               SELECT n, n * n AS sq FROM t ORDER BY n""")
    },
    "q34_range_generator" -> { (s, d) =>
      s.range(0, 1000)
        .selectExpr("id AS i", "id % 7 AS m")
        .orderBy(col("i"))
    },

    "q42_distinct" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- statistical aggregates (order-dependent double math → 6-dp
    //     decimal round, emitted as double per the hash-parity rules)
    "q44_stat_aggs" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          money6(stddev_samp(col("l_quantity"))).as("sd_q"),
          money6(var_samp(col("l_quantity"))).as("var_q"),
          money6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          money6(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qd"))
        .orderBy(col("l_returnflag"))
    },
    // --- ordered string aggregation: sort_array(collect_list) is the
    //     deterministic (and shuffle-partial-aggregated) form
    "q45_string_agg" -> { (s, d) =>
      Tables(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    },
    // --- distribution window functions: ntile / percent_rank / cume_dist
    //     (exact rationals, one IEEE divide → bit-identical cross-engine)
    "q46_window_distribution" -> { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    },
    // --- lateral/generator join: one row per (row, array element) with
    //     the element's position — the table-function join shape
    "q47_lateral_explode" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .toDF("p_partkey", "pos", "word")
        .select(col("p_partkey"), col("pos").cast("int").as("pos"),
          col("word"))
        .orderBy(col("p_partkey"), col("pos"))
    },
    // --- conditional/selective aggregates; max_by/min_by keyed on the
    //     unique o_orderkey so tie-breaking is deterministic
    "q48_conditional_aggs" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count_if(col("o_totalprice") > 100000).as("n_big"),
          bool_and(col("o_totalprice") > lit(0.0)).as("all_pos"),
          bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
          max_by(col("o_orderpriority"), col("o_orderkey")).as("last_prio"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_prio"))
        .orderBy(col("o_orderstatus"))
    },
    "q43_scalar_subquery" -> { (s, d) =>
      // uncorrelated scalar subquery: one-row plan broadcast to all rows
      Tables.register(s, d)
      s.sql("""SELECT o_orderkey,
                 CAST(CAST((SELECT max(o_totalprice) FROM orders) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
               FROM orders ORDER BY o_orderkey LIMIT 100""")
    },
    "q40_pivot" -> { (s, d) =>
      // pivot: one column per l_linestatus value (explicit value list so
      // the plan is a single pass, no distinct-values pre-query)
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("l_returnflag"))
    },
    "q41_unpivot" -> { (s, d) =>
      // unpivot/melt: wide→long on two measure columns
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_discount")),
          variableColumnName = "measure",
          valueColumnName = "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"),
          col("val"))
        .limit(400)
    },
    "q39_percentile" -> { (s, d) =>
      // interpolated percentiles over integral-valued quantities land on
      // exact .0/.5 values in both engines — hash-safe
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med"),
             expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy(col("l_returnflag"))
    },
    "q38_range_join" -> { (s, d) =>
      // theta/range join (non-equi): planned as BroadcastNestedLoopJoin
      // with the 25-row nation side broadcast — the only sane physical
      // shape for a non-equi join against a small band table
      val n = Tables(s, d, "nation")
        .select(col("n_nationkey"),
          (col("n_nationkey") * 400).as("lo"),
          (col("n_nationkey") * 400 + 399).as("hi"))
      val c = Tables(s, d, "customer")
      c.join(broadcast(n),
          c("c_acctbal") >= n("lo") && c("c_acctbal") <= n("hi"))
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_nationkey"))
    },
    "q36_array_lambdas" -> { (s, d) =>
      // higher-order array functions (SQL lambda surface). The lambda
      // results are projected down to SCALAR columns: the driver's pandas
      // sort_values crashes on array cells (round-1 q36), and raw float32
      // scalars are bitwise-stable across engines so no canonicalization
      // is needed.
      Tables(s, d, "embeddings")
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          element_at(transform(col("embedding"), x => -x), 1).as("neg1"),
          element_at(slice(col("embedding"), 1, 4), 4).as("head4_last"))
        .orderBy(col("vec_id"))
    },
    "q37_struct_fns" -> { (s, d) =>
      // struct build + field access, projected back to scalar fields for
      // the hash gate (struct cells are unhashable in the driver's pandas
      // sort — round-1 q37).
      Tables(s, d, "events")
        .select(col("event_id"),
          struct(col("event_type").as("t"),
                 col("value").as("v")).as("ev"))
        .filter(col("ev.v") > 150)
        .select(col("event_id"), col("ev.t").as("ev_t"),
                col("ev.v").as("ev_v"))
        .orderBy(col("event_id"))
    },
    "q35_json_fns" -> { (s, d) =>
      // events.props holds JSON objects {"k": <int>}; JSON path extraction
      // + typed cast is the §2.B scalar-function JSON category
      Tables(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .filter(col("k") % 3 === 0)
        .orderBy(col("event_id"))
    },

    // --- streaming transforms on batch input (unified batch/stream code:
    //     the same EventStreams pipelines run under readStream, see
    //     graft.streaming + its spec; batch mode makes them oracle-checkable)
    "q31_stream_window_agg" -> { (s, d) =>
      graft.streaming.EventStreams
        .windowedTypeCounts(Tables(s, d, "events"), "1 hour", "10 minutes")
        .withColumn("total_value", money(col("total_value")))
        .orderBy(col("win_start"), col("event_type"))
    },
    "q32_stream_sessions" -> { (s, d) =>
      // session_window gap-fold semantics are pinned by EventStreamsSpec
      // AND oracle-checked against a gaps-and-islands SQL reformulation.
      graft.streaming.EventStreams
        .userSessions(Tables(s, d, "events"), "30 minutes", "10 minutes")
        .withColumn("session_value", money(col("session_value")))
        .orderBy(col("user_id"), col("session_start"))
    },
    "q53_stateful_totals" -> { (s, d) =>
      // arbitrary stateful aggregation (mapGroupsWithState) in batch mode:
      // per-user running totals collapse to final snapshots, which a plain
      // GROUP BY oracle reproduces. last_ts carries millisecond precision
      // (java.sql.Timestamp.getTime in the state fold), so the oracle
      // truncates its max(ts) the same way.
      import s.implicits._
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      graft.streaming.EventStreams.userRunningTotals(ev).toDF()
        .withColumn("total_value", money(col("total_value")))
        .orderBy(col("user_id"))
    },
    "q57_stateful_breakdown" -> { (s, d) =>
      // flatMapGroupsWithState (0..N rows per group) in batch mode:
      // per-(user, type) running counts collapse to final snapshots,
      // reproduced by a plain two-key GROUP BY oracle
      import s.implicits._
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      graft.streaming.EventStreams.userTypeBreakdown(ev).toDF()
        .withColumn("total_value", money(col("total_value")))
        .orderBy(col("user_id"), col("event_type"))
    },
    "q49_interval_join" -> { (s, d) =>
      // stream-stream interval join, batch-mode gate (streaming mode with
      // watermark state eviction is spec-tested over MemoryStreams)
      val ev = Tables(s, d, "events")
      graft.streaming.EventStreams.intervalJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), "1 hour")
        .withColumn("max_value", money(col("max_value")))
        .orderBy(col("event_id"))
    },
    "q79_interval_join_outer" -> { (s, d) =>
      // left-outer stream-stream interval join: purchases with NO click
      // in the preceding hour survive with n_matches = 0 (batch gate;
      // streaming watermark semantics spec-tested)
      val ev = Tables(s, d, "events")
      graft.streaming.EventStreams.intervalJoinOuter(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), "1 hour")
        .withColumn("max_value", money(col("max_value")))
        .orderBy(col("event_id"))
    },
    "q50_hll_union" -> { (s, d) =>
      // MERGEABLE sketches — the re-aggregatable rollup shape at 100 TB:
      // per-flag partial HLL sketches (Datasketches binary), union-merged
      // to one global estimate without rescanning. Sketch bytes are
      // engine-specific, so the gate emits the q29 shape: exact count +
      // the in-query ±5 % verdict the Spark side must earn.
      val li = Tables(s, d, "lineitem")
      val merged = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = li.agg(countDistinct(col("l_partkey")).as("exact_nd"))
      merged.crossJoin(exact).select(col("exact_nd"),
        (abs(col("est") - col("exact_nd")).cast("double") /
          col("exact_nd") <= lit(0.05)).as("within_tol"))
    },
    "q52_bloom_semi" -> { (s, d) =>
      // Bloom-prefiltered semi join — identical result to the plain semi
      // join (no false negatives + exact verify), but the fact table is
      // pruned by a broadcast sketch before any exchange; Spark's AQE
      // runtime filters use the same expressions when their heuristics
      // fire, this makes the shape explicit and testable.
      val dim = Tables(s, d, "part").filter(col("p_size") === 1)
      graft.ops.Prune
        .bloomSemiJoin(Tables(s, d, "lineitem"), "l_partkey",
          dim, "p_partkey", expectedItems = 16384L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), money(sum(col("l_quantity"))).as("sq"))
        .orderBy(col("l_returnflag"))
    },
    "q51_apx_quantile" -> { (s, d) =>
      // percentile_approx (GK sketch, mergeable) vs the exact interpolated
      // percentile; the emitted median is the exact one (hash-parity with
      // DuckDB quantile_cont, q39-established), the sketch result is
      // checked in-query: accuracy 1000 bounds rank error by n/1000, well
      // inside one quantity unit on this distribution.
      Tables(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
            .as("apx"),
          expr("percentile(l_quantity, 0.5)").as("med"))
        .select(col("l_returnflag"), col("med"),
          (abs(col("apx") - col("med")) <= lit(1.0)).as("within_tol"))
        .orderBy(col("l_returnflag"))
    },

    // --- dialect widenings (oracle-checked, identical SQL both engines) --
    "q54_range_frame" -> { (s, d) =>
      // time-interval window frame (RANGE BETWEEN INTERVAL): the moving
      // 1 h per-user sum/count — frame bounds by VALUE, not row offsets,
      // which rows-frame q14 cannot express
      Tables.register(s, d)
      s.sql("""SELECT event_id, user_id, ts,
                 CAST(CAST(sum(value) OVER w AS DECIMAL(18,2)) AS DOUBLE)
                   AS mv_1h,
                 count(*) OVER w AS n_1h
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               ORDER BY event_id""")
    },
    "q55_lateral_subquery" -> { (s, d) =>
      // correlated LATERAL derived table with per-row ORDER BY + LIMIT:
      // top-2 customers by balance per nation — the "top-n per group via
      // lateral" idiom (distinct from q47's lateral explode)
      Tables.register(s, d)
      s.sql("""SELECT n.n_name, t.c_name, t.bal
               FROM nation n,
               LATERAL (SELECT c_name,
                          CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
                            AS bal
                        FROM customer c
                        WHERE c.c_nationkey = n.n_nationkey
                        ORDER BY bal DESC, c_name LIMIT 2) t
               ORDER BY n.n_name, t.bal DESC, t.c_name""")
    },
    "q56_group_by_all" -> { (s, d) =>
      // GROUP BY ALL dialect form (infers grouping keys from the select
      // list) — same result as an explicit key list
      Tables.register(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                 min(l_quantity) AS minq
               FROM lineitem GROUP BY ALL
               ORDER BY l_returnflag, l_linestatus""")
    },

    "q58_stream_dedup" -> { (s, d) =>
      // streaming exact dedup (dropDuplicatesWithinWatermark under
      // readStream — watermark-bounded state, spec-tested; batch
      // fallback here) over an at-least-once feed simulated by unioning
      // the events with themselves — full-row duplicates make the kept
      // row deterministic, so the result is exactly the original table
      val ev = Tables(s, d, "events")
      graft.streaming.EventStreams.dedupEvents(ev.unionAll(ev))
        .orderBy(col("event_id"))
    },
    "q59_nullsafe_join" -> { (s, d) =>
      // null-safe equality join (Spark `<=>`, DuckDB IS NOT DISTINCT
      // FROM): NULL keys match each other where `=` would drop them —
      // both sides plant NULL keys so the semantics exercise for real
      Tables.register(s, d)
      s.sql("""SELECT a.k, a.na, b.nb
               FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                              ELSE o_orderkey % 5 END AS k,
                            count(*) AS na
                     FROM orders GROUP BY 1) a
               JOIN (SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL
                              ELSE c_custkey % 5 END AS k,
                            count(*) AS nb
                     FROM customer GROUP BY 1) b
               ON a.k <=> b.k
               ORDER BY a.k NULLS FIRST""")
    },
    "q60_map_fns" -> { (s, d) =>
      // MAP column + higher-order map functions (map_from_entries,
      // map_filter, transform_values), exploded back to rows — the MAP
      // itself is engine-internal, so the oracle reproduces the
      // relational effect of the same pipeline. The fixture has
      // duplicate (orderkey, linenumber) pairs, so quantities pre-sum
      // per line — map keys must be unique (DUPLICATED_MAP_KEY errors
      // under the default spark.sql.mapKeyDedupPolicy=EXCEPTION).
      val li = Tables(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity")).as("l_quantity"))
      li.groupBy(col("l_orderkey"))
        .agg(map_from_entries(array_sort(
            collect_list(struct(col("l_linenumber"), col("l_quantity")))))
          .as("m"))
        .select(col("l_orderkey"),
          size(map_filter(col("m"), (_, v) => v > 25)).cast("long")
            .as("n_big"),
          explode(transform_values(col("m"), (_, v) => v * 2)))
        .toDF("l_orderkey", "n_big", "ln", "q2")
        .orderBy(col("l_orderkey"), col("ln"))
    },
    "q61_variant" -> { (s, d) =>
      // Spark 4 VARIANT type: parse_json into the binary semi-structured
      // type, then typed variant_get extraction (vs q35's string-path
      // JSON functions). The extraction sits behind a single-element
      // explode ON PURPOSE: written as `WHERE variant_get(parse_json(..))`
      // the filter and the projection each evaluate the parse (Catalyst
      // re-inlines any deterministic subquery alias via
      // PushDownPredicates/CollapseProject, and a dropped nondeterministic
      // barrier column gets ColumnPruning'd away first), making this the
      // allocation-heaviest query in the inventory. Predicates on a
      // GENERATOR output cannot be pushed below the Generate, so the
      // parse runs exactly once per row and the filter tests the already-
      // extracted int — same rows, same schema, half the parse work.
      Tables.register(s, d)
      s.sql("""SELECT event_id, k
               FROM events
               LATERAL VIEW explode(array(
                 variant_get(parse_json(props), '$.k', 'int'))) AS k
               WHERE k >= 50
               ORDER BY event_id""")
    },
    "q62_bitwise" -> { (s, d) =>
      // bitwise aggregates (bit_and/bit_or/bit_xor) + shift/mask scalars
      Tables.register(s, d)
      s.sql("""SELECT l_returnflag,
                 bit_and(l_linenumber) AS b_and,
                 bit_or(l_linenumber) AS b_or,
                 bit_xor(CAST(l_orderkey & 255 AS INT)) AS b_xor,
                 CAST(sum(shiftleft(l_linenumber, 2)) AS BIGINT) AS s_shift
               FROM lineitem
               GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    "q63_setops_all" -> { (s, d) =>
      // multiset set-ops (INTERSECT ALL / EXCEPT ALL — q18/q19 cover the
      // deduplicating set forms); identical SQL both engines
      Tables.register(s, d)
      s.sql("""SELECT l_linenumber, 'both' AS side FROM
                 (SELECT l_linenumber FROM lineitem
                  WHERE l_orderkey % 2 = 0 AND l_orderkey < 2000
                  INTERSECT ALL
                  SELECT l_linenumber FROM lineitem
                  WHERE l_quantity > 10 AND l_orderkey < 2000)
               UNION ALL
               SELECT l_linenumber, 'only_even' AS side FROM
                 (SELECT l_linenumber FROM lineitem
                  WHERE l_orderkey % 2 = 0 AND l_orderkey < 2000
                  EXCEPT ALL
                  SELECT l_linenumber FROM lineitem
                  WHERE l_quantity > 10 AND l_orderkey < 2000)
               ORDER BY side, l_linenumber""")
    },
    "q64_collation" -> { (s, d) =>
      // Spark 4 collations: group case-insensitively via UTF8_LCASE on
      // planted mixed-case values; output canonicalized (lower(min)) so
      // the result is engine-independent — the oracle groups by lower()
      Tables.register(s, d)
      s.sql("""WITH t AS (SELECT CASE WHEN c_custkey % 2 = 0
                   THEN upper(c_mktsegment) ELSE lower(c_mktsegment)
                 END AS seg FROM customer)
               SELECT lower(min(seg)) AS seg_lc, count(*) AS n,
                      count(DISTINCT seg) AS n_variants
               FROM t GROUP BY collate(seg, 'UTF8_LCASE')
               ORDER BY seg_lc""")
    },
    "q65_try_fns" -> { (s, d) =>
      // ANSI-safe try_* error handling: division by zero, bad casts,
      // out-of-bounds array index — NULL instead of runtime failure.
      // The failing-cast arm is 1 row in 10, not half: Spark's TRY cast
      // failure path is exception-based (~20 µs per failing row), so a
      // mostly-failing column would make the error path, not the
      // operator, the benchmark.
      Tables.register(s, d)
      s.sql("""SELECT o_orderkey,
                 try_divide(o_totalprice, o_orderkey % 3) AS td,
                 try_cast(CASE WHEN o_orderkey % 10 = 9
                     THEN substr(o_orderpriority, 3, 3)
                     ELSE substr(CAST(o_orderkey AS STRING), 1, 3)
                   END AS INT) AS tc,
                 try_element_at(array(o_orderkey),
                   CAST(1 + o_orderkey % 3 AS INT)) AS te
               FROM orders ORDER BY o_orderkey""")
    },

    "q66_xml" -> { (s, d) =>
      // XML extraction (Spark 4 from_xml): the fixtures carry no XML, so
      // the gate plants documents-derived XML (attribute + two elements)
      // and the oracle recomputes the extracted fields directly — the
      // same planted-parity device as t12/t13
      Tables.register(s, d)
      s.sql("""SELECT doc_id AS id, x._id AS xid, x.lang AS xlang,
                 x.n AS xn
               FROM (SELECT doc_id,
                       from_xml(
                         concat('<doc id="', doc_id, '"><lang>', lang,
                                '</lang><n>', n_chars, '</n></doc>'),
                         'STRUCT<_id: BIGINT, lang: STRING, n: BIGINT>')
                         AS x
                     FROM documents)
               ORDER BY id""")
    },

    "q67_ignore_nulls" -> { (s, d) =>
      // IGNORE NULLS window variants (last_value/lag/nth_value) — NULLs
      // planted on the value column so the null-skipping semantics bite
      // on every third row; identical SQL both engines
      Tables.register(s, d)
      s.sql("""WITH e AS (SELECT event_id, user_id, ts,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
               FROM events)
               SELECT event_id, user_id,
                 last_value(v) IGNORE NULLS OVER w AS last_v,
                 lag(v) IGNORE NULLS OVER wo AS prev_v,
                 nth_value(v, 2) IGNORE NULLS OVER w AS second_v
               FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wo AS (PARTITION BY user_id ORDER BY ts, event_id)
               ORDER BY event_id""")
    },
    "q68_salted_join" -> { (s, d) =>
      // explicit skew salting end-to-end: the salted (key, salt) join is
      // value-identical to the plain equi-join — the oracle IS the plain
      // join — while the plan splits every hot key saltFactor ways (the
      // knob AQE skew handling can't reach for shuffled-hash/agg shapes)
      val li = Tables(s, d, "lineitem")
        .withColumnRenamed("l_partkey", "partkey")
      val pt = Tables(s, d, "part")
        .withColumnRenamed("p_partkey", "partkey")
        .select(col("partkey"), col("p_brand"))
      graft.ops.Skew.saltedJoin(li, pt, "partkey", saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    },
    "q70_stream_sliding" -> { (s, d) =>
      // sliding-window aggregation (1 h window every 15 min — each event
      // in 4 windows) in batch form; stream form shares the code path
      graft.streaming.EventStreams
        .slidingTypeCounts(Tables(s, d, "events"),
          "1 hour", "15 minutes", "10 minutes")
        .withColumn("total_value", money(col("total_value")))
        .orderBy(col("win_start"), col("event_type"))
    },
    "q69_stream_enrich" -> { (s, d) =>
      // stream-static enrichment (stateless streaming join; see
      // EventStreams.enrich + the stream-vs-batch equivalence spec) in
      // its batch form: every event keeps flowing, dimension misses
      // surface as NULLs
      graft.streaming.EventStreams.enrich(
          Tables(s, d, "events"),
          Tables(s, d, "customer")
            .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
          "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_name"), col("c_nationkey"))
        .orderBy(col("event_id"))
    },

    "q71_null_aware_anti" -> { (s, d) =>
      // NOT IN (subquery): null-aware anti-join semantics — the subquery
      // column is nullable-SCHEMA (planner must use the null-aware plan,
      // BroadcastNestedLoopJoin fallback avoided only when Spark proves
      // null-freeness) while null-free in DATA, so the result is
      // non-trivial; identical SQL both engines
      Tables.register(s, d)
      s.sql("""SELECT c_custkey, c_name FROM customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
               ORDER BY c_custkey""")
    },
    "q72_exists_subquery" -> { (s, d) =>
      // correlated EXISTS + NOT EXISTS in one predicate — both
      // decorrelate to semi/anti joins (plan-pinned in PlanSpec)
      Tables.register(s, d)
      s.sql("""SELECT c_custkey, c_name FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT')
                 AND NOT EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice < 50000)
               ORDER BY c_custkey""")
    },
    "q73_agg_filter" -> { (s, d) =>
      // FILTER (WHERE ...) clause on aggregates — per-branch conditional
      // aggregation without CASE rewrites; one pass, partial-aggregated
      Tables.register(s, d)
      s.sql("""SELECT o_orderpriority,
                 count(*) AS n_all,
                 count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
                 CAST(CAST(sum(o_totalprice)
                     FILTER (WHERE o_orderstatus = 'F') AS DECIMAL(18,2))
                   AS DOUBLE) AS total_f,
                 count(DISTINCT o_custkey)
                   FILTER (WHERE o_orderstatus = 'O') AS custs_o
               FROM orders
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    "q74_values_join" -> { (s, d) =>
      // inline VALUES table as a join dimension (constant-folded,
      // broadcast by construction) — identical SQL both engines
      Tables.register(s, d)
      s.sql("""SELECT t.tier, count(*) AS n_nations
               FROM nation n
               JOIN (VALUES (0, 'west'), (1, 'americas'), (2, 'apac'),
                            (3, 'emea'), (4, 'mideast'))
                 AS t(rk, tier)
                 ON n.n_regionkey = t.rk
               GROUP BY t.tier ORDER BY t.tier""")
    },
    "q75_tuple_in" -> { (s, d) =>
      // multi-column (tuple) IN subquery — decorrelates to a two-key
      // semi join, not a nested-loop filter
      Tables.register(s, d)
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
               WHERE (l_orderkey, l_linenumber) IN
                 (SELECT o_orderkey, 1 FROM orders
                  WHERE o_totalprice > 300000)
               ORDER BY l_orderkey, l_linenumber, l_quantity""")
    },
    "q76_grouping_fns" -> { (s, d) =>
      // GROUPING() introspection over CUBE — how a consumer tells a real
      // NULL group from a rollup row; identical SQL both engines
      Tables.register(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus,
                 CAST(grouping(l_returnflag) AS INT) AS g_rf,
                 CAST(grouping(l_linestatus) AS INT) AS g_ls,
                 count(*) AS n
               FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
               ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST""")
    },

    "q77_distinct_on" -> { (s, d) =>
      // "latest row per key" — DuckDB spells it DISTINCT ON; Spark's
      // idiom is the rank-1 window (row_number, filter, drop), which
      // plans as one keyed Window over one exchange
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    "q78_execute_immediate" -> { (s, d) =>
      // Spark 4 session variables + EXECUTE IMMEDIATE: the dynamic-SQL
      // surface a serving layer uses for parameterized templates; the
      // variable binds via USING, the statement text is data
      Tables.register(s, d)
      s.sql("DECLARE OR REPLACE VARIABLE graft_min_qty INT DEFAULT 45")
      s.sql("SET VAR graft_min_qty = 48")
      s.sql("""EXECUTE IMMEDIATE
        'SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem WHERE l_quantity >= ? GROUP BY l_returnflag
         ORDER BY l_returnflag' USING graft_min_qty""")
    },

    // --- introspection (shape-checked only, like the reference:
    //     tests/test_executor.py:437-453) --------------------------------
    "s1_explain" -> { (s, d) => s.sql("EXPLAIN SELECT 1") },
    "s2_describe" -> { (s, d) =>
      Tables.register(s, d); s.sql("DESCRIBE lineitem")
    },
    "s3_show_tables" -> { (s, d) =>
      Tables.register(s, d); s.sql("SHOW TABLES")
    }
  )

  /** DuckDB-dialect oracle SQL (column names/types matched to the Spark
    * output; the driver sorts columns by name before hashing). */
  val oracle: Map[String, String] = Map(
    "q01_scan_filter" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber, l_quantity",
    "q02_inner_join" ->
      "SELECT o.o_orderkey, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE o.o_orderstatus = 'F' ORDER BY o.o_orderkey",
    "q03_left_join_agg" ->
      "SELECT c.c_custkey, count(o.o_orderkey) AS n FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey ORDER BY c.c_custkey",
    "q04_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000) ORDER BY c_custkey",
    "q05_anti_join" ->
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey) ORDER BY c_custkey",
    "q06_three_way_join" ->
      "SELECT r.r_name, n.n_name, count(*) AS n FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name",
    "q07_groupby_agg" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(CAST(sum(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS total, CAST(CAST(avg(l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS avg_disc, min(l_quantity) AS minq, max(l_quantity) AS maxq FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q08_distinct_agg" ->
      "SELECT o_orderstatus, count(DISTINCT o_custkey) AS custs FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q09_rollup" ->
      "SELECT n_regionkey, n_nationkey, count(*) AS n FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey) ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST",
    "q10_cube" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q11_grouping_sets" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q12_having" ->
      "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey",
    "q13_window_rank" ->
      "SELECT c_custkey, c_acctbal, CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn, CAST(rank() OVER wb AS INTEGER) AS rk, CAST(dense_rank() OVER wb AS INTEGER) AS drk FROM customer WINDOW wb AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) ORDER BY c_custkey",
    "q14_window_analytic" ->
      "SELECT o_orderkey, o_custkey, lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key, CAST(CAST(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS run2 FROM orders ORDER BY o_custkey, o_orderkey",
    "q15_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q16_offset" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 250",
    "q17_union_all" ->
      "SELECT n_name AS name FROM nation UNION ALL SELECT r_name FROM region ORDER BY name",
    "q18_intersect" ->
      "SELECT n_regionkey AS k FROM nation INTERSECT SELECT r_regionkey FROM region ORDER BY k",
    "q19_except" ->
      "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    "q20_cte" ->
      "WITH big AS (SELECT o_custkey, CAST(CAST(sum(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS spend FROM orders GROUP BY o_custkey) SELECT c.c_name, b.spend FROM big b JOIN customer c ON c.c_custkey = b.o_custkey WHERE b.spend > 200000 ORDER BY c.c_name",
    "q21_correlated_subquery" ->
      "SELECT c_custkey, (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n FROM customer c ORDER BY c_custkey",
    "q22_string_fns" ->
      "SELECT p_partkey, upper(substr(p_name, 1, 5)) AS pfx, CAST(length(p_name) AS INTEGER) AS len, replace(p_brand, '#', '-') AS brand2, concat(p_type, '/', p_brand) AS tb FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey",
    "q23_regexp" ->
      "SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS w FROM part ORDER BY p_partkey",
    "q24_date_fns" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m, CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart, CAST(date_diff('day', DATE '2026-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dd FROM orders ORDER BY o_orderkey",
    "q25_math_fns" ->
      "SELECT l_orderkey, l_linenumber, round(l_quantity / 2, 1) AS r1, abs(l_discount - 0.05) AS a, CAST(ceil(l_quantity) AS BIGINT) AS c, CAST(floor(l_tax * 100) AS BIGINT) AS f, l_orderkey % 7 AS m, sqrt(l_quantity) AS sq FROM lineitem ORDER BY l_orderkey, l_linenumber, r1, a, f LIMIT 500",
    "q26_case_coalesce" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice > 150000 THEN 'hi' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'lo' END AS bucket, coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st FROM orders ORDER BY o_orderkey",
    "q27_cast_matrix" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qi, CAST(l_orderkey AS VARCHAR) AS ks, CAST(CAST(l_discount AS DECIMAL(8,4)) AS DOUBLE) AS dd FROM lineitem ORDER BY l_orderkey, l_linenumber, qi, dd LIMIT 200",
    "q28_array_fns" ->
      "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, embedding[1] AS e1 FROM embeddings ORDER BY vec_id",
    "q29_approx_distinct" ->
      // the oracle's verdict is the literal TRUE the Spark side must earn:
      // if the HLL estimate drifts past ±5 % of exact, within_tol flips
      // false and the row hash mismatches
      "SELECT count(DISTINCT l_partkey) AS exact_nd, TRUE AS within_tol FROM lineitem",
    "q30_events_agg" ->
      "SELECT event_type, count(*) AS n, CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS sv, CAST(min(ts) AS DATE) AS first_day FROM events GROUP BY event_type ORDER BY event_type",
    "q33_recursive_cte" ->
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100) SELECT CAST(n AS INTEGER) AS n, CAST(n * n AS INTEGER) AS sq FROM t ORDER BY n",
    "q34_range_generator" ->
      "SELECT range AS i, range % 7 AS m FROM range(0, 1000) ORDER BY i",
    "q42_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q44_stat_aggs" ->
      "SELECT l_returnflag, CAST(CAST(stddev_samp(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS sd_q, CAST(CAST(var_samp(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS var_q, CAST(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(18,6)) AS DOUBLE) AS corr_qp, CAST(CAST(covar_samp(l_quantity, l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS cov_qd FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q45_string_agg" ->
      "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names, count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "q46_window_distribution" ->
      "SELECT c_custkey, c_nationkey, CAST(ntile(4) OVER w AS INT) AS quartile, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey",
    "q47_lateral_explode" ->
      "SELECT p_partkey, CAST(t.i - 1 AS INT) AS pos, sp[t.i] AS word FROM (SELECT p_partkey, string_split(p_name, ' ') AS sp FROM part), LATERAL (SELECT unnest(generate_series(1, len(sp))) AS i) t ORDER BY p_partkey, pos",
    "q48_conditional_aggs" ->
      "SELECT o_orderstatus, CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big, bool_and(o_totalprice > 0.0) AS all_pos, bool_or(o_orderpriority = '1-URGENT') AS any_urgent, arg_max(o_orderpriority, o_orderkey) AS last_prio, arg_min(o_orderpriority, o_orderkey) AS first_prio FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q43_scalar_subquery" ->
      "SELECT o_orderkey, CAST(CAST((SELECT max(o_totalprice) FROM orders) AS DECIMAL(18,2)) AS DOUBLE) AS max_price FROM orders ORDER BY o_orderkey LIMIT 100",
    "q40_pivot" ->
      "SELECT l_returnflag, CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F, CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q41_unpivot" ->
      "SELECT l_orderkey, l_linenumber, measure, val FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem) UNPIVOT (val FOR measure IN (l_quantity, l_discount)) ORDER BY l_orderkey, l_linenumber, measure, val LIMIT 400",
    "q39_percentile" ->
      "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med, quantile_cont(l_quantity, 0.9) AS p90 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q38_range_join" ->
      "SELECT n.n_nationkey, count(*) AS n_cust FROM customer c JOIN (SELECT n_nationkey, n_nationkey * 400 AS lo, n_nationkey * 400 + 399 AS hi FROM nation) n ON c.c_acctbal >= n.lo AND c.c_acctbal <= n.hi GROUP BY n.n_nationkey ORDER BY n.n_nationkey",
    "q36_array_lambdas" ->
      "SELECT vec_id, CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos, list_transform(embedding, x -> -x)[1] AS neg1, embedding[4] AS head4_last FROM embeddings ORDER BY vec_id",
    "q37_struct_fns" ->
      "SELECT event_id, event_type AS ev_t, value AS ev_v FROM events WHERE value > 150 ORDER BY event_id",
    "q35_json_fns" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 = 0 ORDER BY event_id",
    "q31_stream_window_agg" ->
      "SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS win_start, time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS win_end, event_type, count(*) AS n, CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS total_value FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type",
    // Spark session_window as gaps-and-islands: a session breaks when the
    // gap to the previous event is >= 30 min; session end = last ts + gap.
    "q32_stream_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         s AS (SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid FROM s)
         SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
                user_id, count(*) AS n_events,
                CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS session_value
         FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q53_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
         CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS total_value,
         date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP))) AS last_ts
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q57_stateful_breakdown" ->
      """SELECT user_id, event_type, count(*) AS n,
         CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",
    "q54_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(CAST(sum(value) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS mv_1h,
         count(*) OVER w AS n_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q55_lateral_subquery" ->
      """SELECT n.n_name, t.c_name, t.bal
         FROM nation n,
         LATERAL (SELECT c_name,
                    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
                  FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY bal DESC, c_name LIMIT 2) t
         ORDER BY n.n_name, t.bal DESC, t.c_name""",
    "q56_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         min(l_quantity) AS minq
         FROM lineitem GROUP BY ALL
         ORDER BY l_returnflag, l_linestatus""",
    // dedup of the self-unioned feed = exactly the original table
    "q58_stream_dedup" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
         value, props
         FROM events ORDER BY event_id""",
    "q59_nullsafe_join" ->
      """SELECT a.k, a.na, b.nb
         FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderkey % 5 END AS k,
                      count(*) AS na
               FROM orders GROUP BY 1) a
         JOIN (SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL
                        ELSE c_custkey % 5 END AS k,
                      count(*) AS nb
               FROM customer GROUP BY 1) b
         ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY a.k NULLS FIRST""",
    // the relational effect of the map pipeline: doubled values per line,
    // per-order count of quantities the map_filter kept
    "q60_map_fns" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
           sum(l_quantity) AS l_quantity
           FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY 1, 2)
         SELECT l_orderkey,
         CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_big,
         l_linenumber AS ln, l_quantity * 2 AS q2
         FROM li ORDER BY l_orderkey, ln""",
    "q61_variant" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
         ORDER BY event_id""",
    "q62_bitwise" ->
      """SELECT l_returnflag,
         bit_and(l_linenumber) AS b_and,
         bit_or(l_linenumber) AS b_or,
         bit_xor(CAST(l_orderkey & 255 AS INT)) AS b_xor,
         CAST(sum(l_linenumber << 2) AS BIGINT) AS s_shift
         FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q63_setops_all" ->
      """SELECT l_linenumber, 'both' AS side FROM
           (SELECT l_linenumber FROM lineitem
            WHERE l_orderkey % 2 = 0 AND l_orderkey < 2000
            INTERSECT ALL
            SELECT l_linenumber FROM lineitem
            WHERE l_quantity > 10 AND l_orderkey < 2000)
         UNION ALL
         SELECT l_linenumber, 'only_even' AS side FROM
           (SELECT l_linenumber FROM lineitem
            WHERE l_orderkey % 2 = 0 AND l_orderkey < 2000
            EXCEPT ALL
            SELECT l_linenumber FROM lineitem
            WHERE l_quantity > 10 AND l_orderkey < 2000)
         ORDER BY side, l_linenumber""",
    // the collation group is exactly the lower() group on this data —
    // the engine-independent canonical form
    "q64_collation" ->
      """WITH t AS (SELECT CASE WHEN c_custkey % 2 = 0
             THEN upper(c_mktsegment) ELSE lower(c_mktsegment)
           END AS seg FROM customer)
         SELECT lower(min(seg)) AS seg_lc, count(*) AS n,
                count(DISTINCT seg) AS n_variants
         FROM t GROUP BY lower(seg)
         ORDER BY seg_lc""",
    // the salted join is value-identical to the plain equi-join — sums
    // of small-integer-valued doubles are exact, so no decimal rounding
    // guard is needed
    "q68_salted_join" ->
      """SELECT p.p_brand, count(*) AS n, sum(l.l_quantity) AS sum_qty
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_brand ORDER BY p.p_brand""",
    "q69_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type,
           c.c_name, c.c_nationkey
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",
    // each event expands to its 4 overlapping windows (1 h / 15 min,
    // epoch-aligned in both engines)
    "q70_stream_sliding" ->
      """WITH x AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
           FROM events),
         w AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts)
               - CAST(i AS INT) * INTERVAL 15 MINUTE AS win_start,
               event_type, value
           FROM x, (SELECT unnest(range(0, 4)) AS i))
         SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end,
           event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
         FROM w GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",
    // DuckDB: x/0 is NULL (no try_divide needed), TRY_CAST matches, and
    // out-of-bounds list indexing is NULL
    "q71_null_aware_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
         ORDER BY c_custkey""",
    "q72_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 50000)
         ORDER BY c_custkey""",
    "q73_agg_filter" ->
      """SELECT o_orderpriority,
         count(*) AS n_all,
         count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
         CAST(CAST(sum(o_totalprice)
             FILTER (WHERE o_orderstatus = 'F') AS DECIMAL(18,2))
           AS DOUBLE) AS total_f,
         count(DISTINCT o_custkey)
           FILTER (WHERE o_orderstatus = 'O') AS custs_o
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q74_values_join" ->
      """SELECT t.tier, count(*) AS n_nations
         FROM nation n
         JOIN (VALUES (0, 'west'), (1, 'americas'), (2, 'apac'),
                      (3, 'emea'), (4, 'mideast')) AS t(rk, tier)
           ON n.n_regionkey = t.rk
         GROUP BY t.tier ORDER BY t.tier""",
    "q76_grouping_fns" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(grouping(l_returnflag) AS INT) AS g_rf,
         CAST(grouping(l_linestatus) AS INT) AS g_ls,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
           l_linestatus NULLS FIRST""",
    // DuckDB's native DISTINCT ON vs Spark's rank-1 window: same rows
    // (first per custkey under date DESC, key ASC)
    "q77_distinct_on" ->
      """SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_orderdate, o_totalprice
         FROM orders
         ORDER BY o_custkey, o_orderdate DESC, o_orderkey""",
    // the EXECUTE IMMEDIATE template with the variable inlined
    "q78_execute_immediate" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem WHERE l_quantity >= 48 GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    // dialect split: DuckDB spells the tuple with an explicit ROW
    // constructor (bare (a, b) IN (subquery) binds as single-column there)
    "q75_tuple_in" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE ROW(l_orderkey, l_linenumber) IN
           (SELECT ROW(o_orderkey, 1) FROM orders WHERE o_totalprice > 300000)
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q67_ignore_nulls" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
         FROM events)
         SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER w AS last_v,
           lag(v IGNORE NULLS) OVER wo AS prev_v,
           nth_value(v, 2 IGNORE NULLS) OVER w AS second_v
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wo AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    // planted-parity: the oracle recomputes the XML-extracted fields
    // from the same source columns
    "q66_xml" ->
      """SELECT doc_id AS id, doc_id AS xid, lang AS xlang,
         n_chars AS xn
         FROM documents ORDER BY id""",
    "q65_try_fns" ->
      """SELECT o_orderkey,
         o_totalprice / (o_orderkey % 3) AS td,
         TRY_CAST(CASE WHEN o_orderkey % 10 = 9
             THEN substr(o_orderpriority, 3, 3)
             ELSE substr(CAST(o_orderkey AS VARCHAR), 1, 3)
           END AS INTEGER) AS tc,
         ([o_orderkey])[CAST(1 + o_orderkey % 3 AS INT)] AS te
         FROM orders ORDER BY o_orderkey""",
    "q49_interval_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.ts, count(*) AS n_matches,
                CAST(CAST(max(c.value) AS DECIMAL(18,2)) AS DOUBLE) AS max_value
         FROM p JOIN c ON p.user_id = c.user_id
           AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         GROUP BY p.event_id, p.user_id, p.ts
         ORDER BY p.event_id""",
    // left-outer twin of q49: count(c.user_id) so null-joined rows count 0
    "q79_interval_join_outer" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.ts,
                count(c.user_id) AS n_matches,
                CAST(CAST(max(c.value) AS DECIMAL(18,2)) AS DOUBLE) AS max_value
         FROM p LEFT JOIN c ON p.user_id = c.user_id
           AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         GROUP BY p.event_id, p.user_id, p.ts
         ORDER BY p.event_id""",
    // like q29: the oracle's TRUE is the verdict the Spark side must earn
    "q50_hll_union" ->
      "SELECT count(DISTINCT l_partkey) AS exact_nd, TRUE AS within_tol FROM lineitem",
    "q51_apx_quantile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med,
         TRUE AS within_tol FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    // the bloom prefilter must be invisible in the result
    "q52_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(CAST(sum(l_quantity) AS DECIMAL(18,2)) AS DOUBLE) AS sq
         FROM lineitem WHERE l_partkey IN
           (SELECT p_partkey FROM part WHERE p_size = 1)
         GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
