package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core relational operator surface declared in SURVEY.md §2.3.
  *
  * Every query is expressed declaratively with the DataFrame API so Catalyst
  * gets full freedom: filter/projection pushdown into the parquet scan, join
  * strategy selection (broadcast for the small dimension tables), partial
  * aggregation, and AQE re-planning at runtime. Shuffles only appear where
  * the semantics require them (groupBy keys, shuffle joins, global sorts).
  *
  * Scale notes are inline per query: each plan is the one we would want on a
  * 1000-executor cluster at 100 TB, not just the first one that passes.
  */
object CoreRelational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Timestamp literal parsed in the UTC session zone (oracle parity). */
  private def ts(v: String): Column = to_timestamp(lit(v))

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Aggregation: TPC-H Q1 shape. Hash aggregate with map-side partial
    // agg; only 6 of 11 lineitem columns are read (column pruning) and the
    // shipdate predicate is pushed to the parquet scan. Grouping key
    // cardinality is tiny (<=6) so the shuffle is negligible at any scale.
    QueryDef.sql(
      "q01_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
    },

    // ------------------------------------------------------------------
    // Projection with expression arithmetic. Narrow (no shuffle besides the
    // top-k sort, which TakeOrderedAndProject keeps bounded).
    QueryDef.sql(
      "q02_project_revenue",
      """SELECT l_orderkey,
        |  round(l_extendedprice*(1-l_discount),4) AS rev
        |FROM lineitem
        |ORDER BY l_orderkey ASC, rev ASC LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("rev"))
        .orderBy(col("l_orderkey").asc, col("rev").asc)
        .limit(100)
    },

    // ------------------------------------------------------------------
    // Filter: TPC-H Q6 shape — all predicates pushed to the parquet scan
    // (PushedFilters), result is a single global aggregate (no groupBy
    // shuffle; partial agg per partition + final reduce).
    QueryDef.sql(
      "q03_filter_forecast_revenue",
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ------------------------------------------------------------------
    // Safe cast (ref: n5_to_tif.py:28 astype casting='safe'). floor() before
    // the narrowing cast keeps Spark (truncating) and DuckDB (rounding)
    // double->int semantics identical.
    QueryDef.sql(
      "q04_cast_safe",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(l_linenumber AS BIGINT) AS ln_big,
        |  CAST(l_returnflag = 'R' AS INTEGER) AS is_return
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, qty_int ASC, ln_big ASC,
        |  is_return ASC LIMIT 500""".stripMargin) { (s, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus, so
      // the LIMIT cut must be under a total order over ALL output columns.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_linenumber").cast("long").as("ln_big"),
          (col("l_returnflag") === "R").cast("int").as("is_return"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("qty_int").asc, col("ln_big").asc, col("is_return").asc)
        .limit(500)
    },

    // ------------------------------------------------------------------
    // Broadcast hash join: nation is tiny and explicitly broadcast — at
    // 100 TB the fact side streams through without any shuffle.
    QueryDef.sql(
      "q05_join_broadcast",
      """SELECT n_name, count(*) AS c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("c"))
        .orderBy(col("n_name").asc)
    },

    // ------------------------------------------------------------------
    // Multi-way shuffle join: TPC-H Q3 shape. customer is broadcast-sized
    // relative to orders/lineitem; orders<->lineitem co-shuffle on orderkey.
    // Filters applied before the join so the shuffle moves minimal rows.
    QueryDef.sql(
      "q06_join_shipping_priority",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC, o_orderdate ASC,
        |  o_orderpriority ASC
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-06-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-06-01"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc,
          col("o_orderdate").asc, col("o_orderpriority").asc)
        .limit(10)
    },

    // ------------------------------------------------------------------
    // Left outer join; (c_custkey, o_orderkey) is a unique key so the
    // order+limit is total.
    QueryDef.sql(
      "q07_join_left_outer",
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |LIMIT 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
        .limit(1000)
    },

    // ------------------------------------------------------------------
    // Full outer join over pre-aggregated sides (aggregate first so the
    // full-outer shuffle moves one row per nation, not per customer).
    QueryDef.sql(
      "q08_join_full_outer",
      """SELECT coalesce(cn.nk, sn.nk) AS nationkey, cn.nc AS nc, sn.ns AS ns
        |FROM (SELECT c_nationkey AS nk, count(*) AS nc
        |      FROM customer GROUP BY c_nationkey) cn
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, count(*) AS ns
        |      FROM supplier GROUP BY s_nationkey) sn
        |ON cn.nk = sn.nk
        |ORDER BY nationkey ASC NULLS FIRST, nc ASC NULLS FIRST,
        |  ns ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("nc"))
      val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("ns"))
      cn.join(sn, cn("nk") === sn("nk"), "full_outer")
        .select(coalesce(cn("nk"), sn("nk")).as("nationkey"),
          col("nc"), col("ns"))
        .orderBy(col("nationkey").asc_nulls_first, col("nc").asc_nulls_first,
          col("ns").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // Left semi join (EXISTS).
    QueryDef.sql(
      "q09_join_semi",
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey").asc)
    },

    // ------------------------------------------------------------------
    // Left anti join (NOT EXISTS) — customers with no orders.
    QueryDef.sql(
      "q10_join_anti",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey").asc)
    },

    // ------------------------------------------------------------------
    // Theta (non-equi) join. The naive plan is a BroadcastNestedLoopJoin
    // with O(|part|*|supplier|) comparisons — quadratic if both sides grow.
    // Scale-safe formulation: the predicate only depends on supplier via
    // s_suppkey % 50, so pre-aggregate supplier to a 50-row (m, cnt)
    // dimension; the nested loop is then |part| x 50 and the broadcast side
    // is CONSTANT-sized no matter how large supplier grows.
    QueryDef.sql(
      "q11_join_theta",
      """SELECT count(*) AS n
        |FROM part p JOIN supplier s ON p.p_size < s.s_suppkey % 50""".stripMargin) { (s, dir) =>
      val mods = t(s, dir, "supplier")
        .groupBy((col("s_suppkey") % 50).as("m"))
        .agg(count(lit(1)).as("cnt"))
      t(s, dir, "part")
        .join(broadcast(mods), col("p_size") < col("m"))
        // coalesce: count(*) over zero matches is 0, never NULL
        .agg(coalesce(sum(col("cnt")), lit(0L)).cast("long").as("n"))
    },

    // ------------------------------------------------------------------
    // As-of join: latest click at-or-before each purchase, per user.
    // Implemented scalably as a union + single window pass (one shuffle by
    // user_id, O(n log n) within partition) instead of the O(n^2) range
    // join the naive SQL implies. At 100 TB this is the only formulation
    // that survives: no row explosion, state bounded by partition sort.
    QueryDef.sql(
      "q12_join_asof",
      """SELECT p.event_id, max(c.ts) AS last_click_ts
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id
        |ORDER BY p.event_id ASC""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        // clicks sort before purchases at equal ts, so "<=" semantics hold
        .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
      // skew-safe bucketed carry-forward (graft.operators.AsOf): window
      // partitions are bounded by (user, day), so one pathological hot
      // user cannot serialize into a single task; equivalence with the
      // naive partitionBy(user_id) window is pinned in AsOfSpec
      graft.operators.AsOf.lastNonNullOver(ev, "user_id", "ts",
        Seq(col("ts"), col("is_purchase"), col("event_id")),
        when(col("event_type") === "click", col("ts")),
        "last_click_ts", bucketSeconds = 86400L)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("last_click_ts"))
        .orderBy(col("event_id").asc)
    },

    // ------------------------------------------------------------------
    // COUNT(DISTINCT): two-phase distinct aggregate (partial distinct per
    // partition, exact merge) — no driver-side collection.
    QueryDef.sql(
      "q13_count_distinct",
      "SELECT count(DISTINCT o_custkey) AS n FROM orders") { (s, dir) =>
      t(s, dir, "orders").agg(countDistinct(col("o_custkey")).as("n"))
    },

    // ------------------------------------------------------------------
    // ROLLUP grouping sets.
    QueryDef.sql(
      "q14_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity),4) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // CUBE grouping sets.
    QueryDef.sql(
      "q15_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // collect_list made deterministic with sort_array. The list is
    // serialized to a '|'-joined string so the oracle harness compares
    // scalars (array cells are unhashable/unsortable driver-side).
    QueryDef.sql(
      "q16_collect_list",
      """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), '|') AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), "|").as("names"))
        .orderBy(col("n_regionkey").asc)
    },

    // ------------------------------------------------------------------
    // Ranking window: top-3 orders per customer. The window shuffle
    // partitions by o_custkey; at scale this is one exchange and a bounded
    // per-key sort.
    QueryDef.sql(
      "q17_window_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) q
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC, rn ASC, o_orderkey ASC""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey").asc, col("rn").asc, col("o_orderkey").asc)
    },

    // ------------------------------------------------------------------
    // Analytic window: lag / lead / first_value with explicit frame.
    QueryDef.sql(
      "q18_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_price"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    },

    // ------------------------------------------------------------------
    // Running-sum window frame over the events stream table.
    QueryDef.sql(
      "q19_window_running_sum",
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running
        |FROM events
        |ORDER BY user_id ASC, event_id ASC""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 4).as("running"))
        .orderBy(col("user_id").asc, col("event_id").asc)
    },

    // ------------------------------------------------------------------
    // RANGE BETWEEN frame keyed on a numeric column.
    QueryDef.sql(
      "q20_window_range_frame",
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_nearby
        |FROM orders
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey").asc)
        .rangeBetween(-100, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_nearby"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    },

    // ------------------------------------------------------------------
    // UNION (distinct) — set semantics.
    QueryDef.sql(
      "q21_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk").asc)
    },

    // ------------------------------------------------------------------
    // UNION ALL with a follow-up aggregate (bag semantics preserved).
    QueryDef.sql(
      "q22_union_all",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier) u
        |GROUP BY nk ORDER BY nk ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
        .orderBy(col("nk").asc)
    },

    // ------------------------------------------------------------------
    // INTERSECT (distinct).
    QueryDef.sql(
      "q23_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk").asc)
    },

    // ------------------------------------------------------------------
    // EXCEPT (distinct).
    QueryDef.sql(
      "q24_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk").asc)
    },

    // ------------------------------------------------------------------
    // Exact row dedup (DISTINCT on a projection).
    QueryDef.sql(
      "q25_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .dropDuplicates()
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
    },

    // ------------------------------------------------------------------
    // String scalar function family. Lengths cast to BIGINT on the Spark
    // side to match DuckDB's natural integer width.
    QueryDef.sql(
      "q26_string_functions",
      """SELECT upper(substring(n_name,1,3)) AS pre,
        |  CAST(length(n_name) AS BIGINT) AS len,
        |  concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR)) AS cat,
        |  lpad(n_name, 12, '_') AS pad,
        |  replace(n_name, '_', '-') AS rep,
        |  trim(lower(n_name)) AS low,
        |  regexp_extract(n_name, '([0-9]+)', 1) AS num,
        |  CAST(n_name LIKE 'NATION%' AS INTEGER) AS is_nation
        |FROM nation
        |ORDER BY pre ASC, len ASC, cat ASC, pad ASC, rep ASC, low ASC,
        |  num ASC, is_nation ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .select(
          upper(substring(col("n_name"), 1, 3)).as("pre"),
          length(col("n_name")).cast("long").as("len"),
          concat_ws("-", col("n_name"), col("n_regionkey").cast("string")).as("cat"),
          lpad(col("n_name"), 12, "_").as("pad"),
          regexp_replace(col("n_name"), "_", "-").as("rep"),
          trim(lower(col("n_name"))).as("low"),
          regexp_extract(col("n_name"), "([0-9]+)", 1).as("num"),
          col("n_name").like("NATION%").cast("int").as("is_nation"))
        .orderBy(col("pre").asc, col("len").asc, col("cat").asc, col("pad").asc,
          col("rep").asc, col("low").asc, col("num").asc, col("is_nation").asc)
    },

    // ------------------------------------------------------------------
    // Date/time scalar family + monthly aggregate.
    QueryDef.sql(
      "q27_date_trunc_month",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
        |  count(*) AS n,
        |  round(sum(o_totalprice),4) AS total
        |FROM orders GROUP BY m ORDER BY m ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy(col("m").asc)
    },

    QueryDef.sql(
      "q28_date_scalar",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
        |    AS INTEGER) AS days_since,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
        |FROM orders
        |ORDER BY o_orderkey ASC LIMIT 500""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("d"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("unix_ts"))
        .orderBy(col("o_orderkey").asc)
        .limit(500)
    },

    // ------------------------------------------------------------------
    // Math scalar family — per-row (no float-accumulation ambiguity).
    QueryDef.sql(
      "q29_math_scalar",
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(abs(l_extendedprice)),4) AS r_sqrt,
        |  CAST(floor(l_quantity) AS BIGINT) AS fl,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |  round(pow(l_discount, 2),6) AS p2,
        |  round(ln(l_quantity + 1),4) AS lg,
        |  round(exp(l_discount),4) AS ex,
        |  l_orderkey % 7 AS m7
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, r_sqrt ASC, fl ASC,
        |  ce ASC, p2 ASC, lg ASC, ex ASC, m7 ASC LIMIT 500""".stripMargin) { (s, dir) =>
      // Total order over all output columns: (l_orderkey, l_linenumber) has
      // duplicates in the synthetic corpus, so the LIMIT needs every column.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sqrt(abs(col("l_extendedprice"))), 4).as("r_sqrt"),
          floor(col("l_quantity")).as("fl"),
          ceil(col("l_quantity")).as("ce"),
          round(pow(col("l_discount"), 2), 6).as("p2"),
          round(log(col("l_quantity") + 1), 4).as("lg"),
          round(exp(col("l_discount")), 4).as("ex"),
          (col("l_orderkey") % 7).as("m7"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("r_sqrt").asc, col("fl").asc, col("ce").asc, col("p2").asc,
          col("lg").asc, col("ex").asc, col("m7").asc)
        .limit(500)
    },

    // ------------------------------------------------------------------
    // Array scalar family incl. higher-order aggregate fold over the
    // embedding column (sequential fold in both engines -> bitwise equal).
    QueryDef.sql(
      "q30_array_functions",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS n,
        |  round(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b),4)
        |    AS sumsq,
        |  CAST(embedding[1] AS DOUBLE) AS h1,
        |  CAST(embedding[2] AS DOUBLE) AS h2,
        |  CAST(embedding[3] AS DOUBLE) AS h3,
        |  round(CAST(list_aggregate(embedding, 'max') AS DOUBLE),4) AS maxv
        |FROM embeddings
        |ORDER BY vec_id ASC LIMIT 200""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("n"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("sumsq"),
          element_at(col("embedding"), 1).cast("double").as("h1"),
          element_at(col("embedding"), 2).cast("double").as("h2"),
          element_at(col("embedding"), 3).cast("double").as("h3"),
          round(array_max(col("embedding")).cast("double"), 4).as("maxv"))
        .orderBy(col("vec_id").asc)
        .limit(200)
    },

    // ------------------------------------------------------------------
    // JSON extraction over events.props (ref: attrs JSON handling,
    // n5_multiscale.py:82).
    QueryDef.sql(
      "q31_json_extract",
      """SELECT json_extract_string(props, '$.k') AS k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS ki,
        |  count(*) AS n
        |FROM events
        |GROUP BY k, ki
        |ORDER BY k ASC NULLS FIRST, ki ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").as("k"))
        .withColumn("ki", col("k").cast("int"))
        .groupBy(col("k"), col("ki")).agg(count(lit(1)).as("n"))
        .orderBy(col("k").asc_nulls_first, col("ki").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // Pivot (conditional aggregation): event counts per user by type.
    QueryDef.sql(
      "q32_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id").asc)
    },

    // ------------------------------------------------------------------
    // Correlated scalar subquery shape: customers above their nation's
    // average balance (expressed join-style for Spark, subquery for DuckDB).
    QueryDef.sql(
      "q33_above_nation_avg",
      """SELECT c_custkey, round(c_acctbal,4) AS bal
        |FROM customer c
        |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS ab
        |      FROM customer GROUP BY c_nationkey) n
        |  ON c.c_nationkey = n.nk
        |WHERE c.c_acctbal > n.ab
        |ORDER BY c_custkey ASC""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val avgs = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("ab"))
      c.join(broadcast(avgs), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("ab"))
        .select(col("c_custkey"), round(col("c_acctbal"), 4).as("bal"))
        .orderBy(col("c_custkey").asc)
    },

    // ------------------------------------------------------------------
    // Global sort with multi-key + nulls discipline and top-k. Spark plans
    // TakeOrderedAndProject: no full global sort materialization at scale.
    QueryDef.sql(
      "q34_topk_sort",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderpriority ASC, o_orderkey ASC
        |LIMIT 25""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderpriority").asc,
          col("o_orderkey").asc)
        .limit(25)
    },

    // ------------------------------------------------------------------
    // HAVING / post-aggregation filter.
    QueryDef.sql(
      "q35_having",
      """SELECT o_custkey, count(*) AS n
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 12)
        .orderBy(col("o_custkey").asc)
    },

    // ------------------------------------------------------------------
    // CASE WHEN / conditional expressions.
    QueryDef.sql(
      "q36_case_when",
      """SELECT
        |  CASE WHEN o_totalprice >= 150000 THEN 'high'
        |       WHEN o_totalprice >= 50000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  o_orderstatus,
        |  count(*) AS n, round(avg(o_totalprice),4) AS avg_price
        |FROM orders
        |GROUP BY bucket, o_orderstatus
        |ORDER BY bucket ASC, o_orderstatus ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") >= 150000, "high")
            .when(col("o_totalprice") >= 50000, "mid")
            .otherwise("low"))
        .groupBy(col("bucket"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
        .orderBy(col("bucket").asc, col("o_orderstatus").asc)
    },

    // ------------------------------------------------------------------
    // explode / posexplode generator over array data.
    QueryDef.sql(
      "q37_explode",
      """SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS pos, round(u.x, 6) AS v
        |FROM (SELECT vec_id,
        |        unnest(list_transform(embedding,
        |          (x, i) -> {'i': i, 'x': CAST(x AS DOUBLE)})) AS u
        |      FROM embeddings WHERE vec_id < 5)
        |ORDER BY vec_id ASC, pos ASC""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x").cast("double"), 6).as("v"))
        .orderBy(col("vec_id").asc, col("pos").asc)
    },

    // ------------------------------------------------------------------
    // SIX-WAY STAR JOIN (r11; TPC-H Q5 shape) — the canonical
    // plan-quality probe: two fact tables (orders, lineitem) against a
    // four-deep dimension chain (customer → nation → region, supplier)
    // with the "local supplier" condition (c_nationkey = s_nationkey)
    // that makes join ORDER matter. The plan is declared flat and
    // Catalyst does the work: the region/nation filters cascade down
    // the dimension chain, the date range pushes into the orders scan,
    // the small sides broadcast (pinned in PlanAuditSpec), and the only
    // shuffles are the two fact-fact/fact-dim hash joins plus the final
    // 5-group aggregate. At 100 TB the same declaration holds — AQE
    // re-plans the broadcast thresholds; nothing here hand-schedules.
    QueryDef.sql(
      "q131_star_join_q5",
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1999-01-01"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }
  )
}
