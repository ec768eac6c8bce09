package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.{QueryDef, Tables}

/** Relational operator coverage (SURVEY.md §2-B/C/D/E/F) mapped onto the
  * driver testdata star schema, each with a DuckDB oracle.
  *
  * Determinism rules shared with the oracles:
  *  - money/double sums go through `cents` (round(x*100) → BIGINT) so the
  *    aggregation is exact integer math — immune to fp summation order;
  *  - every query ends with a total ORDER BY mirrored in the oracle;
  *  - timestamps are exported as epoch seconds (BIGINT).
  */
object Relational {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // AS-OF JOIN (temporal join Spark lacks natively; DuckDB has it as
    // a primitive, which makes a perfect oracle): each event matches
    // the LATEST order by the same customer with o_orderdate <= ts.
    // Implementation is the scalable union + carry-forward-window form:
    // tag both sides, ONE shuffle on the key, last(ignoreNulls) over an
    // unbounded-preceding window ordered by (time, side) — no
    // range-explode, no per-row subquery, linear per key. The right
    // side is deduped to max orderkey per (custkey, date) so ties are
    // deterministic on both engines.
    QueryDef(
      "q_asof_join",
      (s, d) => {
        val orders = Tables.t(s, d, "orders")
          .groupBy(col("o_custkey").as("k"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("t"))
          .agg(max(col("o_orderkey")).as("ok"))
          .select(col("k"), col("t"), lit(null).cast("long").as("event_id"),
            lit(0).as("m"), col("ok"))
        val events = Tables.t(s, d, "events")
          .select(col("user_id").as("k"),
            unix_millis(col("ts").cast("timestamp")).as("t"),
            col("event_id"), lit(1).as("m"), lit(null).cast("long").as("ok"))
        val w = Window.partitionBy("k").orderBy(col("t"), col("m"), col("ok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders.union(events)
          .withColumn("o_orderkey", last(col("ok"), ignoreNulls = true).over(w))
          .filter(col("m") === 1)
          .select(col("event_id"), col("o_orderkey"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderdate,
             |    max(o_orderkey) AS o_orderkey
             |  FROM orders GROUP BY o_custkey, o_orderdate)
             |SELECT e.event_id, o.o_orderkey
             |FROM events e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    // RANGE (interval) JOIN: same-user event pairs within a 6-hour
    // window — the other join Spark lacks natively (a naive formulation
    // degrades to a nested-loop join). Scalable form: bucketize time by
    // the window width; an interval spans ≤ 2 buckets so it replicates
    // to exactly those, points probe their own bucket — pure equi-join
    // on (user, bucket) + a residual range filter. Oracle: DuckDB's
    // native inequality join (IEJoin). Microsecond-exact on both sides.
    QueryDef(
      "q_range_join",
      (s, d) => {
        val W = 21600000000L // 6 h in µs
        val ev = Tables.t(s, d, "events").select(col("user_id").as("k"),
          unix_micros(col("ts").cast("timestamp")).as("t"), col("event_id"))
        val intervals = ev
          .select(col("k"), col("t").as("t0"), col("event_id").as("left_id"))
          .withColumn("bucket", // Column `/` is double division: use DIV
            explode(array(expr(s"t0 DIV $W"), expr(s"t0 DIV $W + 1"))))
        val points = ev.withColumn("bucket", expr(s"t DIV $W"))
        intervals.join(points, Seq("k", "bucket"))
          .filter(col("t") > col("t0") && col("t") <= col("t0") + W)
          .select(col("left_id"), col("event_id").as("right_id"))
          .orderBy("left_id", "right_id")
      },
      Some("""SELECT a.event_id AS left_id, b.event_id AS right_id
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id
             | AND epoch_us(b.ts) > epoch_us(a.ts)
             | AND epoch_us(b.ts) <= epoch_us(a.ts) + 21600000000
             |ORDER BY left_id, right_id""".stripMargin)),

    // D1: count-by-kind (reference: count_objects, src/lib.rs:50)
    QueryDef(
      "q_count_kinds",
      (s, d) => {
        val c = Tables.t(s, d, "customer").select(lit("customer").as("kind"))
        val o = Tables.t(s, d, "orders").select(lit("orders").as("kind"))
        val l = Tables.t(s, d, "lineitem").select(lit("lineitem").as("kind"))
        c.union(o).union(l).groupBy("kind").agg(count(lit(1)).as("n"))
          .orderBy("kind")
      },
      Some("""SELECT kind, count(*) AS n FROM (
             |  SELECT 'customer' AS kind FROM customer
             |  UNION ALL SELECT 'orders' FROM orders
             |  UNION ALL SELECT 'lineitem' FROM lineitem
             |) GROUP BY kind ORDER BY kind""".stripMargin)),

    // D2-style fold: min/max aggregation (reference: calculate_bounding_box)
    QueryDef(
      "q_minmax_fold",
      (s, d) =>
        Tables.t(s, d, "customer").agg(
          min(cents(col("c_acctbal"))).as("min_bal_c"),
          max(cents(col("c_acctbal"))).as("max_bal_c"),
          count(lit(1)).as("n")),
      Some("""SELECT min(CAST(round(c_acctbal*100) AS BIGINT)) AS min_bal_c,
             |       max(CAST(round(c_acctbal*100) AS BIGINT)) AS max_bal_c,
             |       count(*) AS n FROM customer""".stripMargin)),

    // D1/D4-style group aggregate
    QueryDef(
      "q_agg_group",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            sum(cents(col("l_quantity"))).as("sum_qty_c"),
            sum(cents(col("l_extendedprice"))).as("sum_price_c"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // D4: changeset synthesis analogue (reference: changesets table,
    // src/db/pg.rs:202) — per-group min/max ts + counts + exact sums
    QueryDef(
      "q_changesets",
      (s, d) =>
        Tables.t(s, d, "events")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            unix_timestamp(min(col("ts"))).as("first_s"),
            unix_timestamp(max(col("ts"))).as("last_s"),
            sum(cents(col("value"))).as("sum_value_c"))
          .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s,
             |  CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // D3: users dedup (reference: users table, src/db/pg.rs:201) —
    // distinct referenced keys recovered through a join
    QueryDef(
      "q_dedup_users",
      (s, d) => {
        val o = Tables.t(s, d, "orders").select("o_custkey").distinct()
        Tables.t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    // B2/B3: posexplode (reference: tag/way-node explode, src/db/pg.rs:194-197)
    QueryDef(
      "q_explode_tokens",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
             |       unnest(toks) AS tok
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
             |ORDER BY doc_id, pos""".stripMargin)),

    // C2+D5: ordered 1:N reassembly (reference: ways ⋈ way_nodes with
    // sequence_id order, src/bin/export-test/main.rs:110)
    QueryDef(
      "q_reassemble_refs",
      (s, d) => {
        val o = Tables.t(s, d, "orders")
        val l = Tables.t(s, d, "lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_outer")
          .groupBy("o_orderkey")
          .agg(
            count(col("l_orderkey")).as("n_items"),
            concat_ws(",",
              transform(
                array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
                x => x.getField("l_partkey"))).as("refs_csv"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(l_orderkey) AS n_items,
             |  coalesce(string_agg(l_partkey, ',' ORDER BY l_linenumber, l_partkey), '') AS refs_csv
             |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // C6: broadcast dimension joins (reference: elements ⋈ users/changesets)
    QueryDef(
      "q_join_dims",
      (s, d) => {
        val l = Tables.t(s, d, "lineitem")
        val sup = Tables.t(s, d, "supplier")
        val n = Tables.t(s, d, "nation")
        val r = Tables.t(s, d, "region")
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_c"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS rev_c
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // C7/F2: anti join (reference: import-test containment probe → left_anti)
    QueryDef(
      "q_anti_join",
      (s, d) => {
        val c = Tables.t(s, d, "customer")
        val o = Tables.t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // semi join
    QueryDef(
      "q_semi_join",
      (s, d) => {
        val p = Tables.t(s, d, "part")
        val l = Tables.t(s, d, "lineitem")
        p.join(l, col("p_partkey") === col("l_partkey"), "left_semi")
          .select("p_partkey", "p_name").orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |ORDER BY p_partkey""".stripMargin)),

    // C8/F1: full-outer ordered compare — symmetric difference of key sets
    QueryDef(
      "q_fullouter_diff",
      (s, d) => {
        val o = Tables.t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k"))
          .distinct().withColumn("in_orders", lit(1))
        val c = Tables.t(s, d, "customer").select(col("c_custkey").as("k"))
          .withColumn("in_customer", lit(1))
        o.join(c, Seq("k"), "full_outer")
          .filter(col("in_orders").isNull || col("in_customer").isNull)
          .select(col("k"),
            coalesce(col("in_orders"), lit(0)).as("in_orders"),
            coalesce(col("in_customer"), lit(0)).as("in_customer"))
          .orderBy("k")
      },
      Some("""SELECT k, coalesce(in_orders, 0) AS in_orders,
             |       coalesce(in_customer, 0) AS in_customer
             |FROM (SELECT DISTINCT o_custkey AS k, 1 AS in_orders FROM orders
             |      WHERE o_orderpriority = '1-URGENT') o
             |FULL OUTER JOIN
             |     (SELECT c_custkey AS k, 1 AS in_customer FROM customer) c
             |USING (k)
             |WHERE in_orders IS NULL OR in_customer IS NULL
             |ORDER BY k""".stripMargin)),

    // F1: except / set difference
    QueryDef(
      "q_except_set",
      (s, d) => {
        val c = Tables.t(s, d, "customer").select(col("c_custkey"))
        val o = Tables.t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
        c.except(o).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
             |EXCEPT SELECT o_custkey AS c_custkey FROM orders
             |WHERE o_orderpriority = '1-URGENT'
             |ORDER BY c_custkey""".stripMargin)),

    // E: top-k with deterministic tie-break
    QueryDef(
      "q_topk",
      (s, d) =>
        Tables.t(s, d, "orders")
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
          .orderBy(col("price_c").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
             |FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 10""".stripMargin)),

    // E2: global total-order sort (reference: Type_then_ID export order)
    QueryDef(
      "q_global_sort",
      (s, d) =>
        Tables.t(s, d, "nation")
          .orderBy(col("n_regionkey").desc, col("n_name")),
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |ORDER BY n_regionkey DESC, n_name""".stripMargin)),

    // window ranking (kNN top-1 skeleton, SURVEY.md J6)
    QueryDef(
      "q_window_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val per = Tables.t(s, d, "events")
          .groupBy("event_type", "user_id")
          .agg(sum(cents(col("value"))).as("sum_c"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("sum_c").desc, col("user_id"))
        per.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("event_type", "user_id", "sum_c", "rk")
          .orderBy("event_type", "rk")
      },
      Some("""SELECT event_type, user_id, sum_c, rk FROM (
             |  SELECT event_type, user_id, sum_c,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY sum_c DESC, user_id) AS rk
             |  FROM (SELECT event_type, user_id,
             |          CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
             |        FROM events GROUP BY event_type, user_id)
             |) WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin)),

    // SESSIONIZATION (gaps-and-islands): per-user event stream split
    // into sessions at a 24 h inactivity gap. One shuffle on user_id;
    // the lag + running-sum windows and the final per-session rollup
    // all share that partitioning (Catalyst plans a single Exchange).
    // Microsecond-exact epoch arithmetic; ties broken by event_id. The
    // streaming twin (Spark's session_window) is pinned equivalent in
    // SessionizeSpec — this relational form is the one a backfill over
    // 10^12 archived events would run.
    QueryDef(
      "q_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val G = 86400000000L // 24 h in µs
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        Tables.t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("t"))
          .withColumn("new_s",
            when(col("t") - lag("t", 1).over(w) > G, 1L).otherwise(
              when(lag("t", 1).over(w).isNull, 1L).otherwise(0L)))
          .withColumn("sess", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sess")
          .agg(count(lit(1)).as("n_events"), min("t").as("start_us"),
            (max("t") - min("t")).as("dur_us"))
          .orderBy("user_id", "sess")
      },
      Some("""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS t
             |  FROM events),
             |f AS (SELECT user_id, event_id, t, CASE WHEN
             |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
             |      > 86400000000 OR
             |    lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
             |      IS NULL THEN 1 ELSE 0 END AS new_s FROM t),
             |g AS (SELECT user_id, t, CAST(sum(new_s) OVER (
             |    PARTITION BY user_id ORDER BY t, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM f)
             |SELECT user_id, sess, count(*) AS n_events,
             |  min(t) AS start_us, max(t) - min(t) AS dur_us
             |FROM g GROUP BY user_id, sess
             |ORDER BY user_id, sess""".stripMargin)),

    // ROLLUP / grouping sets: the multi-granularity aggregation shape
    // (per (lang, source), per lang, grand total) in ONE pass — Spark
    // expands the sets before the shuffle so it stays a single
    // partial+final aggregate, not three scans. Grouping indicators are
    // emitted as explicit 0/1 columns (grouping_id bit orders differ
    // across engines; grouping(col) doesn't).
    QueryDef(
      "q_grouping_sets",
      (s, d) => {
        Tables.t(s, d, "documents")
          .rollup("lang", "source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
            grouping("lang").cast("long").as("g_lang"),
            grouping("source").cast("long").as("g_source"))
          .orderBy(col("g_lang"), col("g_source"), col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(grouping(lang) AS BIGINT) AS g_lang,
             |  CAST(grouping(source) AS BIGINT) AS g_source
             |FROM documents GROUP BY ROLLUP (lang, source)
             |ORDER BY g_lang, g_source, lang NULLS FIRST,
             |  source NULLS FIRST""".stripMargin))
  )
}
