package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Core relational operators over the synthetic TPC-H-ish tables, each with a
  * DuckDB oracle. These exercise the Spark surface that the telemetry engine
  * (promql/logql packages) composes: partial+final hash aggregation,
  * broadcast/semi/anti joins, window functions, top-k, set ops, scalar
  * functions, casts and time bucketing (SURVEY.md §2.2–2.9).
  *
  * Scale notes (100 TB thinking):
  *  - dimension joins (region/nation/customer/supplier) are explicitly
  *    `broadcast(...)` — at any SF these stay small relative to facts;
  *  - fact-side aggregations are single-shuffle groupBys (partial map-side
  *    combine is automatic);
  *  - top-k uses window + filter which Spark executes with rank-limit
  *    pushdown (WindowGroupLimit) rather than a full sort.
  */
object CoreQueries extends Catalog {

  private def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus"""

  private def q3(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderpriority,
       sum(l_extendedprice * (1.0 - l_discount)) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-06-01'
       GROUP BY l_orderkey, o_orderpriority"""

  private def q5(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q5Sql =
    """SELECT r_name, n_name,
       sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
       count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name"""

  private def qSemi(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d).select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), sum(col("c_acctbal")).as("sum_bal"))
  }

  private val qSemiSql =
    """SELECT c_mktsegment, count(*) AS n_cust, sum(c_acctbal) AS sum_bal
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       GROUP BY c_mktsegment"""

  private def qAnti(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    // customers with no orders in the first half of 1995 (unrestricted
    // anti-join is empty on this data: every customer has some order)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
  }

  private val qAntiSql =
    """SELECT c_mktsegment, count(*) AS n_cust
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate < TIMESTAMP '1995-07-01')
       GROUP BY c_mktsegment"""

  private def qTopkWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  private val qTopkWindowSql =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         FROM orders) t
       WHERE rn <= 3"""

  private def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("running_spend", sum(col("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
  }

  private val qWindowRunningSql =
    """SELECT o_custkey, o_orderkey,
       sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
       FROM orders"""

  private def qSortLimit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  private val qSortLimitSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       LIMIT 100"""

  private def qIntersect(s: SparkSession, d: String): DataFrame = {
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    custNations.intersect(suppNations)
  }

  private val qIntersectSql =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier"""

  private def qExcept(s: SparkSession, d: String): DataFrame = {
    // ordered partkeys whose part is large (size > 40): EXCEPT with a
    // filtered right side so the result is non-empty at every SF
    val ordered = Tables.lineitem(s, d).select(col("l_partkey").as("partkey"))
    val small = Tables.part(s, d).filter(col("p_size") <= 40)
      .select(col("p_partkey").as("partkey"))
    ordered.except(small)
  }

  private val qExceptSql =
    """SELECT l_partkey AS partkey FROM lineitem
       EXCEPT
       SELECT p_partkey AS partkey FROM part WHERE p_size <= 40"""

  private def qUnionDistinct(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val b = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    a.union(b).distinct().groupBy().agg(count(lit(1)).as("n_nations"))
  }

  private val qUnionDistinctSql =
    """SELECT count(*) AS n_nations FROM (
         SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey AS nationkey FROM supplier) t"""

  private def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))

  private val qDistinctAggSql =
    """SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
       FROM orders GROUP BY o_orderstatus"""

  private def qScalarMath(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        abs(col("value") - lit(100.0)).as("abs_v"),
        ceil(col("value")).cast("long").as("ceil_v"),
        floor(col("value")).cast("long").as("floor_v"),
        round(exp(col("value") / lit(200.0)), 6).as("exp_v"),
        round(log(col("value") + lit(1.0)), 6).as("ln_v"),
        round(log2(col("value") + lit(1.0)), 6).as("log2_v"),
        round(log10(col("value") + lit(1.0)), 6).as("log10_v"),
        round(sqrt(abs(col("value"))), 6).as("sqrt_v"),
        signum(col("value") - lit(100.0)).cast("long").as("sign_v"),
        greatest(col("value"), lit(50.0)).as("clamp_min_v"),
        least(col("value"), lit(150.0)).as("clamp_max_v"))

  private val qScalarMathSql =
    """SELECT event_id,
       abs("value" - 100.0) AS abs_v,
       CAST(ceil("value") AS BIGINT) AS ceil_v,
       CAST(floor("value") AS BIGINT) AS floor_v,
       round(exp("value" / 200.0), 6) AS exp_v,
       round(ln("value" + 1.0), 6) AS ln_v,
       round(log2("value" + 1.0), 6) AS log2_v,
       round(log10("value" + 1.0), 6) AS log10_v,
       round(sqrt(abs("value")), 6) AS sqrt_v,
       CAST(sign("value" - 100.0) AS BIGINT) AS sign_v,
       greatest("value", 50.0) AS clamp_min_v,
       least("value", 150.0) AS clamp_max_v
       FROM events"""

  private def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("tname"),
        col("p_name").contains("green").cast("int").as("has_green"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        col("p_name").rlike("^[a-z]+ ").cast("int").as("starts_word"))

  private val qStringFuncsSql =
    """SELECT p_partkey,
       lower(p_name) AS lname,
       upper(p_brand) AS ubrand,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_type, 1, 5) AS type5,
       concat_ws('-', p_brand, p_type) AS brand_type,
       trim(p_name) AS tname,
       CAST(contains(p_name, 'green') AS INT) AS has_green,
       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
       CAST(regexp_matches(p_name, '^[a-z]+ ') AS INT) AS starts_word
       FROM part"""

  private def qJsonCase(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k_str", get_json_object(col("props"), "$.k"))
      .withColumn("k", col("k_str").cast("long"))
      .withColumn("k_bad", expr("try_cast(event_type AS DOUBLE)"))
      .withColumn("k_band",
        when(col("k") >= 66, "high").when(col("k") >= 33, "mid").otherwise("low"))
      .groupBy(col("event_type"), col("k_band"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(col("k_bad")).as("n_bad"))

  private val qJsonCaseSql =
    // CAST sums to BIGINT: DuckDB sum(BIGINT) is HUGEINT, which hash-diverges
    // from Spark's LongType even when numerically equal
    """SELECT event_type, k_band, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(k) AS BIGINT) AS sum_k, CAST(count(k_bad) AS BIGINT) AS n_bad
       FROM (
         SELECT event_type,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                TRY_CAST(event_type AS DOUBLE) AS k_bad,
                CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 66 THEN 'high'
                     WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 33 THEN 'mid'
                     ELSE 'low' END AS k_band
         FROM events) t
       GROUP BY event_type, k_band"""

  /** ntile quartiles over a deterministic total order (acctbal, key
    * tie-break) with per-quartile stats — the bucketed-percentile window
    * shape analytics dashboards lean on.
    *
    * A naive `ntile(4) OVER (ORDER BY ...)` is a GLOBAL window: Spark
    * funnels the entire table through ONE task. Instead: range-partition
    * on the sort keys (each partition sorts independently in parallel),
    * row_number WITHIN each partition (partitioned window — no funnel),
    * then add per-partition offsets (one tiny agg, ≤ #partitions rows on
    * the driver) to recover the exact global rank, and assign ntile
    * buckets arithmetically from the rank — bit-identical to the window
    * ntile because the tie-broken order is total.
    */
  private def qNtile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq(col("c_acctbal").desc, col("c_custkey").asc)
    // materialize BEFORE the two downstream jobs: repartitionByRange picks
    // its boundaries by SAMPLING, so two separate executions of this plan
    // (the counts collect below, then the final aggregate) can land rows in
    // different partitions — the driver-side offsets would then describe a
    // partitioning the second job doesn't have (observed as off-by-dozens
    // quartile counts at sf0.1). The checkpoint pins one partitioning for
    // both reads.
    val local = graft.GraftSession.materialize(
      Tables.customer(s, d)
        .select(col("c_acctbal"), col("c_custkey"))
        .repartitionByRange(32, keys: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__lrn", row_number().over(
          Window.partitionBy(col("__pid")).orderBy(keys: _*))))
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets: Map[Int, Long] = counts
      .scanLeft((0, 0L, 0L)) { case ((_, _, acc), (pid, c)) => (pid, acc, acc + c) }
      .drop(1).map { case (pid, off, _) => pid -> off }.toMap
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(
        map(offsets.toSeq.sortBy(_._1).flatMap { case (p, o) =>
          Seq(lit(p), lit(o)) }: _*), col("__pid")), lit(0L))
    // ntile(k) over n rows: first (n % k) buckets get (n/k + 1) rows
    val (q, rem) = (n / 4, n % 4)
    val boundary = rem * (q + 1)
    val rn = offExpr + col("__lrn")
    val quartile = when(rn <= boundary, floor((rn - 1) / (q + 1)))
      .otherwise(lit(rem) + floor((rn - 1 - boundary) / math.max(q, 1).toDouble))
      .cast("int") + 1
    local.withColumn("quartile", quartile)
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 4).as("min_bal"),
        round(max(col("c_acctbal")), 4).as("max_bal"))
  }

  private val qNtileSql =
    """SELECT quartile, count(*) AS n,
       round(min(c_acctbal), 4) AS min_bal,
       round(max(c_acctbal), 4) AS max_bal
       FROM (SELECT c_acctbal,
                    ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
                      AS quartile
             FROM customer)
       GROUP BY 1"""

  /** TPC-H q7 shape — volume shipping between nation pairs: two
    * independent dimension chains (supplier→nation, order→customer→nation)
    * meet on the fact table; both chains broadcast, the fact never
    * shuffles for the dimension lookups
    */
  private def q7(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val supp = Tables.supplier(s, d)
    val cust = Tables.customer(s, d)
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(n1), supp("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), cust("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE n1.n_name <> n2.n_name
       GROUP BY 1, 2, 3"""

  /** TPC-H q18 shape — large orders: a groupBy-having over the fact
    * drives a semi-join back onto orders/customer
    */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
        col("total_qty"))
  }

  private val q18Sql =
    """SELECT c_name, o_orderkey, o_totalprice, total_qty
       FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
             FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200) big
       JOIN orders ON o_orderkey = big.l_orderkey
       JOIN customer ON o_custkey = c_custkey"""

  /** Bucketed co-located join — the 100 TB lever the other core rows
    * don't show: both fact tables are written ONCE as bucketed tables
    * (same bucket count, bucketed + sorted on the join key), so the join
    * AND the per-order aggregation run with ZERO Exchange nodes — the
    * table layout pre-pays the shuffle, exactly how a petabyte warehouse
    * co-locates its biggest recurring join (PlanSpec pins the no-Exchange
    * plan). Results are layout-independent, so the oracle is the plain
    * join over the raw parquet. External-table paths keep the warehouse
    * out of the repo; writes are per-(sf, session) and idempotent.
    */
  private val bucketedDone =
    new java.util.concurrent.ConcurrentHashMap[String, Unit]()

  private def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    // table names carry the SAME scope as the memo key (full-path hash +
    // session), so two dataset dirs sharing a basename — or two sessions —
    // can never repoint each other's tables behind a stale memo entry
    val tg = s"${new java.io.File(d).getName.replace('.', '_')}_" +
      s"${Integer.toHexString(d.hashCode)}_${Integer.toHexString(s.hashCode())}"
    val (liT, ordT) = (s"graft_li_bkt_$tg", s"graft_ord_bkt_$tg")
    // computeIfAbsent (the annPersisted pattern): a failed build — disk
    // full, interrupted run — records NO memo entry, so the next call
    // retries instead of serving a missing/half-written table forever;
    // concurrent callers block until the one build finishes (ADVICE r12)
    bucketedDone.computeIfAbsent(tg, { _ =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_bkt_$tg")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite")
        .option("path", root.resolve("li").toString)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liT)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .write.mode("overwrite")
        .option("path", root.resolve("ord").toString)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordT)
    })
    // merge hint: the POINT is the exchange-free sort-merge join on the
    // bucket layout — at toy SFs AQE would otherwise flip to broadcast
    // (correct too, but then the row stops proving co-location)
    val li = s.table(liT).hint("merge")
    val ord = s.table(ordT).filter(col("o_totalprice") > 150000.0)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  private val bucketedJoinSql =
    """SELECT l_orderkey, o_orderpriority,
              sum(l_quantity) AS sum_qty,
              CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_totalprice > 150000.0
       GROUP BY 1, 2"""

  /** gap-based sessionization: per-user event stream splits into sessions
    * at >30 min silences (lag + conditional cumulative sum — pure window
    * algebra, partitioned by user, codegen'd end to end); per-session
    * stats aggregated per user
    */
  private def qSessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = 1800000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val sess = Tables.events(s, d)
      .withColumn("__prev", lag(col("ts_ms"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_ms") - col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rangeBetween(Window.unboundedPreceding, 0)))
    sess.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("dur_ms"))
      .groupBy(col("user_id"))
      .agg(max(col("session_seq")).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("dur_ms")).as("max_session_ms"))
  }

  private val qSessionizeSql =
    """WITH e AS (
       SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
              lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ms(ts), event_id) AS prev
       FROM events),
     s AS (
       SELECT user_id, ts_ms,
              sum(CASE WHEN prev IS NULL OR ts_ms - prev > 1800000
                       THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS session_seq
       FROM e),
     per AS (
       SELECT user_id, session_seq, count(*) AS n_events,
              max(ts_ms) - min(ts_ms) AS dur_ms
       FROM s GROUP BY 1, 2)
     SELECT user_id, CAST(max(session_seq) AS BIGINT) AS n_sessions,
            CAST(sum(n_events) AS BIGINT) AS n_events,
            max(dur_ms) AS max_session_ms
     FROM per GROUP BY 1"""

  /** deterministic train/val/test split — the hash-based assignment a
    * training pipeline needs to be reproducible across engines and runs:
    * md5(doc_id) mod 100 → 90/5/5
    */
  private def qDatasetSplit(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long") % 100
    Tables.documents(s, d)
      .withColumn("split",
        when(h < 90, "train").when(h < 95, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
  }

  private val qDatasetSplitSql =
    """WITH s AS (
       SELECT doc_id,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
                % 100 AS h
       FROM documents)
     SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
                 ELSE 'test' END AS split,
            count(*) AS n_docs, min(doc_id) AS first_doc
     FROM s GROUP BY 1"""

  private def qEventsBucket(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket_ts", col("ts_ms") - col("ts_ms") % lit(600000L))
      .groupBy(col("bucket_ts"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))

  private val qEventsBucketSql =
    """SELECT epoch_ms(ts) - epoch_ms(ts) % 600000 AS bucket_ts, event_type,
       count(*) AS n, sum("value") AS sum_v, min("value") AS min_v, max("value") AS max_v
       FROM events
       GROUP BY 1, 2"""

  private def qEventsDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day_idx", (col("ts_ms") / lit(86400000L)).cast("long"))
      .groupBy(col("day_idx"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        // value is 2-decimal quantized: recover exact cents before dividing
        // so the mean is bit-identical across engines (summation-order noise
        // otherwise flips round-6 at x.xxx8125-style boundaries)
        (round(sum(col("value")) * 100, 0).cast("long") / 100.0 /
          count(lit(1))).as("avg_v"))

  private val qEventsDailySql =
    """SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_idx,
       count(*) AS n, count(DISTINCT user_id) AS n_users,
       CAST(round(sum("value") * 100, 0) AS BIGINT) / 100.0 / count(*) AS avg_v
       FROM events GROUP BY 1"""

  override def all: Seq[Q] = Seq(
    Q("core_q1_pricing_agg", q1, Some(q1Sql)),
    Q("core_q3_join_agg", q3, Some(q3Sql)),
    Q("core_q5_star_join", q5, Some(q5Sql)),
    Q("core_q7_nation_volume", q7, Some(q7Sql)),
    Q("core_ntile", qNtile, Some(qNtileSql)),
    Q("core_q18_large_orders", q18, Some(q18Sql)),
    Q("core_bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    Q("core_semi_join", qSemi, Some(qSemiSql)),
    Q("core_anti_join", qAnti, Some(qAntiSql)),
    Q("core_window_topk", qTopkWindow, Some(qTopkWindowSql)),
    Q("core_window_running", qWindowRunning, Some(qWindowRunningSql)),
    Q("core_sort_limit", qSortLimit, Some(qSortLimitSql)),
    Q("core_intersect", qIntersect, Some(qIntersectSql)),
    Q("core_except", qExcept, Some(qExceptSql)),
    Q("core_union_distinct", qUnionDistinct, Some(qUnionDistinctSql)),
    Q("core_distinct_agg", qDistinctAgg, Some(qDistinctAggSql)),
    Q("core_scalar_math", qScalarMath, Some(qScalarMathSql)),
    Q("core_string_funcs", qStringFuncs, Some(qStringFuncsSql)),
    Q("core_json_case", qJsonCase, Some(qJsonCaseSql)),
    Q("core_events_bucket", qEventsBucket, Some(qEventsBucketSql)),
    Q("core_events_daily", qEventsDaily, Some(qEventsDailySql)),
    Q("core_sessionize", qSessionize, Some(qSessionizeSql)),
    Q("pp_dataset_split", qDatasetSplit, Some(qDatasetSplitSql)),
    Q("core_cube_agg", qCubeAgg, Some(qCubeAggSql)),
    Q("core_unpivot", qUnpivot, Some(qUnpivotSql))
  )

  /** wide→long UNPIVOT via stack() — the reference leans on DuckDB UNPIVOT
    * for tag-name discovery (logql/sql_builder.go:172); here the same
    * reshaping runs post-aggregation (min/max are order-insensitive, so
    * the doubles replay exactly), one row per (returnflag, measure).
    */
  private def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_quantity")).as("q_min"), max(col("l_quantity")).as("q_max"),
        min(col("l_extendedprice")).as("p_min"), max(col("l_extendedprice")).as("p_max"),
        min(col("l_discount")).as("d_min"), max(col("l_discount")).as("d_max"),
        min(col("l_tax")).as("t_min"), max(col("l_tax")).as("t_max"))
      .select(col("l_returnflag"), expr(
        """stack(4,
           'quantity', q_min, q_max,
           'extendedprice', p_min, p_max,
           'discount', d_min, d_max,
           'tax', t_min, t_max) AS (measure, min_v, max_v)"""))

  private val qUnpivotSql =
    """WITH a AS (
       SELECT l_returnflag,
              min(l_quantity) AS q_min, max(l_quantity) AS q_max,
              min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max,
              min(l_discount) AS d_min, max(l_discount) AS d_max,
              min(l_tax) AS t_min, max(l_tax) AS t_max
       FROM lineitem GROUP BY 1)
     SELECT l_returnflag, 'quantity' AS measure, q_min AS min_v, q_max AS max_v FROM a
     UNION ALL
     SELECT l_returnflag, 'extendedprice', p_min, p_max FROM a
     UNION ALL
     SELECT l_returnflag, 'discount', d_min, d_max FROM a
     UNION ALL
     SELECT l_returnflag, 'tax', t_min, t_max FROM a"""

  /** grouping sets / CUBE — beyond the reference's own surface (SURVEY §2.4
    * notes the reference lacks it; Spark provides it natively): per
    * (event_type × weekday) totals with both subtotal planes and the grand
    * total, GROUPING() flags distinguishing the planes.
    */
  private def qCubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("weekday", expr("ts_ms DIV 86400000 % 7"))
      .cube(col("event_type"), col("weekday"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_v"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("weekday")).cast("long").as("g_day"))

  private val qCubeAggSql =
    """SELECT event_type, weekday, CAST(count(*) AS BIGINT) AS n,
              round(sum("value"), 4) AS sum_v,
              CAST(grouping(event_type) AS BIGINT) AS g_type,
              CAST(grouping(weekday) AS BIGINT) AS g_day
       FROM (SELECT event_type, epoch_ms(ts) // 86400000 % 7 AS weekday, "value"
             FROM events) t
       GROUP BY CUBE (event_type, weekday)"""
}
