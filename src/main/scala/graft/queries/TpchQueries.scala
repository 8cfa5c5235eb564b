package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import QueryDef.q

/** TPC-H-shaped multi-join headliners (q3/q5/q9 shapes, adapted to the
  * fixture schema — no partsupp table, generator date range 1995-2001).
  * These pin the plans that matter most at 100 TB: fact-fact shuffle
  * joins on their natural keys, selective dimension filters applied
  * BEFORE the join, fixed-size dims (nation/region) broadcast, and
  * exact DECIMAL intermediates for the revenue sums (QueryDef
  * determinism contract).
  *
  * Reference: these shapes reach the reference through SQL pass-through
  * (pg_conn.go:314) and run on DuckDB's native join/agg operators; here
  * Catalyst+AQE pick broadcast vs shuffle per side.
  */
object TpchQueries {

  // the money columns are 2-decimal values stored as DOUBLE; casting
  // to DECIMAL(18,2) rounds ~5e-13 away from the true value — both
  // engines land on the same decimal every row (an 18,6 cast rounds at
  // the 6th decimal, where one row in ~200k sits on a knife edge and
  // the two engines' rounding can split — observed on the q9 subset)
  private def revenue = (col("l_extendedprice").cast(DecimalType(18, 2)) *
    (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).as("rev")

  val all: Seq[QueryDef] = Seq(

    // q3 shape: shipping-priority top-N — 3-table join, group on the
    // fact key, TakeOrderedAndProject top-10
    q("q_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-15' AND l_shipdate > TIMESTAMP '1997-06-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      // dimension-side filters BEFORE the joins: the scans ship only
      // qualifying rows into the exchanges
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1997-06-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t.lineitem.filter(col("l_shipdate") > lit("1997-06-15"))
        .select(col("l_orderkey"), revenue)
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // q5 shape: local-supplier volume — the 6-table chain; nation and
    // region are fixed-size (25/5 rows) and broadcast, the three fact
    // joins shuffle on their natural keys
    q("q_tpch_q5",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val asiaNations = t.nation.join(
        broadcast(t.region.filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      // suppliers restricted to the region up front — the supplier
      // join then carries n_name along for free
      val supp = t.supplier.join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"), revenue)
      ord.join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // q9 shape: product-type profit by nation and year — selective
    // LIKE on part before the partkey shuffle join, nation broadcast
    q("q_tpch_q9",
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
        |FROM part, lineitem, supplier, orders, nation
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val redParts = t.part.filter(col("p_name").like("%red%")).select("p_partkey")
      val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revenue)
      li.join(redParts, col("l_partkey") === col("p_partkey"))
        .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier.select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("rev")).cast("double").as("profit"))
        .select(col("n_name").as("nation"), col("o_year"), col("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // q18 shape: large-volume customer — group-HAVING semi-join. The
    // oracle's `IN (GROUP BY … HAVING)` + re-aggregation is collapsed
    // into ONE lineitem scan: the HAVING aggregate already carries the
    // per-order quantity sum, so the semi-join side IS the re-aggregated
    // value and lineitem is never scanned twice. At 100 TB that halves
    // the dominant fact-scan cost; the surviving orders (~1%) then join
    // orders/customer on their natural keys.
    q("q_tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val bigOrders = t.lineitem
        .select(col("l_orderkey"), col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("qty")).as("sum_qty_dec"))
        .filter(col("sum_qty_dec") > 250)
      bigOrders
        .join(t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer.select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty_dec").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },

    // q21 shape: waiting-supplier count — EXISTS + NOT EXISTS on the
    // same fact (classic double correlated anti-join; fixture has no
    // receiptdate, so "late" := l_returnflag = 'R'). Both subqueries
    // collapse into ONE per-order aggregate over a single lineitem
    // scan: EXISTS(other supplier) ⇔ countDistinct(supplier) ≥ 2, and
    // NOT EXISTS(other late supplier) ⇔ countDistinct(late supplier)=1
    // (l1 itself is late, so it is the one). Three correlated scans of
    // the 100 TB fact become one scan + one keyed shuffle that all
    // three join legs reuse.
    q("q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      // two-level aggregation instead of two countDistincts: a mixed
      // multi-distinct agg plans through Expand (doubles the shuffled
      // rows); (order, supplier) roll-up then per-order counts shuffles
      // each row once and the second agg is already co-partitioned
      val stats = li
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late_supp"))
      val lateLines = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ordF = t.orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      // nation is fixed-size → broadcast; supplier stays a shuffle join
      // (at 100 TB supplier is a 1B-row dim; AQE demotes to broadcast
      // when the filtered side is actually small)
      val supp = t.supplier.join(
          broadcast(t.nation.filter(col("n_name") === "NATION_7").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      lateLines
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .join(stats, "l_orderkey")
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }
  )
}
