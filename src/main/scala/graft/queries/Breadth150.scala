package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hundred-fifty-first wave — sketch-based JOIN-SIZE ESTIMATION: the
  * AMS inner-product identity E[S_A·S_B] = |A ⋈ B| (sum over keys of
  * the count product), the classic optimizer-statistics primitive —
  * at 100 TB the question "how big is this join going to be" must be
  * answered from two ONE-PASS sketches, not by running the join. The
  * subject pair is orders ⋈ lineitem on orderkey (the engine's
  * biggest fact-fact join), estimated by five independent tug-of-war
  * estimators (the Breadth146 salted md5 signs on the KEY) with the
  * median-of-5 against the exact size.
  *
  * Exact-parity discipline: per-side sign sums S_j = Σ_rows s_j(key)
  * are order-free integer sums; estimates S_Aj·S_Bj are int64
  * products; the exact size Σ_k c_A(k)·c_B(k) is an integer join
  * aggregate; ratio is one double division. Int64 headroom: |S| ≤
  * rows; S_A·S_B wraps past ~3e9 rows per side (at the measured
  * near-√n concentration the practical bound is far higher; the
  * Decimal(38,0) square is the documented knob).
  *
  * Scale shape: each sketch is one map pass + a mergeable global
  * aggregate — NO shuffle of keys, no join; the exact companion (the
  * thing the sketch replaces) shuffles both sides and exists as the
  * gate-SF oracle only.
  */
object Breadth150 {

  /** Per-side sign sums for the 5 estimators over a key column. */
  private def signSums(df: DataFrame, key: org.apache.spark.sql.Column,
                       prefix: String): DataFrame = {
    val keyed = df.select(key.cast("string").as("__k"))
    val aggs = (0 until Breadth146.AmsK).map(j =>
      sum(Breadth146.amsSign(col("__k"), j)).as(s"$prefix$j"))
    keyed.agg(aggs.head, aggs.tail: _*)
  }

  /** The 5 estimator rows: (sketch_id, s_a, s_b, est). */
  private[graft] def joinSizeSketches(orders: DataFrame,
                                      lineitem: DataFrame): DataFrame = {
    val a = signSums(orders, col("o_orderkey"), "__a")
    val b = signSums(lineitem, col("l_orderkey"), "__b")
    a.crossJoin(b)
      .select(explode(array((0 until Breadth146.AmsK).map(j =>
        struct(lit(j.toLong).as("sketch_id"),
          col(s"__a$j").as("s_a"), col(s"__b$j").as("s_b"),
          (col(s"__a$j") * col(s"__b$j")).as("est"))): _*)).as("__r"))
      .select(col("__r.sketch_id"), col("__r.s_a"), col("__r.s_b"),
        col("__r.est"))
      .orderBy(col("sketch_id").asc)
  }

  /** One audit row: exact join size, median estimate, ratio. */
  private[graft] def joinSizeEst(orders: DataFrame,
                                 lineitem: DataFrame): DataFrame = {
    val exact = orders.select(col("o_orderkey").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__ca"))
      .join(lineitem.select(col("l_orderkey").as("__k"))
        .groupBy(col("__k")).agg(count(lit(1)).as("__cb")), Seq("__k"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
        .as("join_size"))
    val cnts = orders.agg(count(lit(1)).as("n_orders"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_lineitem")))
    val med = joinSizeSketches(orders, lineitem)
      .agg(element_at(array_sort(collect_list(col("est"))),
        (Breadth146.AmsK + 1) / 2).as("est_median"))
    cnts.crossJoin(broadcast(exact)).crossJoin(broadcast(med))
      .select(col("n_orders"), col("n_lineitem"), col("join_size"),
        col("est_median"),
        when(col("join_size") === 0L, lit(null).cast("double"))
          .otherwise(col("est_median").cast("double")
            / col("join_size").cast("double")).as("ratio"))
  }

  val defs: Map[String, Q] = Map(
    "q_join_size_est" -> ((s, dir) =>
      joinSizeEst(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q_join_size_sketches" -> ((s, dir) =>
      joinSizeSketches(Tables.orders(s, dir), Tables.lineitem(s, dir))))

  private def sqlSign(c: String, j: Int): String =
    s"""CASE WHEN ('0x' || substr(md5(CAST($c AS VARCHAR) || '#$j'),
       | 17, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END"""
      .stripMargin.replace("\n", "")

  /** Two-side sign-sum CTE chain (no leading WITH), shared. */
  private val JsSql: String = {
    val aExprs = (0 until Breadth146.AmsK).map(j =>
      s"CAST(sum(${sqlSign("o_orderkey", j)}) AS BIGINT) AS a$j")
      .mkString(",\n    ")
    val bExprs = (0 until Breadth146.AmsK).map(j =>
      s"CAST(sum(${sqlSign("l_orderkey", j)}) AS BIGINT) AS b$j")
      .mkString(",\n    ")
    s"""sa AS (SELECT $aExprs FROM orders),
       |sb AS (SELECT $bExprs FROM lineitem)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_join_size_est" -> {
      val ests = (0 until Breadth146.AmsK).map(j => s"a$j * b$j")
        .mkString(", ")
      s"""WITH $JsSql,
         |ex AS (
         |  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS join_size
         |  FROM (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
         |        FROM orders GROUP BY o_orderkey) oa
         |  JOIN (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
         |        FROM lineitem GROUP BY l_orderkey) lb
         |  ON oa.k = lb.k),
         |cn AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders)
         |      AS n_orders,
         |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
         |      AS n_lineitem),
         |md AS (
         |  SELECT CAST(list_sort([$ests])[${(Breadth146.AmsK + 1) / 2}]
         |    AS BIGINT) AS est_median
         |  FROM sa CROSS JOIN sb)
         |SELECT n_orders, n_lineitem, join_size, est_median,
         |  CASE WHEN join_size = 0 THEN NULL
         |    ELSE CAST(est_median AS DOUBLE) / CAST(join_size AS DOUBLE)
         |  END AS ratio
         |FROM cn CROSS JOIN ex CROSS JOIN md""".stripMargin
    },

    "q_join_size_sketches" -> {
      val rows = (0 until Breadth146.AmsK).map(j =>
        s"SELECT CAST($j AS BIGINT) AS sketch_id, a$j AS s_a," +
          s" b$j AS s_b, a$j * b$j AS est FROM sa CROSS JOIN sb")
        .mkString("\n|UNION ALL\n|")
      s"""WITH $JsSql
         |$rows
         |ORDER BY sketch_id""".stripMargin
    })
}
