package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.assoc.Association

/** P15/A8/A9/J5 association shapes on the driver testdata: part names
  * play titles, brands play authors, a fixed keyword list plays the
  * user-defined keywords (SciPi's --keywords argument).
  */
object AssocQueries extends QueryPack {

  private val Keywords = Seq("small", "ring", "widget")
  private val SimThreshold = 0.3

  override def queries: Map[String, Q] = Map(
    // P15 + A8: Σ cosine(keyword, p_name) per (keyword, brand) over
    // parts clearing the threshold.
    "assoc_keyword_cosine" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_brand"), col("p_name"))
        .withColumn("keyword", explode(array(Keywords.map(lit): _*)))
        .select(col("keyword"), col("p_brand"),
          Association.shingleCosine(col("keyword"), col("p_name")).as("sim"))
        .where(col("sim") > SimThreshold)
        .groupBy("keyword", "p_brand")
        .agg(round(sum("sim"), 6).as("total_sim"), count(lit(1)).as("n_parts"))),

    // A9 + J5 end-to-end: brands "use" part-name head tokens as
    // keywords; project brand pairs sharing a frequently-used token.
    "assoc_brand_projection" -> ((s, d) => {
      val usage = Tables.part(s, d)
        .select(col("p_brand").as("author"),
          // head token via substring_index, not split(..)[0]: identical
          // result (everything before the first space; whole string
          // when spaceless), but a plain codegen'd string expression —
          // the self-join pushed split() array builds into both scan
          // Filters (PushdownQuadraticAuditSpec's class; bounded here,
          // but the clean form costs nothing)
          substring_index(col("p_name"), " ", 1).as("keyword"))
        .groupBy("author", "keyword")
        .agg(count(lit(1)).as("usage"))
        .where(col("usage") > 3)
      Association.collaboratorProjection(usage)
        .withColumnRenamed("a", "brand_a")
        .withColumnRenamed("b", "brand_b")
    }),

    // Association-rule mining (market-basket): top-20 part pairs by
    // LIFT = N·c(ab) / (c(a)·c(b)) at min-support c(ab) ≥ 2 — the
    // frequent-itemset report completing the co-occurrence family
    // (q_part_cooccur counts pairs; lift normalizes away item
    // popularity). Pair candidates come from the clique-capped
    // group-then-expand kernel (orders above 1000 distinct parts are
    // excluded, PubGraph semantics — invisible at ≤7 parts/order);
    // support joins are equi-joins on the part key; products N·c(ab)
    // and c(a)·c(b) stay in int64 (N ≤ 10^10 orders × c(ab) ≤ 10^6
    // pairs < 2^63) and the ratio is ONE double division of exact
    // integers. Top-20 via TakeOrdered with full-tuple tie-break.
    "assoc_basket_lift" -> ((s, d) => {
      // ONE okey aggregation feeds all three consumers (r17):
      // collect_set dedups (okey, pkey) in-aggregate, so the old
      // persisted `op.distinct()` (a second lineitem-scale exchange)
      // and the separate two-stage countDistinct(okey) pass both
      // collapse into this cached basket table — n is its row count,
      // per-part supports explode back out of it, pair candidates read
      // it directly. Output identical: the basket SETS are what every
      // downstream count is defined on.
      val ps = graft.CacheRegistry.persistTracked(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
          .groupBy(col("okey")).agg(collect_set(col("pkey")).as("ps")))
      val n = broadcast(ps.agg(count(lit(1)).as("n")))
      val ca = graft.CacheRegistry.persistTracked(
        ps.select(explode(col("ps")).as("pkey"))
          .groupBy("pkey").agg(count(lit(1)).as("c")))
      val pairs = graft.functions.PairGen.suffixPairs(
        ps.where(size(col("ps")) <= 1000), col("ps"), "pa", "pb")
        .groupBy("pa", "pb").agg(count(lit(1)).as("cab"))
        .where(col("cab") >= 2)
      pairs
        .join(ca.select(col("pkey").as("pa"), col("c").as("c_a")), Seq("pa"))
        .join(ca.select(col("pkey").as("pb"), col("c").as("c_b")), Seq("pb"))
        .crossJoin(n)
        .select(col("pa"), col("pb"), col("cab"),
          ((col("n") * col("cab")).cast("double") / (col("c_a") * col("c_b")))
            .as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(20)
    }))

  /** DuckDB mirror of [[Association.shingleCosine]] (same gram builder,
    * same profile dot). */
  private def cosSql(a: String, b: String): String = {
    def grams(x: String) =
      s"list_transform(range(1, length($x)-1), i -> substr($x, i, 3))"
    def dot(xs: String, ys: String) =
      s"coalesce(list_sum(list_transform(list_distinct($xs), g -> " +
        s"len(list_filter($xs, x -> x = g)) * len(list_filter($ys, y -> y = g)))), 0)"
    s"""(WITH g AS (SELECT ${grams(a)} AS ga, ${grams(b)} AS gb)
       | SELECT CASE WHEN ${dot("ga", "ga")} = 0 OR ${dot("gb", "gb")} = 0 THEN 0.0
       |   ELSE ${dot("ga", "gb")} * 1.0 / sqrt(${dot("ga", "ga")} * 1.0 * ${dot("gb", "gb")}) END
       | FROM g)""".stripMargin.replace("\n", " ")
  }

  override def oracles: Map[String, String] = Map(
    "assoc_keyword_cosine" ->
      s"""WITH kw(keyword) AS (VALUES ('small'), ('ring'), ('widget')),
         |sims AS (
         |  SELECT keyword, p_brand, ${cosSql("keyword", "p_name")} AS sim
         |  FROM part CROSS JOIN kw)
         |SELECT keyword, p_brand, round(sum(sim), 6) AS total_sim, count(*) AS n_parts
         |FROM sims WHERE sim > $SimThreshold
         |GROUP BY 1, 2""".stripMargin,

    "assoc_brand_projection" ->
      """WITH usage AS (
        |  SELECT p_brand AS author, string_split(p_name, ' ')[1] AS keyword, count(*) AS u
        |  FROM part GROUP BY 1, 2 HAVING u > 3)
        |SELECT DISTINCT a.author AS brand_a, b.author AS brand_b
        |FROM usage a JOIN usage b ON a.keyword = b.keyword AND a.author < b.author""".stripMargin,

    "assoc_basket_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
        |nn AS (SELECT count(DISTINCT okey) AS n FROM op),
        |ca AS (SELECT pkey, count(*) AS c FROM op GROUP BY 1),
        |pairs AS (
        |  SELECT a.pkey AS pa, b.pkey AS pb, count(*) AS cab
        |  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |l AS (
        |  SELECT p.pa, p.pb, p.cab,
        |    CAST(nn.n * p.cab AS DOUBLE) / (x.c * y.c) AS lift
        |  FROM pairs p
        |  JOIN ca x ON p.pa = x.pkey
        |  JOIN ca y ON p.pb = y.pkey
        |  CROSS JOIN nn)
        |SELECT pa, pb, cab, lift FROM l
        |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin)
}
