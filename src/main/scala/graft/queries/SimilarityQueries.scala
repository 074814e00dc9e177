package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`array<float>` 64-dim).
  *
  * Three tiers, mirroring how ANN serving actually scales:
  *  - brute-force top-k: exact, O(Q×N); the Q side is broadcast so the
  *    big side never shuffles — the baseline and the oracle-checkable
  *    ground truth.
  *  - IVF-style probe: restrict the scan to the query's coarse cluster
  *    (the `label` column stands in for a k-means assignment) — an
  *    equi-join on the cluster id, O(Q×N/k), also exact *within* the
  *    probed cluster so it stays oracle-checkable.
  *  - SRP-LSH: 3 independent sign-random-projection tables with
  *    hamming<=2 multiprobe, then exact re-rank of candidates only —
  *    the 100 TB path (graded by a recall certificate vs the in-Spark
  *    ground truth; the ranked kernel pinned in SimilaritySpec).
  *  - int8 scan + exact re-rank: symmetric per-vector int8 quantization,
  *    candidate generation by integer dot product (4× smaller scan
  *    payload, no sqrt/norms), then full-precision re-rank of the top
  *    candidates — the memory-bandwidth lever serving stacks use
  *    (quantized index + re-rank). With a wide candidate margin the
  *    output equals brute force, so the same exact oracle grades it.
  */
object SimilarityQueries extends QueryPack {

  private val Dim = 64
  private val K = 5
  private val NQueries = 10
  private val Planes = 8
  private val Tables_ = 3 // independent SRP hash tables
  private val Candidates = 50 // int8 tier: candidate margin (10× K)
  /** Mean recall@K the SRP tier certifies (measured 0.68 sf0.01 /
    * 0.80 sf0.1 — comfortable margin; SimilaritySpec pins it too). */
  private val SrpRecallFloor = 0.5

  /** Exact brute-force top-K per query vector — the baseline tier and
    * the ground truth the SRP certificate is measured against. */
  private def bruteTopK(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = Tables.fanout(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"),
        normSqExpr(col("embedding"), Dim).as("nsq"))
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("nsq").as("qnsq"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(dotExpr(col("qvec"), col("embedding"), Dim) /
          sqrt(col("qnsq") * col("nsq")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
  }

  /** SRP-LSH top-K: 3 independent sign-random-projection tables,
    * hamming≤2 multiprobe, exact re-rank of candidates only. */
  private[graft] def srpTopK(s: org.apache.spark.sql.SparkSession, d: String) = {
    val masks = (0 until (1 << Planes)).filter(m => Integer.bitCount(m) <= 2)
    val e0 = Tables.fanout(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"),
        normSqExpr(col("embedding"), Dim).as("nsq"),
        array((0 until Tables_).map(t =>
          srpBucket(col("embedding"), Dim, Planes, t)): _*).as("buckets"))
    val e = e0.select(col("vec_id"), col("embedding"), col("nsq"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("nsq").as("qnsq"), col("table"),
        explode(array(masks.map(m => lit(m)): _*)).as("mask"),
        col("bucket").as("qbucket"))
      .withColumn("probe", col("qbucket").bitwiseXOR(col("mask")))
      .withColumnRenamed("table", "qtable")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    broadcast(q).join(e,
        col("qtable") === col("table") && col("probe") === col("bucket") &&
          col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(dotExpr(col("qvec"), col("embedding"), Dim) /
          sqrt(col("qnsq") * col("nsq")), 6).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
  }

  override def queries: Map[String, Q] = Map(
    // Exact brute-force top-k per query vector.
    "sim_topk_bruteforce" -> ((s, d) => bruteTopK(s, d)),

    // IVF-style: probe only the query's cluster (label equi-join).
    "sim_topk_ivf" -> ((s, d) => {
      val e = Tables.fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"), col("label"),
          normSqExpr(col("embedding"), Dim).as("nsq"))
      val q = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"), col("nsq").as("qnsq"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      broadcast(q).join(e, col("qlabel") === col("label") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          round(dotExpr(col("qvec"), col("embedding"), Dim) /
            sqrt(col("qnsq") * col("nsq")), 6).as("sim"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= K)
    }),

    // SRP-LSH tier, graded by a recall certificate. One table at
    // hamming<=1 measured recall@5 ~= 0.1 on this corpus (top-5 cosines
    // are only ~0.5, i.e. ~60 degrees, so neighbors often differ in 2+
    // sign bits); L independent tables with wider probing is the
    // standard recall lever — 3 tables x hamming<=2 measures recall@5 =
    // 0.68 (sf0.01) / 0.80 (sf0.1), probing ~40% of buckets per table.
    // At larger N, raise `Planes` to keep bucket occupancy — and the
    // probed fraction — constant.
    //
    // The ranked list itself can't hash-match (xxhash64-seeded
    // hyperplanes aren't reproducible in DuckDB, and recall is
    // probabilistic by design), so the DRIVER query emits the
    // certificate instead: mean recall@K of the SRP kernel against the
    // in-Spark exact top-K, asserted ≥ SrpRecallFloor. The SRP hashes
    // are deterministic for a given dataset, so the flag is stable —
    // and a recall regression (fewer tables, narrower probe) flips it
    // red. The ranked output stays pinned by SimilaritySpec.
    // Cost note: certifying recall inherently re-runs the brute-force
    // ground truth, so this query's bench wall ≈ brute + SRP — read
    // the SRP kernel's own cost from sim_topk_ivf/int8 or the spec,
    // not from this row.
    "sim_topk_srp" -> ((s, d) => {
      val matched = bruteTopK(s, d).select(col("qid"), col("vec_id"))
        .join(srpTopK(s, d).select(col("qid"), col("vec_id")),
          Seq("qid", "vec_id"), "left_semi")
      matched.agg(count(lit(1)).as("n_matched"))
        .select(
          lit(NQueries).cast("long").as("n_queries"),
          lit(SrpRecallFloor).as("recall_floor"),
          (col("n_matched").cast("double") / (NQueries * K) >= SrpRecallFloor)
            .cast("long").as("floor_met"))
    }),

    // int8-quantized candidate scan + exact re-rank. Candidates = top
    // `Candidates` per query by integer dot (deterministic tie-break on
    // vec_id); re-rank = the same exact rounded cosine as brute force.
    // int8 relative error is ~1/254 per element, so a 10× candidate
    // margin over K makes missing a true top-K neighbor vanishingly
    // unlikely — verified by grading against the exact brute-force
    // oracle, not assumed.
    "sim_topk_int8" -> ((s, d) => {
      val e = Tables.fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"))
        .withColumn("ma", maxAbsExpr(col("embedding"), Dim))
        .select(col("vec_id"), col("embedding"),
          int8QuantExpr(col("embedding"), Dim, col("ma")).as("qv"),
          (col("ma") / 127.0).as("qs"))
      val q = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("qv").as("qqv"), col("qs").as("qqs"))
      val wCand = Window.partitionBy("qid")
        .orderBy(col("approx").desc, col("vec_id").asc)
      val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
      broadcast(q).join(e, col("qid") =!= col("vec_id"))
        .withColumn("approx",
          intDotExpr(col("qqv"), col("qv"), Dim).cast("double") * col("qqs") * col("qs"))
        .withColumn("crank", row_number().over(wCand))
        .where(col("crank") <= Candidates)
        .select(col("qid"), col("vec_id"),
          round(dotExpr(col("qvec"), col("embedding"), Dim) /
            sqrt(normSqExpr(col("qvec"), Dim) * normSqExpr(col("embedding"), Dim)), 6)
            .as("sim"))
        .withColumn("rank", row_number().over(wExact))
        .where(col("rank") <= K)
    }))

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a.embedding[$i] AS DOUBLE) * CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  private def simSql(a: String, b: String): String =
    s"round((${dotSql(a, b)}) / sqrt((${dotSql(a, a)}) * (${dotSql(b, b)})), 6)"

  private val bruteForceSql =
    s"""SELECT qid, vec_id, sim, rank FROM (
       |  SELECT a.vec_id AS qid, b.vec_id AS vec_id, ${simSql("a", "b")} AS sim,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${simSql("a", "b")} DESC, b.vec_id ASC) AS rank
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $NQueries)
       |WHERE rank <= $K""".stripMargin

  override def oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> bruteForceSql,
    // The int8 tier's candidate margin makes its output equal exact
    // brute force — graded against the same oracle (cf. minhash-lsh vs
    // the exact Jaccard oracle).
    "sim_topk_int8" -> bruteForceSql,

    "sim_topk_ivf" ->
      s"""SELECT qid, vec_id, sim, rank FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS vec_id, ${simSql("a", "b")} AS sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${simSql("a", "b")} DESC, b.vec_id ASC) AS rank
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $NQueries)
         |WHERE rank <= $K""".stripMargin,

    // The oracle asserts the SRP recall certificate: query count from
    // the data, the floor as a shared literal, and floor_met = 1.
    // Certificates ship as BIGINT 0/1, not BOOLEAN: integer columns are
    // the one output type every driver-graded query has exercised,
    // and a novel type in the driver's canonicalizer is exactly how r3
    // lost a row (the ARRAY lesson).
    "sim_topk_srp" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  $SrpRecallFloor AS recall_floor, CAST(1 AS BIGINT) AS floor_met
         |FROM embeddings WHERE vec_id < $NQueries""".stripMargin)
}
