package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining engine-surface coverage: distinct aggregates (exact +
  * HyperLogLog), and the SQL string interface (`spark.sql`) over
  * registered views — a reference user gets the full declarative
  * surface, not just the DataFrame DSL.
  */
object MiscQueries extends QueryPack {

  /** Hot-block guard for the edit-distance blocking family (r8 verdict
    * #2): block key = first name token, and TPC-H first tokens come
    * from a ~92-word pool, so at 100× one block holds ~1% of all
    * distinct names — O(block²) levenshtein pairs through one
    * reducer's key. Blocks holding more than `cap` distinct names are
    * EXCLUDED from pair generation, with the exclusion COUNTED AND
    * LOGGED (no silent caps): a block that big is a failed blocking
    * key, not resolvable entity signal — production would re-block it
    * on a finer key, which is a data-modeling decision, not something
    * to paper over in the operator. Same guard family as the clique
    * cap (RelationalQueries.cliqueCap) and the wedge hubCap
    * (GraphOps.commonNeighbors). Driver-SF blocks are far below the
    * default, and the ORACLES interpolate the same resolved cap, so
    * Spark and DuckDB stay in lockstep even under the env override.
    * `SPARK_GRAFT_BLOCK_CAP` overrides (0 disables — Soak A/B). */
  private[graft] def blockCap: Int =
    sys.env.get("SPARK_GRAFT_BLOCK_CAP").map(_.toInt).getOrElse(10000)

  /** Code-point Levenshtein in DuckDB SQL. DuckDB's built-in
    * levenshtein() is BYTE-based (levenshtein('café','cafe') = 2,
    * 'a😀b' vs 'ab' = 4) while Spark's is code-point-based — the
    * engine contract this library pins (edit operations on characters,
    * not encoding units; the UnicodeText.scala discipline). ASCII
    * strings take the built-in fast path (strlen = length ⟺ every
    * code point is one byte, where the two semantics coincide — the
    * stock corpus never pays the DP); multibyte pairs run a
    * Wagner-Fischer fold over string_split(s,'') (code-point units):
    * the DP row is the fold state, and the row recurrence's
    * left-to-right dependency is replayed as new[j] = j +
    * min_{k≤j}(t[k] − k) (t = the substitution/deletion candidates),
    * the prefix-min reformulation that avoids a sequential inner fold
    * — O(n³) per pair but only on injected multibyte names inside
    * capped blocks. Verified against kitten/sitting=3, flaw/lawn=2,
    * saturday/sunday=3, intention/execution=5, empty-string edges,
    * and the multibyte cases above. */
  private def cpLevSql(a: String, b: String): String = {
    val ca = s"string_split($a, '')"
    val cb = s"string_split($b, '')"
    val n = s"length($a)"
    s"""CASE WHEN $a = $b THEN 0
       |  WHEN strlen($a) = length($a) AND strlen($b) = length($b)
       |    THEN levenshtein($a, $b)
       |  ELSE list_reduce(
       |    list_prepend(list_transform(range(0, $n + 1), v -> CAST(v AS BIGINT)),
       |                 list_transform(range(1, length($b) + 1), i -> [CAST(i AS BIGINT)])),
       |    (acc, el) -> list_transform(range(0, $n + 1), j ->
       |      CASE WHEN j = 0 THEN acc[1] + 1
       |      ELSE least(
       |        acc[1] + 1 + j,
       |        j + list_min(list_transform(range(1, j + 1), k ->
       |          least(acc[k + 1] + 1, acc[k] +
       |            CASE WHEN $ca[CAST(k AS INTEGER)] = $cb[CAST(el[1] AS INTEGER)]
       |                 THEN 0 ELSE 1 END) - k)))
       |      END))[$n + 1] END""".stripMargin
  }

  /** SQL fragment applying the same cap to an oracle's block CTE `b0`
    * (columns ... , blk): selects the surviving rows. */
  private def cappedBlockSql(cap: Int): String =
    if (cap <= 0) "SELECT * FROM b0"
    else s"""SELECT b0.* FROM b0 JOIN (
            |    SELECT blk FROM b0 GROUP BY blk HAVING count(*) <= $cap) ok
            |  USING (blk)""".stripMargin

  /** Blocking kernel shared by q_fuzzy_name_pairs and
    * q_entity_resolution: derive the block key from `p_name`, census
    * the blocks, drop hot ones (logged), return the surviving rows
    * with their `blk` column. `names` should be distinct-name
    * cardinality (the callers aggregate first). */
  private[graft] def cappedBlocks(names: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    val blocked0 = names.withColumn("blk", split(col("p_name"), " ").getItem(0))
    if (cap <= 0) blocked0
    else {
      // pinned: the block census runs TWICE (the eager exclusion log
      // and the anti-join at execution) — without the pin the whole
      // distinct-names derivation above recomputes per consumer
      val blocked = graft.CacheRegistry.persistTracked(blocked0)
      val hot = blocked.groupBy("blk").agg(count(lit(1)).as("bn"))
        .where(col("bn") > cap)
      // tiny relation (≤ distinct block keys); the count doubles as the
      // REQUIRED exclusion log — a capped block must never be silent
      val dropped = hot.agg(
        coalesce(count(lit(1)), lit(0L)).as("blocks"),
        coalesce(sum(col("bn")), lit(0L)).as("names")).head
      if (dropped.getLong(0) > 0)
        System.err.println(s"[graft] blocking cap $cap excluded " +
          s"${dropped.getLong(0)} hot block(s) carrying ${dropped.getLong(1)} names " +
          "from edit-distance pair generation")
      blocked.join(broadcast(hot.select("blk")), Seq("blk"), "left_anti")
    }
  }

  /** The ER match stage alone — blocking self-join + edit-distance
    * verifier over a (p_name, nid) entity table — factored out so
    * PlanInvariantsSpec can pin the LevenshteinBandRule rewrite on the
    * EXACT pair plan q_entity_resolution executes (the driver query
    * consumes this eagerly through the union-find, so its final plan
    * no longer shows the match predicate). */
  private[graft] def erMatchPairs(names: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val blocked = cappedBlocks(names.select("p_name", "nid"), blockCap)
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 4)
      .select(least(col("a.nid"), col("b.nid")).as("i"),
        greatest(col("a.nid"), col("b.nid")).as("j"))
  }

  override def queries: Map[String, Q] = Map(
    // Data-profiling audit — the corpus-health dashboard query every
    // engine needs before anything else runs: row count, per-column
    // null counts, low-cardinality distincts, value ranges, and the
    // exact-decimal total, all in ONE pass over the table (one scan,
    // one aggregate; the two countDistincts ride the same expand).
    // The mean is NOT avg() over doubles — summation order is
    // partition-dependent; it's the exact DECIMAL sum divided once,
    // mirrored in DuckDB.
    "q_profile_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
          sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_orderdate"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          countDistinct(col("o_orderpriority")).as("n_priority"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").as("total_price"))
        .select(col("n_rows"), col("null_custkey"), col("null_orderdate"),
          col("n_status"), col("n_priority"), col("min_date"), col("max_date"),
          col("min_price"), col("max_price"), col("total_price"),
          (col("total_price") / col("n_rows")).as("mean_price"))),

    // Exact distinct aggregation (expand + two-phase agg under AQE).
    "q_distinct_users" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),

    // HyperLogLog++ cardinality next to the exact answer (the 100 TB
    // path: one pass, constant memory, no expand). Bounded-error
    // grading: the raw estimate can't hash-match (DuckDB can't replay
    // Spark's HLL registers), so the output carries the exact count and
    // a within_bound certificate — |approx−exact|/exact ≤ 3·rsd — that
    // the oracle asserts TRUE. The sketch is deterministic for a given
    // dataset, so the flag is stable, and a broken sketch flips it red.
    //
    // NEVER fuse countDistinct with the sketch in one aggregate: that
    // fusion plans the distinct-rewrite Expand and threads the 16 KB
    // rsd=0.01 HLL buffer through every intermediate (type, user)
    // group — the q_events_hau_approx defect (r13 §4b, 16–27×). HLL
    // registers are multiplicity-insensitive, so BOTH the exact count
    // and the sketch run over one pre-distincted (event_type, user_id)
    // projection: identical estimate, identical exact count, and the
    // sketch buffers exist only in the final event_type-cardinality
    // aggregate. The isNotNull filter preserves countDistinct's
    // null-exclusion semantics through the count(*) rewrite.
    "q_approx_distinct_users" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_users_exact"),
          approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"))
        .select(col("event_type"), col("n_users_exact"),
          (abs(col("approx") - col("n_users_exact")).cast("double") /
            col("n_users_exact") <= 0.03).cast("long").as("within_bound"))),

    // Deterministic train/test split (id-hash bucketing): every doc
    // lands in exactly one split, stable across runs and engines.
    "q_train_test_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          when(pmod(col("doc_id"), lit(10)) < 2, "test").otherwise("train").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("cnt"))),

    // Semi-structured JSON column: extract a field, bucket, aggregate
    // (the engine's schema-on-read path for the events props payload).
    // DIRTY-DATA contract (r14 props axis): a 100 TB props column
    // carries NULLs, malformed JSON, and non-integer k values, and the
    // two engines' native paths disagree on every one of them —
    // DuckDB's ->> ERRORS on malformed JSON where get_json_object is
    // lenient, Spark's ANSI cast THROWS on 'notanum' where the oracle
    // needs a value, and DuckDB's TRY_CAST('3.7' AS INTEGER) ROUNDS
    // to 4 where Spark's try_cast is NULL. Pinned: lenient extraction
    // (malformed/missing → NULL) + Spark try_cast string→int
    // semantics (integer-shaped text only, trimAll whitespace; floats
    // and garbage → NULL) — the oracle replays that with a
    // json_valid guard plus a full-match [\x00-\x20]*[+-]?digits
    // regex before its TRY_CAST.
    "q_events_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))
        // floor division, not `div` (truncation): for negative k the two
        // bucket negatives differently and DuckDB's // floors.
        .groupBy(col("event_type"), floor(col("k") / lit(10.0)).cast("long").as("k_decile"))
        .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))),

    // Range join via binning: map each price to its uniform band by
    // arithmetic instead of a nested-loop BETWEEN join — the interval
    // side joins as a broadcast equi-join on the bin id, the technique
    // that keeps range joins O(n) at scale. Oracle uses the naive
    // BETWEEN join; results are identical because bands are uniform.
    "q_price_band_join" -> ((s, d) => {
      import s.implicits._
      val bandWidth = 200.0
      val bands = broadcast((0 until 10)
        .map(i => (i, i * bandWidth, (i + 1) * bandWidth))
        .toDF("band", "lo", "hi"))
      Tables.part(s, d)
        .where(col("p_retailprice") >= 0 && col("p_retailprice") < 10 * bandWidth)
        .withColumn("band", floor(col("p_retailprice") / bandWidth).cast("int"))
        .join(bands, Seq("band"))
        .groupBy("band", "lo", "hi")
        .agg(count(lit(1)).as("n_parts"),
          // exact DECIMAL sum shipped as DOUBLE (DECIMAL outputs can't
          // hash-match the driver's float64 oracle reader)
          sum(col("p_retailprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
    }),

    // Count-Min Sketch heavy hitters with bounded-error grading: the
    // estimate itself can't hash-match (Spark's CMS hashing isn't
    // reproducible in DuckDB), so the output carries the exact top-10
    // counts and the CMS guarantee as a certificate — estimate ≥ exact
    // (always) and estimate ≤ exact + eps·N (w.p. 1−δ per key; the
    // sketch is deterministic at seed 42 so the flag is stable). The
    // oracle asserts both; a broken sketch flips within_bound red.
    "q_heavy_hitters_cms" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val eps = 0.001
      val cms = li.stat.countMinSketch(col("l_partkey"), eps = eps,
        confidence = 0.99, seed = 42)
      // N for the eps·N bound rides the plan as a broadcast 1-row cross
      // (the sketch build is the one unavoidable extra pass; a separate
      // driver-side count() would make it three lineitem scans)
      val tot = li.agg(count(lit(1)).as("n_total"))
      val top = li.groupBy("l_partkey").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("l_partkey").asc).limit(10)
      val est = udf((k: Long) => cms.estimateCount(k))
      top.withColumn("cms_estimate", est(col("l_partkey")))
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("exact"),
          (col("cms_estimate") >= col("exact") &&
            col("cms_estimate") <= col("exact") +
              ceil(lit(eps) * col("n_total")).cast("long"))
            .cast("long").as("within_bound"))
    }),

    // Bloom-prefilter join: build a Bloom filter on the small side's
    // keys, drop non-matching big-side rows BEFORE the join (the
    // runtime-filter / semi-join-pushdown pattern — at 100 TB the bloom
    // kills ~99% of probe rows at the scan, so the shuffle carries only
    // plausible matches), then the exact join removes the bloom's false
    // positives. Output therefore EQUALS the plain join — oracle-graded
    // by it. The filter itself is a few MB broadcast, same envelope as
    // any broadcast dim.
    "q_bloom_prefilter" -> ((s, d) => {
      val hot = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
        .select(col("o_orderkey"))
      // Size the filter from the observed build side (floor keeps tiny
      // builds honest): a fixed capacity silently degrades the FPP
      // toward 1 once the hot set outgrows it — the join stays exact
      // but the prefilter stops cutting rows, which is the mechanism
      // this query exists to demonstrate (see ScalePatternsSpec).
      val nHot = hot.count()
      // A ScalaUDF compiles into the WholeStageCodegen span (boxed
      // call), so the probe filter does not split the stage; the
      // native BloomFilterMightContain expression would avoid the
      // boxing but is not in Spark 4.1's public function registry
      // (UNRESOLVED_ROUTINE — verified), and it hashes through
      // xxhash64, which would also require building the filter over
      // hashed keys. The boxed call is the honest public-API path.
      // An EMPTY build side returns a bloom filter with a null buffer
      // whose mightContain NPEs (r13 empty axis) — nothing can join, so
      // the prefilter is simply false.
      val bloomCut =
        if (nHot == 0) lit(false)
        else {
          val bf = hot.stat.bloomFilter("o_orderkey", math.max(nHot, 1024L), 0.01)
          val bc = graft.CacheRegistry.broadcastTracked(s.sparkContext.broadcast(bf))
          udf((k: Long) => bc.value.mightContainLong(k)).apply(col("l_orderkey"))
        }
      Tables.lineitem(s, d)
        .where(bloomCut)                             // bloom cut at the scan
        .join(hot, col("l_orderkey") === col("o_orderkey")) // exact: drops FPs
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          // quantities are integer-valued doubles -> the sum is exact
          sum(col("l_quantity")).cast("long").as("sum_qty"))
    }),

    // Blocked fuzzy matching (entity-resolution shape): candidate name
    // pairs within an edit distance, restricted to a blocking key so
    // the comparison is O(Σ block²), never O(n²) — the same
    // index-don't-cross-everything discipline as the dedup family, with
    // levenshtein() as the verifier. The distinct-name table is tiny
    // relative to the rows that carry the names (64 vs 2000 here, same
    // at 100 TB where entities repeat massively), so dedupe FIRST, then
    // compare.
    "q_fuzzy_name_pairs" -> ((s, d) => {
      val names = cappedBlocks(
        Tables.part(s, d).select(col("p_name")).distinct(), blockCap)
      val a = names.select(col("p_name").as("name_a"), col("blk"))
      val b = names.select(col("p_name").as("name_b"), col("blk").as("blk_b"))
      a.join(b, col("blk") === col("blk_b") && col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"))
        .where(col("edit_dist") <= 4)
    }),

    // Entity resolution END-TO-END — blocking → edit-distance match →
    // connected-component clustering → canonical survivor, composed
    // from the same kernels the dedup family runs one tier at a time
    // (q_fuzzy_name_pairs is the match stage alone; this is the whole
    // master-data pipeline on the part-name entity domain). Names
    // dedupe to entity cardinality FIRST (64 distinct names carry 2000
    // rows here; entities repeat massively at 100 TB too) and get a
    // deterministic integer id (min carrying row key) so the cluster
    // stage works on 8-byte ids; clustering reuses the size-gated
    // driver union-find with the GraphX CC fallback (labels identical
    // either way). Output: one row per resolved entity ≥ 2 variants —
    // canonical (min) name, variant count, carried row mass.
    "q_entity_resolution" -> ((s, d) => {
      val names = graft.CacheRegistry.persistTracked(
        Tables.part(s, d).groupBy("p_name")
          .agg(min(col("p_partkey")).as("nid"), count(lit(1)).as("rows_n")))
      DedupQueries.pairsToClusters(s, erMatchPairs(names))
        .join(names, col("doc_id") === col("nid"))
        .groupBy("root")
        .agg(min(col("p_name")).as("canonical"), count(lit(1)).as("n_names"),
          sum(col("rows_n")).as("n_rows"))
        .select(col("canonical"), col("n_names"), col("n_rows"))
    }),

    // Salted skew join: the planned fix for a hot probe key — each
    // lineitem row picks a deterministic shard from its own content,
    // orders replicate once per shard, and the join key becomes
    // (orderkey, shard) so no single reducer owns a hot key's whole
    // mass. Output EQUALS the plain join (the salt never reaches the
    // result), so the plain-join SQL oracles it; ScalePatternsSpec pins
    // the mechanism (probe rows of one key really do spread).
    "q_skew_salted_join" -> ((s, d) =>
      graft.functions.SkewJoin.salted(
          Tables.lineitem(s, d), Tables.orders(s, d),
          probeKey = "l_orderkey", buildKey = "o_orderkey", salts = 8,
          probeSalt = xxhash64(col("l_orderkey"), col("l_linenumber")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          // quantities are integer-valued doubles -> the sum is exact
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy("o_orderpriority")),

    // The same pricing summary through the SQL string interface.
    "q_sql_interface" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order
        FROM v_lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")
    }))

  override def oracles: Map[String, String] = Map(
    "q_train_test_split" ->
      """SELECT CASE WHEN doc_id % 10 < 2 THEN 'test' ELSE 'train' END AS split,
        |  lang, count(*) AS cnt
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q_profile_orders" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priority,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) / count(*) AS mean_price
        |FROM orders""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // The oracle asserts the certificate: exact value matches AND the
    // HLL estimate landed within its documented 3·rsd envelope.
    // WHERE user_id IS NOT NULL: the Spark side pre-filters before its
    // distinct projection, which also removes GROUPS whose every
    // user_id is NULL — without the mirror filter the oracle would
    // still emit such a group as (etype, 0, 1) and the row counts
    // would split the first time a null user_id ships. (Per-group
    // counts were already aligned: count(DISTINCT) skips nulls.)
    "q_approx_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin,

    // Top-10 exact heavy hitters + the CMS overcount guarantee as a
    // certificate column the oracle asserts TRUE.
    "q_heavy_hitters_cms" ->
      """SELECT l_partkey, count(*) AS exact, CAST(1 AS BIGINT) AS within_bound
        |FROM lineitem GROUP BY 1
        |ORDER BY exact DESC, l_partkey ASC LIMIT 10""".stripMargin,

    "q_price_band_join" ->
      """WITH bands AS (
        |  SELECT i AS band, i * 200.0 AS lo, (i + 1) * 200.0 AS hi
        |  FROM range(0, 10) t(i))
        |SELECT band, lo, hi, count(*) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY 1, 2, 3""".stripMargin,

    // json_valid guards ->> (DuckDB errors on malformed JSON; Spark's
    // get_json_object yields NULL); the full-match regex + extract
    // replays Spark's try_cast string→int exactly — integer-shaped
    // text with trimAll ([\x00-\x20]) padding only, never DuckDB's
    // rounding TRY_CAST('3.7') = 4
    "q_events_props" ->
      """WITH kx AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(props) THEN props->>'k' END AS kt
        |  FROM events),
        |kv AS (
        |  SELECT event_type,
        |    CASE WHEN regexp_matches(kt, '^[\x00-\x20]*[+-]?[0-9]+[\x00-\x20]*$')
        |         THEN TRY_CAST(regexp_extract(kt, '[+-]?[0-9]+') AS INTEGER) END AS k
        |  FROM kx)
        |SELECT event_type,
        |  CAST(floor(k / 10.0) AS BIGINT) AS k_decile,
        |  count(*) AS cnt,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM kv GROUP BY 1, 2""".stripMargin,

    "q_bloom_prefilter" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        |GROUP BY 1""".stripMargin,

    "q_fuzzy_name_pairs" ->
      s"""WITH n AS (SELECT DISTINCT p_name FROM part),
        |b0 AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM n),
        |b AS (${cappedBlockSql(blockCap)})
        |SELECT name_a, name_b, edit_dist FROM (
        |  SELECT a.p_name AS name_a, c.p_name AS name_b,
        |    CAST((${cpLevSql("a.p_name", "c.p_name")}) AS BIGINT) AS edit_dist
        |  FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name)
        |WHERE edit_dist <= 4""".stripMargin,

    // min-label transitive closure replayed as a recursive CTE (the
    // dedup_clusters oracle pattern) over the same blocked
    // edit-distance pair set.
    "q_entity_resolution" ->
      s"""WITH RECURSIVE n AS (
        |  SELECT p_name, min(p_partkey) AS nid, count(*) AS rows_n
        |  FROM part GROUP BY 1),
        |b0 AS (SELECT p_name, nid, string_split(p_name, ' ')[1] AS blk FROM n),
        |b AS (${cappedBlockSql(blockCap)}),
        |p AS (
        |  SELECT i, j FROM (
        |    SELECT least(a.nid, c.nid) AS i, greatest(a.nid, c.nid) AS j,
        |      (${cpLevSql("a.p_name", "c.p_name")}) AS ed
        |    FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name)
        |  WHERE ed <= 4),
        |dedges AS (SELECT i AS a, j AS b FROM p UNION ALL SELECT j, i FROM p),
        |dnodes AS (SELECT DISTINCT a AS v FROM dedges),
        |cc(v, lbl) AS (
        |  SELECT v, v FROM dnodes
        |  UNION
        |  SELECT e.b, cc.lbl FROM cc JOIN dedges e ON cc.v = e.a),
        |roots AS (SELECT v, min(lbl) AS root FROM cc GROUP BY v)
        |SELECT min(p_name) AS canonical, count(*) AS n_names,
        |  CAST(sum(rows_n) AS BIGINT) AS n_rows
        |FROM roots JOIN n ON roots.v = n.nid
        |GROUP BY root""".stripMargin,

    // The salt is internal to the shuffle layout — the result is the
    // plain join's, so the plain join grades it.
    "q_skew_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sql_interface" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= '1998-09-02'
        |GROUP BY 1, 2""".stripMargin)
}
