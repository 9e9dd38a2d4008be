package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared fixture helpers and oracle-SQL building blocks for the query
  * registries ([[SparkEntry]], [[PipelineRegistry]], [[LinkageRegistry]],
  * [[EvalRegistry]]) — split out of SparkEntry in r16 so each family
  * file stays reviewable while the helpers keep a single home.
  */
private[graft] object RegistryFixtures {
  import Tables.t

  // ---- shared diff fixtures: two sides derived deterministically from the
  //      same table so drift exists in both directions ----
  private[graft] def lineitemSides(s: SparkSession, dir: String): (MemorySide, MemorySide) = {
    val li = t(s, dir, "lineitem")
    (MemorySide("db1", Map("lineitem" -> li.filter("l_orderkey % 97 != 0"))),
     MemorySide("db2", Map("lineitem" -> li.filter("l_orderkey % 89 != 0"))))
  }
  private[graft] val lineitemSidesSql =
    """s1 AS (SELECT * FROM lineitem WHERE l_orderkey % 97 <> 0),
      |s2 AS (SELECT * FROM lineitem WHERE l_orderkey % 89 <> 0),
      |d1 AS (SELECT * FROM s1 EXCEPT SELECT * FROM s2),
      |d2 AS (SELECT * FROM s2 EXCEPT SELECT * FROM s1)""".stripMargin

  /** Exact DECIMAL(18,2) sum of a double column, rendered back as DOUBLE. */
  private[graft] def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  /** One DuckDB replay block for [[graft.operators.Expectations.uniqueApproxGate]]:
    * rebuilds the p=6 md5 HLL registers of `table.c`, the bias-corrected
    * estimate, and the clamped duplicate fraction — bit-for-bit the Spark
    * plan's arithmetic (same float op order, same 6-dp rounds).
    */
  private[graft] def uniqueApproxOracleBlock(table: String, c: String, tol: String): String =
    s"""SELECT 'unique_approx' AS rule, '$c' AS "column",
       |  round(greatest(0.0, (n - est) / n), 6) AS metric,
       |  CAST($tol AS DOUBLE) AS threshold,
       |  round(greatest(0.0, (n - est) / n), 6) <= CAST($tol AS DOUBLE) AS ok
       |FROM (
       |  SELECT CAST((SELECT count(*) FROM $table WHERE $c IS NOT NULL) AS DOUBLE) AS n,
       |    (SELECT CASE WHEN raw <= 160.0 AND v > 0
       |       THEN round(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE)), 6)
       |       ELSE round(raw, 6) END
       |     FROM (SELECT CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE)
       |         * CAST(36028797018963968 AS DOUBLE) / CAST(zi AS DOUBLE) AS raw, v
       |       FROM (SELECT zhit + (64 - nhit) * (CAST(1 AS BIGINT) << 55) AS zi,
       |           64 - nhit AS v
       |         FROM (SELECT sum(CAST(1 AS BIGINT) << (55 - register)) AS zhit,
       |             count(*) AS nhit
       |           FROM (SELECT h % 64 AS bucket,
       |               max(CASE WHEN (h >> 6) = 0 THEN 55
       |                 ELSE 55 - length(bin(h >> 6)) END) AS register
       |             FROM (SELECT CAST(CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))
       |                 AS UBIGINT) AS BIGINT) AS h
       |               FROM $table WHERE $c IS NOT NULL) hh GROUP BY 1) rr) zz) ff) gg) AS est
       |) base""".stripMargin

  // ---- PQ planted fixture: 32-dim points, 4 subspaces of 8 dims; the
  //      subspace-j sub-vector sits at 10*onehot8(g_j) with
  //      g_j = floor(vec_id / 4^j) % 4, plus 0.01x embedding noise
  //      (|noise| <= ~0.006/dim vs a 10.0 planted component) ----
  /** DuckDB replay of [[graft.operators.Layout.hilbertKey]] on
    * (p_partkey, p_size): the xy2d rotate/reflect loop unrolled into
    * one CTE per level — generated here so the SQL stays mechanically
    * in lockstep with the Scala unroll (same quadrant arithmetic
    * 3rx + ry − 2rxry, same n−1 reflection).
    */
  private[graft] def hilbertOracle(bits: Int): String = {
    val n1 = (1L << bits) - 1
    val levels = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""h${i + 1} AS (SELECT p_partkey, p_size,
         |    d$i + ${s * s} * (3 * rx + ry - 2 * rx * ry) AS d${i + 1},
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1
         |      THEN $n1 - y$i ELSE y$i END) ELSE x$i END AS x${i + 1},
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1
         |      THEN $n1 - x$i ELSE x$i END) ELSE y$i END AS y${i + 1}
         |  FROM (SELECT *,
         |      CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM h$i) t${i + 1})""".stripMargin
    }
    s"""WITH h0 AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
       |    p_partkey & $n1 AS x0, CAST(p_size AS BIGINT) & $n1 AS y0,
       |    CAST(0 AS BIGINT) AS d0 FROM part),
       |${levels.mkString(",\n")}
       |SELECT p_partkey, p_size, d$bits AS h FROM h$bits
       |ORDER BY h, p_partkey""".stripMargin
  }

  /** Mechanical unroll of the Skilling 3-D Hilbert transform
    * ([[graft.functions.HilbertKey3]]) as DuckDB CTE levels: per bit
    * level Q, three sequential invert/exchange sub-steps against axis
    * 0, then Gray encode + the Q-fold correction + the transpose
    * interleave — generated from the same constants as the kernel, so
    * the oracle replays it value-exactly.
    */
  private[graft] def hilbert3Oracle(bits: Int): String = {
    val n1 = (1L << bits) - 1
    val keep = "p_partkey, p_size, p_price"
    val sb = new StringBuilder
    sb.append(
      s"""WITH s0 AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         |    CAST(floor(p_retailprice) AS BIGINT) AS p_price,
         |    p_partkey & $n1 AS a, CAST(p_size AS BIGINT) & $n1 AS b,
         |    CAST(floor(p_retailprice) AS BIGINT) & $n1 AS c FROM part)""".stripMargin)
    var step = 0
    for (lvl <- 0 until (bits - 1)) {
      val q = 1L << (bits - 1 - lvl); val p = q - 1
      step += 1
      sb.append(
        s""",\ns$step AS (SELECT $keep,
           |  CASE WHEN (a & $q) != 0 THEN xor(a, $p) ELSE a END AS a,
           |  b, c FROM s${step - 1})""".stripMargin)
      step += 1
      sb.append(
        s""",\ns$step AS (SELECT $keep,
           |  CASE WHEN (b & $q) != 0 THEN xor(a, $p)
           |    ELSE xor(a, xor(a, b) & $p) END AS a,
           |  CASE WHEN (b & $q) != 0 THEN b
           |    ELSE xor(b, xor(a, b) & $p) END AS b,
           |  c FROM s${step - 1})""".stripMargin)
      step += 1
      sb.append(
        s""",\ns$step AS (SELECT $keep,
           |  CASE WHEN (c & $q) != 0 THEN xor(a, $p)
           |    ELSE xor(a, xor(a, c) & $p) END AS a,
           |  b,
           |  CASE WHEN (c & $q) != 0 THEN c
           |    ELSE xor(c, xor(a, c) & $p) END AS c FROM s${step - 1})""".stripMargin)
    }
    val tTerms = (1 until bits).map { i =>
      val q = 1L << i
      s"CASE WHEN (g2 & $q) != 0 THEN ${q - 1} ELSE 0 END"
    }
    val tFold =
      if (tTerms.size == 1) tTerms.head
      else tTerms.reduce((x, y) => s"xor($x, $y)")
    sb.append(
      s""",\ngray AS (SELECT $keep, a AS g0, xor(b, a) AS g1,
         |  xor(c, xor(b, a)) AS g2 FROM s$step),
         |fin AS (SELECT $keep, xor(g0, t) AS f0, xor(g1, t) AS f1,
         |  xor(g2, t) AS f2 FROM (SELECT *, $tFold AS t FROM gray))""".stripMargin)
    val interleave = (0 until bits).flatMap { k =>
      Seq(s"(((f0 >> $k) & 1) << ${3 * k + 2})",
        s"(((f1 >> $k) & 1) << ${3 * k + 1})",
        s"(((f2 >> $k) & 1) << ${3 * k})")
    }.mkString(" + ")
    sb.append(
      s"""\nSELECT $keep, $interleave AS h FROM fin
         |ORDER BY h, p_partkey""".stripMargin)
    sb.toString
  }

  /** Temp directories to delete at JVM exit, drained by ONE hook
    * registered lazily on first use (per-invocation hooks would
    * accumulate a thread per run in a long-lived session).
    */
  private[graft] lazy val exitCleanupDirs: java.util.Queue[java.nio.file.Path] = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p); ()
      }
      var d = q.poll()
      while (d != null) {
        try rm(d) catch { case _: Exception => () }
        d = q.poll()
      }
    }))
    q
  }

  private[graft] def pqPlantedPoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"),
      transform(slice(col("embedding"), 1, 32), (x, i) => {
        val j = floor(i.cast("double") / lit(8.0))
        val g = pmod(floor(col("vec_id").cast("double") / pow(lit(4.0), j)).cast("long"), lit(4L))
        val pos = i.cast("long") - j.cast("long") * lit(8L)
        when(pos === g, lit(10.0)).otherwise(lit(0.0)) + lit(0.01) * x.cast("double")
      }).as("v"))

  /** The exact planted codebook: every subspace's 4 centroids are
    * 10*onehot8(c) — hand-specified, so encode/ADC are closed-form
    * (codebook TRAINING is exercised by spec, where sampled k-means
    * must recover these centroids).
    */
  private[graft] val pqPlantedBooks: Array[Array[Array[Double]]] =
    Array.tabulate(4)(_ => Array.tabulate(4)(c =>
      Array.tabulate(8)(p => if (p == c) 10.0 else 0.0)))


  private[graft] val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  /** DuckDB rendering of [[graft.functions.WordShingles]] (3-gram word
    * shingles, distinct, whole-text fallback below 3 tokens) over a token
    * list column named `tk`.
    */
  private[graft] val shinglesSql =
    """CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |     ELSE list_distinct(list_transform(range(1, len(tk) - 1),
      |            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END""".stripMargin
  /** Shared truth for q_incremental_dedup AND q_dedup_index (the
    * persisted-index round trip must reproduce the direct computation
    * exactly): exact all-pairs Jaccard between the new batch
    * (doc_id % 3 = 0) and the corpus, via the inverted-index equi-join.
    */
  private[graft] lazy val incrementalDedupTruthSql =
    s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
      |sh AS (SELECT doc_id, $shinglesSql AS s FROM tks),
      |sz AS (SELECT doc_id, len(s) AS n FROM sh),
      |newd AS (SELECT doc_id, s FROM sh WHERE doc_id % 3 = 0),
      |exn AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 3 = 0),
      |exc AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 3 <> 0),
      |cand AS (SELECT n.doc_id AS new_id, c.doc_id AS cid, count(*) AS inter
      |  FROM exn n JOIN exc c USING (g) GROUP BY 1, 2),
      |pairs AS (SELECT new_id, cid,
      |    CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) AS j
      |  FROM cand JOIN sz s1 ON s1.doc_id = new_id JOIN sz s2 ON s2.doc_id = cid),
      |best AS (SELECT new_id, min(cid) AS matched_id FROM pairs
      |  WHERE j >= 0.5 GROUP BY new_id),
      |bj AS (SELECT b.new_id, b.matched_id, p.j AS jaccard
      |  FROM best b JOIN pairs p ON p.new_id = b.new_id AND p.cid = b.matched_id)
      |SELECT n.doc_id AS new_id, bj.matched_id, bj.jaccard,
      |  bj.matched_id IS NULL AS is_novel
      |FROM newd n LEFT JOIN bj ON bj.new_id = n.doc_id
      |ORDER BY new_id""".stripMargin

  /** Exact shingle-Jaccard truth CTEs (`sh` -> `pairs`), formulated as
    * an inverted-index equi-join rather than the naive all-pairs cross:
    * candidates are pairs SHARING at least one shingle (`ex` self-join
    * on the gram, counted per pair), which is lossless for any positive
    * Jaccard — a pair with J > 0 shares a shingle by definition, so
    * every pair any threshold keeps is present. Intersection size comes
    * from the join count, union from |A|+|B|−|A∩B|; same integers, same
    * IEEE division, bit-identical jaccard as the cross formulation —
    * verified equal at sf0.01 — but DuckDB-feasible at sf0.1+ (the
    * cross form is 12.5M list intersections there; this is one hash
    * join + group-by that finishes in ~2 s).
    */
  private[graft] val jaccardTruthSql =
    s"""tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
      |sh AS (SELECT doc_id, $shinglesSql AS s FROM tks),
      |sz AS (SELECT doc_id, len(s) AS n FROM sh),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
      |  FROM ex a JOIN ex b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (SELECT id1, id2,
      |    CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) AS jaccard
      |  FROM cand JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2)""".stripMargin
  private[graft] val stopSql = TextAnalysis.stopwordList.map(s => s"'$s'").mkString("[", ", ", "]")
  /** Shared quality-score derivation (mirrors
    * [[graft.operators.TextAnalysis.qualityFeatures]]); exposes `qs`
    * (doc_id, n_tokens, punct_ratio, stop_ratio, mean_token_len,
    * quality_score).
    */
  private[graft] lazy val qualityCtes =
    s"""f AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
      |m AS (SELECT doc_id,
      |    len(toks) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    CAST(len(list_filter(toks, x -> list_contains($stopSql, x))) AS DOUBLE)
      |      / greatest(len(toks), 1) AS stop_ratio,
      |    CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mean_token_len
      |  FROM f),
      |qs AS (SELECT doc_id, n_tokens, punct_ratio, stop_ratio, mean_token_len,
      |  CAST((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 4 ELSE 0 END +
      |        CASE WHEN punct_ratio <= 0.2 THEN 2 ELSE 0 END +
      |        CASE WHEN stop_ratio >= 0.05 THEN 2 ELSE 0 END +
      |        CASE WHEN mean_token_len BETWEEN 3 AND 12 THEN 2 ELSE 0 END)
      |    AS DOUBLE) / CAST(10 AS DOUBLE) AS quality_score
      |  FROM m)""".stripMargin
  private[graft] val cosSql =
    "list_dot_product(a.ve, b.ve) / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve)))"

  /** Shared WITH-body replaying Graph.randomWalks' seeded walks over the
    * q_random_walks fixture (lineitem folded to 500 node ids, starts at
    * src % 7 == 0, walk length 4, seed 7): ends in a `steps` CTE of
    * (walk_id, step, node). Used by q_random_walks and q_walk_skipgrams.
    */
  private[graft] val walkOracleCtes: String = {
    def stepCte(k: Int): String =
      s"""s$k AS (SELECT f.walk_id, n.dst AS node FROM s${k - 1} f
         |  JOIN nbr n ON n.src = f.node AND n.rnk =
         |    CAST(CAST(('0x' || substr(md5('rw:7:' ||
         |      CAST(f.walk_id AS VARCHAR) || ':$k:' ||
         |      CAST(f.node AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
         |      % n.deg)""".stripMargin
    s"""e AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
      |    CAST(l_suppkey % 500 AS BIGINT) AS dst FROM lineitem),
      |nbr AS (SELECT src, dst,
      |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
      |      AS BIGINT) AS rnk,
      |    count(*) OVER (PARTITION BY src) AS deg
      |  FROM e),
      |s0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM e
      |  WHERE src % 7 = 0),
      |${stepCte(1)},
      |${stepCte(2)},
      |${stepCte(3)},
      |${stepCte(4)},
      |steps AS (
      |  SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
      |  UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM s1
      |  UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM s2
      |  UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM s3
      |  UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM s4)""".stripMargin
  }


  /** Shared daily click/purchase count series for the correlation
    * queries: one grouped conditional aggregation over events.
    */
  private[graft] def dailyClickPurchase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"))

  /** Per-user experiment readout base: arm from the bucketing hash
    * (user_id parity), conversion flag, engagement covariate x and
    * purchase-value metric y as exact decimals. The z-test outcome is
    * `purchases >= 14` (roughly the median count) because EVERY user
    * in this dataset purchases at least once — `converted` saturates
    * at 1.0 and the pooled SE degenerates to the NULL case. */
  private[graft] def perUserExperiment(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        sum(when(col("event_type").isin("click", "view"), 1L).otherwise(0L))
          .as("x"),
        coalesce(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
          .as("y"))
      .withColumn("arm", when(col("user_id") % 2 === 0, "A").otherwise("B"))

  /** HITS oracle: the 4 L1-normalized half-step pairs unrolled as
    * generated CTEs (raw in-sum, then round-9 normalize against the
    * scalar total), the Bradley–Terry unroll pattern.
    */
  private[graft] def hitsOracle: String = {
    val steps = (1 to 4).map { i =>
      val hPrev = if (i == 1) "h0" else s"h${i - 1}"
      s"""a${i}r AS MATERIALIZED (SELECT e.dst AS id, SUM(p.h) AS v
         |  FROM e JOIN $hPrev p ON p.id = e.src GROUP BY 1),
         |a$i AS MATERIALIZED (SELECT n.id, CAST(coalesce(round(CAST(v AS DOUBLE)
         |    / CAST((SELECT SUM(v) FROM a${i}r) AS DOUBLE), 9),
         |    CAST(0.0 AS DOUBLE)) AS DECIMAL(19,9)) AS a
         |  FROM n LEFT JOIN a${i}r USING (id)),
         |h${i}r AS MATERIALIZED (SELECT e.src AS id, SUM(p.a) AS v
         |  FROM e JOIN a$i p ON p.id = e.dst GROUP BY 1),
         |h$i AS MATERIALIZED (SELECT n.id, CAST(coalesce(round(CAST(v AS DOUBLE)
         |    / CAST((SELECT SUM(v) FROM h${i}r) AS DOUBLE), 9),
         |    CAST(0.0 AS DOUBLE)) AS DECIMAL(19,9)) AS h
         |  FROM n LEFT JOIN h${i}r USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src,
       |    l_suppkey AS dst
       |    FROM lineitem WHERE l_orderkey % 13 = 0),
       |n AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |h0 AS MATERIALIZED (SELECT id, CAST(1 AS DECIMAL(19,9)) AS h FROM n),
       |$steps
       |SELECT a4.id AS id, CAST(a4.a AS DOUBLE) AS authority,
       |  CAST(h4.h AS DOUBLE) AS hub
       |FROM a4 JOIN h4 USING (id)
       |ORDER BY authority DESC, id LIMIT 20""".stripMargin
  }

  /** Personalized-PageRank oracle: 4 unrolled MATERIALIZED iterations.
    * The teleport constants interpolate from the SAME Scala doubles the
    * operator uses (1.0 − 0.85 = 0.15000000000000002 — a literal 0.15
    * would be a different double; the round-trip through toString is
    * exact).
    */
  private[graft] def pprOracle: String = {
    val damping = 0.85
    val oneMinus = 1.0 - damping
    val sv = 1.0 / 5
    val seedList = "1, 2, 3, 4, 5"
    val steps = (1 to 4).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT e.dst AS id,
         |  SUM(CAST(round(CAST(p.r AS DOUBLE) / dg.deg, 9)
         |    AS DECIMAL(19,9))) AS inb
         |  FROM e JOIN dg ON dg.src = e.src
         |  JOIN $prev p ON p.id = e.src GROUP BY 1),
         |dang$i AS MATERIALIZED (SELECT coalesce(SUM(p.r),
         |    CAST(0 AS DECIMAL(19,9))) AS dang
         |  FROM $prev p WHERE p.id NOT IN (SELECT src FROM dg)),
         |r$i AS MATERIALIZED (SELECT n.id, CAST(round(
         |    CAST($oneMinus AS DOUBLE) * s.s + CAST($damping AS DOUBLE)
         |    * (coalesce(CAST(c$i.inb AS DOUBLE), CAST(0.0 AS DOUBLE))
         |      + CAST((SELECT dang FROM dang$i) AS DOUBLE) * s.s), 9)
         |  AS DECIMAL(19,9)) AS r
         |  FROM n JOIN sv s ON s.id = n.id
         |  LEFT JOIN c$i ON c$i.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src,
       |    l_suppkey AS dst
       |    FROM lineitem WHERE l_orderkey % 13 = 0),
       |n AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |dg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY 1),
       |sv AS MATERIALIZED (SELECT id, CASE WHEN id IN ($seedList)
       |    THEN CAST($sv AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS s
       |  FROM n),
       |r0 AS MATERIALIZED (SELECT id,
       |    CAST(round(s, 9) AS DECIMAL(19,9)) AS r FROM sv),
       |$steps
       |SELECT r4.id AS id, CAST(r4.r AS DOUBLE) AS ppr
       |FROM r4 ORDER BY ppr DESC, id LIMIT 20""".stripMargin
  }

  /** Bradley–Terry oracle: the 50 MM iterations unrolled as generated
    * CTE pairs (raw update, then round-9 normalize) — the same
    * programmatic-unroll pattern as the Hilbert-key oracle. Each
    * iteration references the previous p-table twice (self and
    * opponent), which a recursive CTE cannot do.
    */
  private[graft] def btOracleSql: String = {
    val steps = (1 to 50).map { k =>
      s"""r$k AS MATERIALIZED (SELECT a.s, a.w,
         |    CASE WHEN a.w = 0 THEN 0.0
         |      ELSE a.w / sum(g.n / (a.v + b.v)) END AS raw
         |  FROM p${k - 1} a
         |  LEFT JOIN games g ON g.x = a.s OR g.y = a.s
         |  LEFT JOIN p${k - 1} b
         |    ON b.s = CASE WHEN g.x = a.s THEN g.y ELSE g.x END
         |  GROUP BY a.s, a.w),
         |p$k AS MATERIALIZED (SELECT s, w,
         |    CASE WHEN sum(raw) OVER () = 0 THEN 0.0
         |      ELSE round(raw / sum(raw) OVER (), 9) END AS v
         |  FROM r$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH prefs AS (SELECT l, w FROM (SELECT event_type AS l,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS w
       |  FROM events) WHERE w IS NOT NULL AND w <> l),
       |games AS MATERIALIZED (SELECT CASE WHEN w < l THEN w ELSE l END AS x,
       |    CASE WHEN w < l THEN l ELSE w END AS y, count(*) AS n
       |  FROM prefs GROUP BY 1, 2),
       |wins AS (SELECT w AS s, count(*) AS wn FROM prefs GROUP BY 1),
       |items AS (SELECT DISTINCT s FROM
       |  (SELECT w AS s FROM prefs UNION SELECT l FROM prefs)),
       |p0 AS MATERIALIZED (SELECT items.s, CAST(coalesce(wins.wn, 0) AS DOUBLE) AS w,
       |    round(CAST(1.0 AS DOUBLE) /
       |      (SELECT count(*) FROM items), 9) AS v
       |  FROM items LEFT JOIN wins ON items.s = wins.s),
       |$steps,
       |gp AS (SELECT s, sum(n) AS gn FROM
       |  (SELECT x AS s, n FROM games UNION ALL SELECT y, n FROM games)
       |  GROUP BY 1)
       |SELECT p50.s AS item, round(p50.v, 6) AS rating,
       |  CAST(p50.w AS BIGINT) AS wins,
       |  CAST(coalesce(gp.gn, 0) AS BIGINT) AS games
       |FROM p50 LEFT JOIN gp ON p50.s = gp.s
       |ORDER BY item""".stripMargin
  }
}
