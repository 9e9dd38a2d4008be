package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift-monitor registry: numeric/categorical/embedding
  * drift, cell localization, cross-snapshot matching and the
  * compression-layer staleness monitors.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object DriftRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- cell-mass drift localization: both sides assigned to a
    //      planted 4-cell codebook (10·onehot(vec_id%4) + 1% noise —
    //      cosine margins make cell = vec_id%4 in closed form, the
    //      q_kmeans_planted construction), db2 drops the vec_id%8==4
    //      half of cell 0; the oracle states the counts/shares/psi
    //      directly ----
    "q_cell_mass_drift" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val db2 = pts.filter(!(col("vec_id") % 8 === 4))
      val centroids = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      Similarity.cellMassDrift(pts, db2, "v", centroids).orderBy("cell")
    }),


    // ---- cross-snapshot cell matching: snapshot-2's quantizer is a
    //      PERMUTED, tilted copy of snapshot-1's (cell2 c' sits on
    //      coordinate perm(c') with a 7:1 two-axis tilt), so the greedy
    //      centroid-cosine assignment is closed-form — partner cosine
    //      7/sqrt(50), all cross cosines <= 1/sqrt(50) — and masses are
    //      the planted-corner counts under each side's own quantizer ----
    "q_cell_matching" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val db2 = pts.filter(!(col("vec_id") % 8 === 4))
      val cents1 = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      val perm = Array(2, 0, 3, 1)
      val cents2 = Array.tabulate(4, 64)((c, j) =>
        if (j == perm(c)) 7.0 else if (j == (perm(c) + 1) % 4) 1.0 else 0.0)
      Similarity.cellMatching(pts, db2, "v", cents1, cents2)
        .orderBy("cell1")
    }),


    // ---- quantization agreement (ARI + NMI): snapshot-2's codebook
    //      MERGES planted cells {0,1} onto the diagonal and keeps 2/3 —
    //      the contingency is closed-form (cell2 = 0/0/1/2 by corner),
    //      so both indices replay from the corner counts alone ----
    "q_cluster_agreement" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val cents1 = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      val cents2 = Array(
        Array.tabulate(64)(j => if (j == 0 || j == 1) 7.0 else 0.0),
        Array.tabulate(64)(j => if (j == 2) 10.0 else 0.0),
        Array.tabulate(64)(j => if (j == 3) 10.0 else 0.0))
      Similarity.clusterAgreement(pts, "v", cents1, cents2)
    }),


    // ---- RFF-MMD kernel two-sample drift between embedding corpora:
    //      the even/odd split of the same table is the exchangeable
    //      null (mmd2 ~ the 1/n noise floor); the same split with a
    //      +0.25 per-coordinate shift on one side must score an order
    //      of magnitude higher. Weights are md5-derived uniforms (pure
    //      IEEE arithmetic — both engines derive them bit-identically);
    //      z quantized at 6 dp and summed as exact decimals, so the
    //      statistic is row-order-independent and the oracle replays it
    //      exactly ----
    "q_mmd_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val even = emb.filter(col("vec_id") % 2 === 0)
      val odd = emb.filter(col("vec_id") % 2 === 1)
      val shifted = odd.select(col("vec_id"),
        transform(col("v"), x => x + lit(0.25)).as("v"))
      val nullCase = Similarity.mmdDrift(even, odd, "v", 64)
        .select(lit("null").as("pair"), col("n1"), col("n2"), col("mmd2"))
      val shiftCase = Similarity.mmdDrift(even, shifted, "v", 64)
        .select(lit("shifted").as("pair"), col("n1"), col("n2"), col("mmd2"))
      nullCase.unionByName(shiftCase).orderBy("pair")
    }),


    // ---- embedding drift between two derived snapshots (overlapping
    //      thirds of the corpus; snapshot B carries a planted +0.5
    //      shift on axis 0, so centroid_shift must exceed ~0.5 while
    //      centroid_cosine stays high) ----
    "q_centroid_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val snapA = e.filter(col("vec_id") % 3 =!= 0)
      val snapB = e.filter(col("vec_id") % 3 =!= 1)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            x.cast("double") + when(i === 0, lit(0.5)).otherwise(lit(0.0))))
      Similarity.centroidDrift(snapA, snapB, "label", "embedding")
        .orderBy("label")
    }),


    // ---- PQ codebook staleness: per-subspace mean reconstruction error
    //      of the planted points under the exact planted codebook — the
    //      chosen centroid is closed-form (code j = g_j, margins ~2e-4
    //      vs ~200), so the error is the noise term alone and the oracle
    //      replays the kernel's left-fold distance op for op ----
    "q_pq_recon_drift" -> ((s, dir) =>
      Pq.reconstructionDrift(pqPlantedPoints(s, dir), "v", pqPlantedBooks)
        .orderBy("subspace")),


    // ---- distribution drift (PSI): equal-width-grid population
    //      stability index between two derived sides — the planted
    //      2x scaling of a third of side B's prices must move
    //      l_extendedprice's PSI while l_quantity stays ~0 ----
    "q_psi_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_orderkey") % 97 =!= 0)
      val b = li.filter(col("l_orderkey") % 89 =!= 0)
        .withColumn("l_extendedprice", col("l_extendedprice") *
          when(col("l_orderkey") % 3 === 0, lit(2.0)).otherwise(lit(1.0)))
      Distribution.psiAll(a, b, Seq("l_extendedprice", "l_quantity"))
        .orderBy("col_name")
    }),

    // ---- TPC-H Q14 shape (promo revenue share): month-pruned lineitem
    //      joins the broadcast part dim; conditional decimal-exact sums
    //      ratio to one row (the null-skipping CASE sum — no promo rows
    //      would null the share in both engines identically) ----
    "q14_promo_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(t(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "ECONOMY", rev)).cast("double") /
            sum(rev).cast("double"), 6).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q10 shape (returned-item reporting): quarter-filtered
    //      orders and return-flagged lineitems join down to a
    //      per-customer revenue loss; nation broadcasts; top-20 ----
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),


    // ---- drift localization: the flagship diff rolled up into
    //      key-range buckets — WHERE does the drift live, before
    //      reading a single drifted row ----
    "q_drift_localize" -> ((s, dir) => {
      val (s1, s2) = lineitemSides(s, dir)
      val c = new DriftCompare(s, s1, s2)
      c.driftLocalize(c.dataDrift("lineitem").get, "l_orderkey", 1000L)
        .orderBy("bucket_lo", "observed_in")
    }),


    // ---- column-level drift triage: WHICH columns carry the change —
    //      rowChanges' full-outer join folded to one row per column
    //      (sum-of-case, no explode; output bounded by column count).
    //      Sides: orders.o_totalprice mutated on %17 keys,
    //      o_orderpriority on %23 ----
    "q_column_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val oldDf = o.filter(col("o_orderkey") % 59 =!= 0)
      val newDf = o.filter(col("o_orderkey") % 53 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 17 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 23 === 0, lit("X-DRIFTED"))
            .otherwise(col("o_orderpriority")))
      ChangeCapture.columnDriftProfile(oldDf, newDf, "o_orderkey")
        .orderBy("column")
    }),


    // ---- distribution drift as a first-class expectation: the second
    //      half of the month KS-gated against the first (the
    //      yesterday-vs-training-snapshot monitor shape) ----
    "q_expectations_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-15").cast("timestamp")
      Expectations.validate(
        ev.filter(col("ts") >= cut),
        Seq(Expectations.Drift("value",
          ev.filter(col("ts") < cut).select("value"), 0.05)))
    }),


    // ---- PSI drift score: purchase values vs click-value reference
    //      bins (inverted-CDF decile edges, epsilon-clamped log-odds) ----
    "q_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      Stats.psi(ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"), "value", 10)
        .withColumn("bin", col("bin").cast("long"))
        .orderBy("bin")
    })
  )

  def oracles: Map[String, String] = dmap(

    // closed-form truth for the cell-mass drift: the planted margins pin
    // cell = vec_id % 4, so counts/shares/psi compute directly
    "q_cell_mass_drift" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS BIGINT) AS cell
        |  FROM embeddings),
        |a AS (SELECT cell, count(*) AS n1 FROM pts GROUP BY cell),
        |b AS (SELECT cell, count(*) AS n2 FROM pts
        |  WHERE vec_id % 8 <> 4 GROUP BY cell),
        |j AS (SELECT COALESCE(a.cell, b.cell) AS cell,
        |    COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
        |  FROM a FULL OUTER JOIN b ON a.cell = b.cell),
        |t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM j),
        |sh AS (SELECT cell, n1, n2,
        |    round(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE), 6) AS share1,
        |    round(CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE), 6) AS share2
        |  FROM j, t)
        |SELECT cell, n1, n2, share1, share2,
        |  round((greatest(share1, 1e-6) - greatest(share2, 1e-6)) *
        |    ln(greatest(share1, 1e-6) / greatest(share2, 1e-6)), 6) AS psi_term
        |FROM sh ORDER BY cell""".stripMargin,


    // closed-form replay of the planted cross-snapshot matching: the
    // greedy assignment collapses to the stated pairs (one 7/sqrt(50)
    // partner per cell, cross terms <= 1/sqrt(50)), and each side's
    // masses are the planted-corner counts under its own quantizer
    "q_cell_matching" ->
      """WITH m1 AS (SELECT CAST(vec_id % 4 AS BIGINT) AS cell1,
        |    count(*) AS mass1
        |  FROM embeddings GROUP BY 1),
        |m2 AS (SELECT CAST(vec_id % 4 AS BIGINT) AS g, count(*) AS n
        |  FROM embeddings WHERE vec_id % 8 <> 4 GROUP BY 1),
        |pairs(c1, c2) AS (VALUES (0, 1), (1, 3), (2, 0), (3, 2))
        |SELECT m1.cell1, CAST(p.c2 AS BIGINT) AS cell2,
        |  round(7.0 / sqrt(50.0), 6) AS cosine, m1.mass1, m2.n AS mass2
        |FROM pairs p
        |JOIN m1 ON m1.cell1 = p.c1
        |JOIN m2 ON m2.g = (CASE p.c2 WHEN 0 THEN 2 WHEN 1 THEN 0
        |  WHEN 2 THEN 3 ELSE 1 END)
        |ORDER BY cell1""".stripMargin,


    // ARI/NMI replay from the closed-form contingency (cell1 = corner,
    // cell2 merges corners {0,1}): pair counts as exact decimal Σx² with
    // the halving on the final double scalar, 9-dp ln terms folded as
    // exact decimals — the operator's op order mirrored step for step
    "q_cluster_agreement" ->
      """WITH m AS (SELECT CAST(vec_id % 4 AS BIGINT) AS c1,
        |    CAST(CASE WHEN vec_id % 4 IN (0, 1) THEN 0
        |              WHEN vec_id % 4 = 2 THEN 1 ELSE 2 END AS BIGINT) AS c2
        |  FROM embeddings),
        |cont AS (SELECT c1, c2, count(*) AS nij FROM m GROUP BY 1, 2),
        |r AS (SELECT c1, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1),
        |c AS (SELECT c2, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1),
        |n AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |    sum(CAST(nij AS DECIMAL(18,0)) * CAST(nij AS DECIMAL(18,0))) AS qij
        |  FROM cont),
        |qa AS (SELECT sum(CAST(ai AS DECIMAL(18,0)) *
        |    CAST(ai AS DECIMAL(18,0))) AS qa FROM r),
        |qb AS (SELECT sum(CAST(bj AS DECIMAL(18,0)) *
        |    CAST(bj AS DECIMAL(18,0))) AS qb FROM c),
        |mi AS (SELECT sum(CAST(round((CAST(nij AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(nij AS DOUBLE) * CAST(n.n AS DOUBLE) /
        |        (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))), 9)
        |    AS DECIMAL(20,9))) AS mi
        |  FROM cont JOIN r USING (c1) JOIN c USING (c2), n),
        |hu AS (SELECT sum(CAST(round(-(CAST(ai AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(ai AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
        |    AS DECIMAL(20,9))) AS hu FROM r, n),
        |hv AS (SELECT sum(CAST(round(-(CAST(bj AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(bj AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
        |    AS DECIMAL(20,9))) AS hv FROM c, n),
        |f AS (SELECT n.n AS n, CAST(n.n AS DOUBLE) AS nd,
        |    (CAST(qij AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sij,
        |    (CAST(qa AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sa2,
        |    (CAST(qb AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sb2,
        |    CAST(mi AS DOUBLE) AS mid, CAST(hu AS DOUBLE) AS hud,
        |    CAST(hv AS DOUBLE) AS hvd
        |  FROM n, qa, qb, mi, hu, hv),
        |f2 AS (SELECT n, sij, sa2, sb2, mid, hud, hvd,
        |    sa2 * sb2 / ((nd * nd - nd) / 2.0) AS expv FROM f)
        |SELECT n,
        |  round((sij - expv) /
        |    nullif((sa2 + sb2) / 2.0 - expv, 0.0), 9) AS ari,
        |  round(mid / nullif(sqrt(hud * hvd), 0.0), 6) AS nmi,
        |  round(mid / nullif(hud, 0.0), 6) AS homogeneity,
        |  round(mid / nullif(hvd, 0.0), 6) AS completeness,
        |  round(2.0 * mid / nullif(hud + hvd, 0.0), 6) AS v_measure
        |FROM f2""".stripMargin,


    // bit-for-bit replay of the RFF-MMD statistic: md5-derived uniform
    // weights (pure IEEE arithmetic, no libm in the derivation), z
    // quantized at 6 dp and summed as exact decimals, Σ gap² summed as
    // exact decimals — every float op order mirrored
    "q_mmd_drift" -> {
      def zCte(src: String, name: String): String =
        s"""z$name AS (SELECT j, CAST(round(cos(list_dot_product(ve, wv) + b), 6)
           |    AS DECIMAL(20,6)) AS z
           |  FROM $src CROSS JOIN wl JOIN bv USING (j)),
           |m$name AS (SELECT j, SUM(z) AS s FROM z$name GROUP BY j)""".stripMargin
      def mmdCte(a: String, b: String, na: String, nb: String, name: String): String =
        s"""g$name AS (SELECT x.j,
           |    CAST(x.s AS DOUBLE) / CAST($na.n AS DOUBLE) -
           |    CAST(y.s AS DOUBLE) / CAST($nb.n AS DOUBLE) AS g
           |  FROM m$a x JOIN m$b y USING (j), $na, $nb),
           |r$name AS (SELECT CAST(SUM(CAST(round(g * g, 12) AS DECIMAL(24,12)))
           |    AS DOUBLE) * 0.125 AS mmd2 FROM g$name)""".stripMargin
      s"""WITH w AS (SELECT j, i,
        |    (CAST(('0x' || substr(md5('mmdw:7:' || CAST(j AS VARCHAR) || ':' ||
        |        CAST(i AS VARCHAR)), 1, 16)) AS UBIGINT)::DOUBLE
        |      / 18446744073709551616.0 * 2.0 - 1.0) AS wv
        |  FROM range(16) AS rj(j), range(64) AS ri(i)),
        |wl AS (SELECT j, list(wv ORDER BY i) AS wv FROM w GROUP BY j),
        |bv AS (SELECT j,
        |    CAST(('0x' || substr(md5('mmdb:7:' || CAST(j AS VARCHAR)), 1, 16))
        |      AS UBIGINT)::DOUBLE
        |      / 18446744073709551616.0 * 2.0 * pi() AS b
        |  FROM range(16) AS rj(j)),
        |v AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |ev AS (SELECT ve FROM v WHERE vec_id % 2 = 0),
        |od AS (SELECT ve FROM v WHERE vec_id % 2 = 1),
        |sh AS (SELECT list_transform(ve, x -> x + 0.25) AS ve FROM od),
        |n1c AS (SELECT count(*) AS n FROM ev),
        |n2c AS (SELECT count(*) AS n FROM od),
        |${zCte("ev", "ev")},
        |${zCte("od", "od")},
        |${zCte("sh", "sh")},
        |${mmdCte("ev", "od", "n1c", "n2c", "null")},
        |${mmdCte("ev", "sh", "n1c", "n2c", "sh")}
        |SELECT 'null' AS pair, n1c.n AS n1, n2c.n AS n2, mmd2
        |FROM rnull, n1c, n2c
        |UNION ALL SELECT 'shifted', n1c.n, n2c.n, mmd2 FROM rsh, n1c, n2c
        |ORDER BY pair""".stripMargin
    },


    // centroid drift: same planted axis-0 shift, same 6-dp fold policy
    "q_centroid_drift" ->
      """WITH ea AS (SELECT label, unnest(range(len(embedding))) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id % 3 <> 0),
        |eb0 AS (SELECT label, unnest(range(len(embedding))) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id % 3 <> 1),
        |eb AS (SELECT label, i,
        |    x + (CASE WHEN i = 0 THEN 0.5 ELSE 0.0 END) AS x FROM eb0),
        |a AS (SELECT label, i, avg(x) AS ca, count(*) AS na
        |  FROM ea GROUP BY 1, 2),
        |b AS (SELECT label, i, avg(x) AS cb, count(*) AS nb
        |  FROM eb GROUP BY 1, 2),
        |f AS (SELECT a.label, sum(ca * cb) AS dot, sum(ca * ca) AS aa,
        |    sum(cb * cb) AS bb, sum((ca - cb) * (ca - cb)) AS d2,
        |    min(na) AS n_a, min(nb) AS n_b
        |  FROM a JOIN b USING (label, i) GROUP BY 1)
        |SELECT label, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS centroid_cosine,
        |  round(sqrt(d2), 6) AS centroid_shift, n_a, n_b
        |FROM f ORDER BY label""".stripMargin,


    // the chosen centroid cancels the planted one-hot exactly as doubles
    // ((10 + 0.01x) - 10 on the hot coordinate, 0.01x elsewhere), and the
    // oracle folds the 8 squared diffs in the kernel's exact left order
    "q_pq_recon_drift" -> {
      def errExpr(j: Int): String = {
        val terms = (0 until 8).map { p =>
          val d = s"((CASE WHEN $p = g$j THEN 10.0 ELSE 0.0 END) + " +
            s"0.01 * CAST(embedding[${j * 8 + p + 1}] AS DOUBLE) - " +
            s"(CASE WHEN $p = g$j THEN 10.0 ELSE 0.0 END))"
          s"($d * $d)"
        }
        terms.reduce((a, b) => s"($a + $b)")
      }
      val gCols = (0 until 4).map(j =>
        s"CAST((vec_id >> ${2 * j}) & 3 AS INT) AS g$j").mkString(",\n    ")
      val eCols = (0 until 4).map(j =>
        s"CAST(round(${errExpr(j)}, 9) AS DECIMAL(28,9)) AS e$j")
        .mkString(",\n    ")
      val sCols = (0 until 4).map(j => s"sum(e$j) AS s$j").mkString(", ")
      val caseS = (0 until 4).map(j => s"WHEN $j THEN s$j").mkString(" ")
      s"""WITH g AS (SELECT vec_id, embedding,
        |    $gCols
        |  FROM embeddings),
        |e AS (SELECT
        |    $eCols
        |  FROM g),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, $sCols FROM e)
        |SELECT CAST(j AS BIGINT) AS subspace, n,
        |  round(CAST((CASE j $caseS END) AS DOUBLE) / CAST(n AS DOUBLE), 9)
        |    AS mse
        |FROM s, (SELECT unnest(range(4)) AS j) sub
        |ORDER BY subspace""".stripMargin
    },


    // PSI: same equal-width bins (floor on identical IEEE doubles),
    // integer counts, Laplace-smoothed terms, 6-dp round on the ln sum
    "q_psi_drift" ->
      """WITH a_rows AS (SELECT * FROM lineitem WHERE l_orderkey % 97 <> 0),
        |b_rows AS (SELECT l_quantity, l_extendedprice
        |    * CASE WHEN l_orderkey % 3 = 0 THEN 2.0 ELSE 1.0 END
        |    AS l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 89 <> 0),
        |pe_a AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM a_rows
        |  WHERE l_extendedprice IS NOT NULL),
        |pe_b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM b_rows
        |  WHERE l_extendedprice IS NOT NULL),
        |pe_bd AS (SELECT min(x) AS lo, max(x) AS hi
        |  FROM (SELECT x FROM pe_a UNION ALL SELECT x FROM pe_b)),
        |pe_na AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS na FROM pe_a, pe_bd GROUP BY 1),
        |pe_nb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS nb FROM pe_b, pe_bd GROUP BY 1),
        |pe_g AS (SELECT r.range AS bin, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM range(10) r LEFT JOIN pe_na ON pe_na.bin = r.range
        |  LEFT JOIN pe_nb ON pe_nb.bin = r.range),
        |pe_t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM pe_g),
        |pe_s AS (SELECT round(sum(
        |    ((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0)
        |      - (CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))
        |    * ln(((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0))
        |      / ((CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0)))), 6)
        |    AS psi, CAST(min(ta) AS BIGINT) AS n_a, CAST(min(tb) AS BIGINT) AS n_b FROM pe_g, pe_t),
        |qt_a AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM a_rows
        |  WHERE l_quantity IS NOT NULL),
        |qt_b AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM b_rows
        |  WHERE l_quantity IS NOT NULL),
        |qt_bd AS (SELECT min(x) AS lo, max(x) AS hi
        |  FROM (SELECT x FROM qt_a UNION ALL SELECT x FROM qt_b)),
        |qt_na AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS na FROM qt_a, qt_bd GROUP BY 1),
        |qt_nb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS nb FROM qt_b, qt_bd GROUP BY 1),
        |qt_g AS (SELECT r.range AS bin, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM range(10) r LEFT JOIN qt_na ON qt_na.bin = r.range
        |  LEFT JOIN qt_nb ON qt_nb.bin = r.range),
        |qt_t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM qt_g),
        |qt_s AS (SELECT round(sum(
        |    ((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0)
        |      - (CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))
        |    * ln(((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0))
        |      / ((CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0)))), 6)
        |    AS psi, CAST(min(ta) AS BIGINT) AS n_a, CAST(min(tb) AS BIGINT) AS n_b FROM qt_g, qt_t)
        |SELECT 'l_extendedprice' AS col_name, psi, n_a, n_b FROM pe_s
        |UNION ALL
        |SELECT 'l_quantity' AS col_name, psi, n_a, n_b FROM qt_s
        |ORDER BY col_name""".stripMargin,

    // TPC-H Q14: promo share of the month's decimal-exact revenue
    "q14_promo_revenue" ->
      """SELECT round(CAST(100 AS DOUBLE)
        |    * CAST(sum(CASE WHEN p_type = 'ECONOMY'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
        |        END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |      AS DOUBLE), 6) AS promo_pct,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    // TPC-H Q10: returned-item revenue loss per customer, top-20
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // TPC-H Q18 shape: decimal-exact quantity sums, top-100 by
    // (totalprice desc, orderkey)
    "q18_big_spenders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q17_small_qty" ->
      """SELECT
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0, 6) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |      AS DOUBLE) / count(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        |FROM part
        |JOIN ps ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size = 15 AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q11_top_stock" ->
      """WITH fact AS (
        |  SELECT l_partkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2)) AS line_value
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7')
        |SELECT l_partkey AS ps_partkey,
        |  CAST(sum(line_value) AS DOUBLE) AS value
        |FROM fact
        |GROUP BY l_partkey
        |HAVING CAST(sum(line_value) AS DOUBLE) >
        |  (SELECT CAST(sum(line_value) AS DOUBLE) * 1.5
        |     / count(DISTINCT l_partkey) FROM fact)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q12_late_shipments" ->
      """SELECT year(l_shipdate) AS ship_year,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
        |    l_suppkey AS ps_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_promo_parts" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM ps
        |  WHERE ps_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  AND ps_availqty > (
        |    SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM lineitem
        |    WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'))
        |ORDER BY s_name""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q22_idle_customers" ->
      """SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_custkey % 7 IN (1, 3, 5)
        |  AND c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer
        |    WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_custkey % 7
        |ORDER BY cntrycode""".stripMargin,


    // drift localization truth: the EXCEPT diffs bucketed by integer
    // key-range (pure integer arithmetic, keys never touch a double)
    "q_drift_localize" ->
      s"""WITH $lineitemSidesSql
        |SELECT bucket_lo, observed_in, count(*) AS n_rows FROM (
        |  SELECT l_orderkey - l_orderkey % 1000 AS bucket_lo,
        |    'db1' AS observed_in FROM d1
        |  UNION ALL
        |  SELECT l_orderkey - l_orderkey % 1000, 'db2' FROM d2) u
        |GROUP BY bucket_lo, observed_in
        |ORDER BY bucket_lo, observed_in""".stripMargin,


    // column-drift truth: per-column null-safe comparisons over the
    // key-matched join, summed to one row per drifting column
    "q_column_drift" ->
      """WITH old AS (SELECT o_orderkey AS pk, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 59 <> 0),
        |new AS (SELECT o_orderkey AS pk,
        |    CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 100.0
        |      ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 23 = 0 THEN 'X-DRIFTED'
        |      ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 53 <> 0),
        |j AS (SELECT old.o_totalprice AS p1, new.o_totalprice AS p2,
        |    old.o_orderpriority AS r1, new.o_orderpriority AS r2
        |  FROM old JOIN new USING (pk))
        |SELECT "column", n_rows FROM (
        |  SELECT '(added rows)' AS "column", CAST((SELECT count(*) FROM new
        |    WHERE pk NOT IN (SELECT pk FROM old)) AS BIGINT) AS n_rows
        |  UNION ALL
        |  SELECT '(removed rows)', CAST((SELECT count(*) FROM old
        |    WHERE pk NOT IN (SELECT pk FROM new)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(sum(CASE WHEN p1 IS DISTINCT FROM p2
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM j
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(sum(CASE WHEN r1 IS DISTINCT FROM r2
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM j) u
        |WHERE n_rows > 0 ORDER BY "column"""".stripMargin,


    // drift-expectation truth: the same KS D between the month halves
    "q_expectations_drift" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
        |      THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
        |      THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2 FROM c),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |m AS (SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |    - CAST(cum2 AS HUGEINT) * n1)) AS dn FROM w, t),
        |d AS (SELECT round(CAST(dn AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * n2), 6) AS d FROM m, t)
        |SELECT 'drift' AS rule, 'value' AS "column", d AS metric,
        |  0.05 AS threshold, d <= 0.05 AS ok
        |FROM d""".stripMargin,


    // PSI truth: same integer-exact decile edges from the reference's
    // distinct-value CDF, bin = count of edges strictly below, shares
    // rounded, epsilon-clamped term, decimal-summed total
    "q_psi" ->
      """WITH refv AS (SELECT CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)
        |    AS u FROM events WHERE event_type = 'click' AND value IS NOT NULL),
        |curv AS (SELECT CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)
        |    AS u FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |c AS (SELECT u, COUNT(*) AS n FROM refv GROUP BY 1),
        |w AS (SELECT u, SUM(n) OVER (ORDER BY u) AS cum, SUM(n) OVER () AS tot
        |  FROM c),
        |ed AS (SELECT DISTINCT e FROM (
        |  SELECT k, MIN(CASE WHEN cum * 10 >= tot * k THEN u END) AS e
        |  FROM w CROSS JOIN range(1, 10) AS r(k) GROUP BY k)),
        |rb AS (SELECT (SELECT COUNT(*) FROM ed WHERE e < u) AS bin,
        |    COUNT(*) AS ref_n FROM refv GROUP BY 1),
        |cb AS (SELECT (SELECT COUNT(*) FROM ed WHERE e < u) AS bin,
        |    COUNT(*) AS cur_n FROM curv GROUP BY 1),
        |j AS (SELECT COALESCE(rb.bin, cb.bin) AS bin,
        |    COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
        |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
        |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM j),
        |sc AS (SELECT bin, ref_n, cur_n,
        |    round(CAST(ref_n AS DOUBLE) / rt, 6) AS ref_share,
        |    round(CAST(cur_n AS DOUBLE) / ct, 6) AS cur_share FROM j, t),
        |s2 AS (SELECT *, round((greatest(cur_share, 0.000001)
        |      - greatest(ref_share, 0.000001))
        |    * ln(greatest(cur_share, 0.000001)
        |      / greatest(ref_share, 0.000001)), 6) AS term FROM sc),
        |p AS (SELECT CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi
        |  FROM s2)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(ref_n AS BIGINT) AS ref_n,
        |  CAST(cur_n AS BIGINT) AS cur_n, ref_share, cur_share, term, psi
        |FROM s2, p ORDER BY bin""".stripMargin
  )
}
