package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph registry: PageRank-class checks, communities,
  * triangles, and the DeepWalk/node2vec walk-corpus family.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object WalksRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- PageRank over the part -> supplier supply graph; the oracle
    //      asserts the invariants (mass conservation, rank floor) plus a
    //      deterministic top node ----
    "q_pagerank_checks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      val r = Graph.pageRank(edges, 0.85, 5)
      // all three invariants stay on the cluster: one full-pass aggregate
      // over the (checkpointed) rank vector yields mass, node count, rank
      // floor, and the arg-max node (ties toward the smallest id) in a
      // single 1-row result; supplier membership of the top node is a
      // 1-row semi-join — nothing data-scaled ever reaches the driver
      val stats = r.agg(
        sum("rank").as("total"),
        count(lit(1)).as("n"),
        min("rank").as("min_rank"),
        max_by(col("id"), struct(col("rank"), -col("id"))).as("top_node"))
      val suppliers = edges
        .select(col("dst").cast("long").as("top_node")).distinct()
      val topOk = stats.select("top_node")
        .join(suppliers, Seq("top_node"), "left_semi")
        .agg(count(lit(1)).as("n_top_supplier"))
      stats.crossJoin(topOk).select(
        explode(map(
          lit("mass_sums_to_one"),
          abs(col("total") - lit(1.0)) < lit(1e-9),
          lit("all_ranks_above_floor"),
          col("min_rank") >= lit(0.15) / col("n") - lit(1e-12),
          lit("top_node_is_a_supplier"),
          col("n_top_supplier") === 1)).as(Seq("check_name", "ok")))
        .orderBy("check_name")
    }),


    // ---- exact triangle counts on the co-purchase graph ----
    "q_triangles" -> ((s, dir) => {
      val edges = EventAnalytics
        .coOccurrence(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2)
        .select(col("item1").as("src"), col("item2").as("dst"))
      Graph.triangleCounts(edges).orderBy("id")
    }),


    // ---- k-core planted gate: 6-clique with a 19-node chain tail
    //      (joined at node 5) built from nation keys; the 3-core peels
    //      the whole chain in one round and keeps exactly the clique ----
    "q_kcore" -> ((s, dir) => {
      val ids = t(s, dir, "nation").select(col("n_nationkey").cast("long").as("id"))
      val a = ids.select(col("id").as("src"))
      val b = ids.select(col("id").as("dst"))
      val edges = a.crossJoin(b).filter(
        (col("src") < 6 && col("dst") < 6 && col("src") < col("dst")) ||
          (col("src") >= 5 && col("dst") === col("src") + 1))
      Graph.kCore(edges, k = 3).orderBy("id")
    }),


    // ---- HITS hubs/authorities on the part->supplier graph (same
    //      edge construction as pagerank); 4 L1-normalized rounds,
    //      9 dp decimal state, oracle = unrolled CTE chain ----
    "q_hits" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      Graph.hits(edges, iters = 4)
        .orderBy(col("authority").desc, col("id")).limit(20)
    }),


    // ---- personalized PageRank from a 5-part seed set over the
    //      part->supplier graph: seed-expansion trust propagation ----
    "q_ppr" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      Graph.personalizedPageRank(edges, Seq(1L, 2L, 3L, 4L, 5L),
        damping = 0.85, iters = 4)
        .orderBy(col("ppr").desc, col("id")).limit(20)
    }),


    // ---- label-propagation communities, planted gate: two 5-cliques
    //      bridged by one edge (4-5) from nation keys converge in 3
    //      deterministic rounds to communities 0 and 5 (hand-traced:
    //      self-vote + min tie-break; node 5 briefly takes 4 in round 1
    //      and is pulled back by its clique's majority in round 2) ----
    "q_lpa" -> ((s, dir) => {
      val ids = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id"))
        .filter(col("id") <= 9)
      val a = ids.select(col("id").as("src"))
      val b = ids.select(col("id").as("dst"))
      val edges = a.crossJoin(b).filter(
        (col("src") < 5 && col("dst") < 5 && col("src") < col("dst")) ||
          (col("src") >= 5 && col("dst") >= 5 && col("src") < col("dst")) ||
          (col("src") === 4 && col("dst") === 5))
      // 3 fixed rounds, no early-exit jobs: the hand-trace reaches the
      // fixpoint after round 2, round 3 re-confirms it (identical
      // labeling), so the fixed-round mode returns the converged result
      Graph.labelPropagation(edges, maxIter = 3, earlyExit = false)
        .orderBy("id")
    }),


    // ---- seeded uniform random walks (the DeepWalk/node2vec corpus
    //      generator) over the part->supplier co-occurrence graph folded
    //      into one id space; md5-indexed neighbor choice makes every
    //      walk a pure function of (seed, data), so the oracle replays
    //      the four steps bit-for-bit with unrolled joins ----
    "q_random_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.randomWalks(edges, starts, walkLength = 4)
        .orderBy("walk_id", "step", "node")
    }),


    // ---- the DeepWalk pipeline end-to-end: the seeded walks above piped
    //      into skip-gram (center, context) pair counts — the training
    //      corpus a graph-embedding model consumes. One walk-keyed
    //      window pass, map-side-combined pair aggregation ----
    "q_walk_skipgrams" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      val walks = Graph.randomWalks(edges, starts, walkLength = 4)
      Graph.walkContextPairs(walks, window = 2)
        .orderBy("center", "context")
    }),


    // ---- edge-weight-proportional walks over the co-occurrence
    //      MULTIGRAPH (weight = pair multiplicity, so heavily co-bought
    //      pairs are walked proportionally more): integer weights keep
    //      the cumulative sums exact, so the oracle's windowed running
    //      sums replay the interval draws bit-for-bit ----
    "q_weighted_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"),
        lit(1L).as("weight"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.weightedWalks(edges, starts, walkLength = 4)
        .orderBy("walk_id", "step", "node")
    }),


    // ---- node2vec biased walks (p=2 discourages backtracking, q=4
    //      keeps the walk in the BFS neighborhood) over the same graph.
    //      DYADIC weights (0.5 / 1.0 / 0.25) make every cumulative sum
    //      exact in binary floating point, so the oracle's windowed
    //      running sums replay the interval selection bit-for-bit ----
    "q_node2vec_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.node2vecWalks(edges, starts, walkLength = 4, p = 2.0, q = 4.0)
        .orderBy("walk_id", "step", "node")
    }),


    // ---- deterministic out-degree cap (the GraphSAGE-style neighbor
    //      sample the node2vec hub contract points to): keep the maxDeg
    //      neighbors with smallest md5("cap:seed:src:dst") — a pure
    //      function of (seed, data) the oracle ranks identically ----
    // ---- DeepWalk's γ (r17): walksPerNode = 3 independent walks per
    //      start — walk_id = node·3 + r keys the step hash, so the
    //      three walks from one node draw independently; the oracle
    //      replays the same id arithmetic ----
    "q_walk_corpus" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.randomWalks(edges, starts, walkLength = 4, walksPerNode = 3)
        .orderBy("walk_id", "step", "node")
    }),

    // ---- shifted positive PMI over the walk pair counts (r17): the
    //      matrix SGNS implicitly factorizes (Levy & Goldberg '14),
    //      negK = 4; exact long margins, ln of the bit-identical
    //      folded ratio, 6 dp ----
    "q_ppmi" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      val walks = Graph.randomWalks(edges, starts, walkLength = 4)
      Graph.ppmiPairs(Graph.walkContextPairs(walks, window = 2), negK = 4.0)
        .orderBy("center", "context")
    }),

    // ---- node2vec over the CAPPED graph (r17): maxDeg composes
    //      capOutDegree into the operator's checkpointed adjacency, so
    //      the exact second-order walk runs on a bounded-degree graph —
    //      the hub mitigation the uncapped contract prescribes, now
    //      in-operator. Oracle replays the cap (md5 ranking) and the
    //      dyadic interval draws over the capped edge set ----
    "q_node2vec_capped" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.node2vecWalks(edges, starts, walkLength = 4, p = 2.0, q = 4.0,
          maxDeg = Some(3))
        .orderBy("walk_id", "step", "node")
    }),

    // ---- symmetric skip-gram pair counts (r17): both orientations of
    //      every window hit — the view a word2vec trainer consumes ----
    "q_walk_pairs_sym" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      val walks = Graph.randomWalks(edges, starts, walkLength = 4)
      Graph.walkContextPairs(walks, window = 2, symmetric = true)
        .orderBy("center", "context")
    }),

    // ---- word2vec negative-sampling table (r17): unigram^0.75 over
    //      walk visits, computed as sqrt(n*sqrt(n)) (bit-identical
    //      across engines where pow() may differ in the last ulp) and
    //      normalized by the exact DECIMAL(38,9) sum of the 9-dp
    //      weights ----
    "q_neg_table" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.negativeTable(Graph.randomWalks(edges, starts, walkLength = 4))
        .orderBy("node")
    }),

    "q_degree_cap" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      Graph.capOutDegree(edges, maxDeg = 3).orderBy("src", "dst")
    }),

    // ---- SPPMI -> count-based embeddings (r18): Levy & Goldberg's
    //      explicit factorization closing walks -> pairs -> SPPMI ->
    //      vectors. Planted 3-block fixture: nodes 0..29 (lineitem
    //      orderkey residues), every within-block pair carries count
    //      2^block, so the margins make SPPMI EXACTLY round6(ln(7/2^b))
    //      on block b and 0 elsewhere — three rank-1 constant blocks
    //      with eigenpairs (10·c_b, uniform/sqrt(10)). Top-2 components
    //      are blocks 0 and 1; every embedding value is sqrt(c_b) (or
    //      0) in closed form ----
    "q_sppmi_embed" -> ((s, dir) => {
      val nodes = t(s, dir, "lineitem")
        .select((col("l_orderkey") % 30).cast("long").as("node")).distinct()
      val b = nodes.select(col("node"),
        floor(col("node") / 10).cast("int").as("blk"))
      val pairs = b.select(col("node").as("center"), col("blk"))
        .join(b.select(col("node").as("context"), col("blk")), "blk")
        .select(col("center"), col("context"),
          pow(lit(2.0), col("blk")).cast("long").as("n"))
      Graph.sppmiEmbed(pairs, k = 2).orderBy("node", "component")
    }),

    // ---- temporal (ts-monotone) walks over the CAPPED time-stamped
    //      supply graph (r18): every step's edge timestamp strictly
    //      exceeds the arrival edge's; the valid-future count is a
    //      precomputed per-edge suffix rank, so steps are exact-rank
    //      equi-joins (no per-(walk, t) candidate scan). Oracle replays
    //      the md5 cap, the (ts, dst) ranks, the per-edge nlo counts,
    //      and the modular draw over the suffix ----
    "q_temporal_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"),
        (col("l_orderkey") % 100).cast("long").as("ts"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.temporalWalks(edges, starts, walkLength = 4, maxDeg = Some(3))
        .orderBy("walk_id", "step", "node")
    })
  )

  def oracles: Map[String, String] = dmap(
    // lowercase-hex md5 strings order byte-identically in both engines
    "q_degree_cap" ->
      """WITH e AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst FROM lineitem),
        |r AS (SELECT src, dst, row_number() OVER (PARTITION BY src
        |    ORDER BY md5('cap:7:' || CAST(src AS VARCHAR) || ':' ||
        |      CAST(dst AS VARCHAR)), dst) AS rn
        |  FROM e)
        |SELECT src, dst FROM r WHERE rn <= 3 ORDER BY src, dst""".stripMargin,

    // γ-walk replay: walk_id = node*3 + r cross-joined starts, the
    // same md5-indexed step arithmetic keyed on walk_id
    "q_walk_corpus" -> {
      def stepCte(k: Int): String =
        s"""g$k AS (SELECT f.walk_id, n.dst AS node FROM g${k - 1} f
           |  JOIN gnbr n ON n.src = f.node AND n.rnk =
           |    CAST(CAST(('0x' || substr(md5('rw:7:' ||
           |      CAST(f.walk_id AS VARCHAR) || ':$k:' ||
           |      CAST(f.node AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |      % n.deg)""".stripMargin
      s"""WITH ge AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst FROM lineitem),
        |gnbr AS (SELECT src, dst,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
        |      AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY src) AS deg
        |  FROM ge),
        |g0 AS (SELECT s.src * 3 + r.r AS walk_id, s.src AS node
        |  FROM (SELECT DISTINCT src FROM ge WHERE src % 7 = 0) s
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS r) r),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM g0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM g1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM g2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM g3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM g4
        |ORDER BY walk_id, step, node""".stripMargin
    },

    // SPPMI replay: the q_walk_skipgrams pair counts, exact long
    // margins, ln of the folded ratio (shift inside the log), 6 dp
    "q_ppmi" ->
      s"""WITH $walkOracleCtes,
        |c AS (SELECT node AS center,
        |    lead(node, 1) OVER win AS c1,
        |    lead(node, 2) OVER win AS c2
        |  FROM steps WINDOW win AS (PARTITION BY walk_id ORDER BY step)),
        |pr AS (
        |  SELECT center, c1 AS context FROM c WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM c WHERE c2 IS NOT NULL),
        |pc AS (SELECT center, context, count(*) AS n FROM pr GROUP BY 1, 2),
        |tt AS (SELECT SUM(n) AS t FROM pc),
        |rm AS (SELECT center, SUM(n) AS nc FROM pc GROUP BY center),
        |cm AS (SELECT context, SUM(n) AS nx FROM pc GROUP BY context)
        |SELECT p.center, p.context, p.n,
        |  round(greatest(ln(CAST(p.n AS DOUBLE) * CAST(tt.t AS DOUBLE) /
        |    (CAST(rm.nc AS DOUBLE) * CAST(cm.nx AS DOUBLE)) / 4.0),
        |    0.0), 6) AS ppmi
        |FROM pc p JOIN rm USING (center) JOIN cm USING (context)
        |CROSS JOIN tt ORDER BY center, context""".stripMargin,

    // node2vec replay over the CAPPED adjacency: the md5-ranked cap
    // (dst tiebreaker, as the operator) feeds both the step candidates
    // and the distance-1 flag; starts come from the RAW edge list
    // (the cap keeps >= 1 edge per src, so the set is identical)
    "q_node2vec_capped" -> {
      def stepCte(k: Int): String =
        s"""cc$k AS (SELECT f.walk_id, f.node AS cur, f.prev,
           |    n.dst AS cand, n.rnk,
           |    CASE WHEN f.prev IS NULL THEN 1.0
           |         WHEN n.dst = f.prev THEN 0.5
           |         WHEN d.dst IS NOT NULL THEN 1.0
           |         ELSE 0.25 END AS w
           |  FROM cs${k - 1} f JOIN cnbr n ON n.src = f.node
           |  LEFT JOIN ce d ON d.src = f.prev AND d.dst = n.dst),
           |ct$k AS (SELECT walk_id, cur, cand, w,
           |    SUM(w) OVER (PARTITION BY walk_id ORDER BY rnk) AS cum,
           |    CAST(CAST(CAST(('0x' || substr(md5('n2v:7:' ||
           |        CAST(walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(cur AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |        AS DOUBLE) / 1152921504606846976.0
           |      * SUM(w) OVER (PARTITION BY walk_id) AS thr
           |  FROM cc$k),
           |cs$k AS (SELECT walk_id, cand AS node, cur AS prev FROM ct$k
           |  WHERE cum > thr AND cum - w <= thr)""".stripMargin
      s"""WITH re AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst FROM lineitem),
        |ce AS (SELECT src, dst FROM (SELECT src, dst,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY md5('cap:7:' || CAST(src AS VARCHAR) || ':' ||
        |        CAST(dst AS VARCHAR)), dst) AS rn FROM re)
        |  WHERE rn <= 3),
        |cnbr AS (SELECT src, dst,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
        |      AS BIGINT) AS rnk
        |  FROM ce),
        |cs0 AS (SELECT DISTINCT src AS walk_id, src AS node,
        |    CAST(NULL AS BIGINT) AS prev FROM re WHERE src % 7 = 0),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM cs0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM cs1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM cs2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM cs3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM cs4
        |ORDER BY walk_id, step, node""".stripMargin
    },

    // symmetric pair counts: the same replayed walks through the
    // q_walk_skipgrams extraction, then both orientations unioned
    // before the one aggregation
    "q_walk_pairs_sym" ->
      s"""WITH $walkOracleCtes,
        |c AS (SELECT node AS center,
        |    lead(node, 1) OVER win AS c1,
        |    lead(node, 2) OVER win AS c2
        |  FROM steps WINDOW win AS (PARTITION BY walk_id ORDER BY step)),
        |pr AS (
        |  SELECT center, c1 AS context FROM c WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM c WHERE c2 IS NOT NULL),
        |pb AS (SELECT center, context FROM pr
        |  UNION ALL SELECT context, center FROM pr)
        |SELECT center, context, count(*) AS n FROM pb
        |GROUP BY 1, 2 ORDER BY center, context""".stripMargin,

    // negative-sampling table: n^0.75 spelled sqrt(n*sqrt(n)) (both
    // engines' sqrt is correctly rounded, so the weight is
    // bit-identical), normalizer = exact DECIMAL(38,9) sum of the
    // 9-dp weights (associativity-free)
    "q_neg_table" ->
      s"""WITH $walkOracleCtes,
        |cnts AS (SELECT node, count(*) AS n FROM steps GROUP BY node),
        |wts AS (SELECT node, n,
        |    round(sqrt(CAST(n AS DOUBLE) * sqrt(CAST(n AS DOUBLE))), 9)
        |      AS w9
        |  FROM cnts),
        |tot AS (SELECT SUM(CAST(w9 AS DECIMAL(38,9))) AS t FROM wts)
        |SELECT node, n, round(w9 / CAST(t AS DOUBLE), 9) AS prob
        |FROM wts CROSS JOIN tot ORDER BY node""".stripMargin,


    // bit-for-bit replay of the seeded walks: the md5-indexed neighbor
    // choice is a pure function of (seed, data), so four unrolled joins
    // reproduce the Spark iteration exactly
    "q_random_walks" ->
      s"""WITH $walkOracleCtes
        |SELECT walk_id, step, node FROM steps
        |ORDER BY walk_id, step, node""".stripMargin,


    // weighted-walk replay: multiplicity-weighted adjacency, per-step
    // interval selection over exact integer-valued running sums
    "q_weighted_walks" -> {
      def stepCte(k: Int): String =
        s"""wt$k AS (SELECT f.walk_id, f.node AS cur, n.dst AS cand, n.w,
           |    SUM(n.w) OVER (PARTITION BY f.walk_id ORDER BY n.rnk) AS cum,
           |    CAST(CAST(CAST(('0x' || substr(md5('ww:7:' ||
           |        CAST(f.walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(f.node AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |        AS DOUBLE) / 1152921504606846976.0
           |      * SUM(n.w) OVER (PARTITION BY f.walk_id) AS thr
           |  FROM ws${k - 1} f JOIN wnbr n ON n.src = f.node),
           |ws$k AS (SELECT walk_id, cand AS node FROM wt$k
           |  WHERE cum > thr AND cum - w <= thr)""".stripMargin
      s"""WITH we AS (SELECT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst,
        |    CAST(count(*) AS DOUBLE) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |wnbr AS (SELECT src, dst, w,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
        |      AS BIGINT) AS rnk
        |  FROM we),
        |ws0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM we
        |  WHERE src % 7 = 0),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM ws0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM ws1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM ws2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM ws3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM ws4
        |ORDER BY walk_id, step, node""".stripMargin
    },


    // node2vec replay: same nbr/start CTEs, per-step candidate weights
    // (prev-NULL uniform / return 0.5 / distance-1 1.0 / drift 0.25 —
    // dyadic, so the running sums are exact), interval selection by the
    // 60-bit md5 uniform times the partition total
    "q_node2vec_walks" -> {
      def stepCte(k: Int): String =
        s"""n2c$k AS (SELECT f.walk_id, f.node AS cur, f.prev,
           |    n.dst AS cand, n.rnk,
           |    CASE WHEN f.prev IS NULL THEN 1.0
           |         WHEN n.dst = f.prev THEN 0.5
           |         WHEN d.dst IS NOT NULL THEN 1.0
           |         ELSE 0.25 END AS w
           |  FROM n2s${k - 1} f JOIN nbr n ON n.src = f.node
           |  LEFT JOIN e d ON d.src = f.prev AND d.dst = n.dst),
           |n2t$k AS (SELECT walk_id, cur, cand, w,
           |    SUM(w) OVER (PARTITION BY walk_id ORDER BY rnk) AS cum,
           |    CAST(CAST(CAST(('0x' || substr(md5('n2v:7:' ||
           |        CAST(walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(cur AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |        AS DOUBLE) / 1152921504606846976.0
           |      * SUM(w) OVER (PARTITION BY walk_id) AS thr
           |  FROM n2c$k),
           |n2s$k AS (SELECT walk_id, cand AS node, cur AS prev FROM n2t$k
           |  WHERE cum > thr AND cum - w <= thr)""".stripMargin
      s"""WITH $walkOracleCtes,
        |n2s0 AS (SELECT walk_id, node, CAST(NULL AS BIGINT) AS prev FROM s0),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM n2s0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM n2s1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM n2s2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM n2s3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM n2s4
        |ORDER BY walk_id, step, node""".stripMargin
    },


    // the DeepWalk pipeline's training pairs: the same replayed walks
    // fed through a walk-keyed lead() window, exactly the q_skipgrams
    // extraction shape on node sequences
    "q_walk_skipgrams" ->
      s"""WITH $walkOracleCtes,
        |c AS (SELECT node AS center,
        |    lead(node, 1) OVER win AS c1,
        |    lead(node, 2) OVER win AS c2
        |  FROM steps WINDOW win AS (PARTITION BY walk_id ORDER BY step)),
        |pairs AS (
        |  SELECT center, c1 AS context FROM c WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM c WHERE c2 IS NOT NULL)
        |SELECT center, context, count(*) AS n FROM pairs
        |GROUP BY 1, 2 ORDER BY center, context""".stripMargin,


    "q_pagerank_checks" ->
      """SELECT * FROM (VALUES ('all_ranks_above_floor', true),
        |  ('mass_sums_to_one', true), ('top_node_is_a_supplier', true))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,


    // triangle truth: same low->high orientation, wedge join, closure
    "q_triangles" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
        |e AS (SELECT x.i AS a, y.i AS b FROM bi x JOIN bi y USING (bk)
        |  WHERE x.i < y.i GROUP BY 1, 2 HAVING count(*) >= 2),
        |w AS (SELECT e1.a, e1.b AS w1, e2.b AS w2
        |  FROM e e1 JOIN e e2 USING (a) WHERE e1.b < e2.b),
        |t AS (SELECT w.a, w.w1, w.w2 FROM w
        |  JOIN e ON e.a = w.w1 AND e.b = w.w2),
        |n AS (SELECT unnest([a, w1, w2]) AS id FROM t)
        |SELECT id, count(*) AS n_triangles FROM n GROUP BY id
        |ORDER BY id""".stripMargin,


    // k-core planted truth: the 3-core of clique(0..5) + chain tail is
    // exactly the clique, every member at in-core degree 5
    "q_kcore" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(3 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(4 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(5 AS BIGINT), CAST(5 AS BIGINT)))
        |  AS t(id, degree)
        |ORDER BY id""".stripMargin,


    // HITS truth: generated unrolled CTE chain (see hitsOracle)
    "q_hits" -> hitsOracle,


    // personalized-PageRank truth: generated unrolled MATERIALIZED
    // iterations (see pprOracle — teleport constants interpolated from
    // the operator's own doubles)
    "q_ppr" -> pprOracle,


    // LPA planted truth: clique A {0..4} -> community 0, clique B
    // {5..9} -> community 5 (derived by hand from the deterministic
    // closed-neighborhood-mode + min-tie-break update rule)
    "q_lpa" ->
      """SELECT CAST(i AS BIGINT) AS id,
        |  CAST(CASE WHEN i < 5 THEN 0 ELSE 5 END AS BIGINT) AS community
        |FROM (SELECT unnest(range(0, 10)) AS i)
        |ORDER BY id""".stripMargin,

    // SPPMI-embedding truth in closed form: block b's SPPMI entry is
    // round6(ln(7/2^b)) (exact double ratios: 700w/100w² = 7/w), the
    // block eigenpair is (10·c_b, uniform/sqrt(10)), so value =
    // round6(sqrt(c_b)) on the own-block component and 0 elsewhere;
    // top-2 |λ| = blocks 0, 1
    "q_sppmi_embed" ->
      """WITH nodes AS (SELECT DISTINCT CAST(l_orderkey % 30 AS BIGINT)
        |    AS node FROM lineitem),
        |b AS (SELECT node, CAST(node // 10 AS INT) AS blk FROM nodes),
        |comp AS (
        |  SELECT CAST(0 AS INT) AS component, CAST(0 AS INT) AS blk,
        |    round(sqrt(round(ln(7.0), 6)), 6) AS v
        |  UNION ALL
        |  SELECT CAST(1 AS INT), CAST(1 AS INT),
        |    round(sqrt(round(ln(3.5), 6)), 6))
        |SELECT nb.node, c.component,
        |  CASE WHEN nb.blk = c.blk THEN c.v ELSE 0.0 END AS value
        |FROM b nb CROSS JOIN comp c
        |ORDER BY node, component""".stripMargin,

    // temporal-walk replay: md5-capped (ts-aware hash) time-stamped
    // adjacency, (ts, dst) ranks, per-edge nlo via a correlated count
    // (fixture-sized — the operator's merge window computes the same
    // thing in one pass), then 4 steps of the modular suffix draw
    "q_temporal_walks" -> {
      def stepCte(k: Int): String =
        s"""ts$k AS (SELECT f.walk_id, a.dst AS node, a.nlo AS lo,
           |    a.ncnt AS cnt, a.ts
           |  FROM ts${k - 1} f JOIN tadj a ON a.src = f.node
           |    AND a.rnk = f.lo +
           |      (CAST(CAST(('0x' || substr(md5('tw:7:' ||
           |        CAST(f.walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(f.node AS VARCHAR)), 1, 15)) AS UBIGINT)
           |        AS BIGINT) % f.cnt)
           |  WHERE f.cnt > 0)""".stripMargin
      s"""WITH te AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst,
        |    CAST(l_orderkey % 100 AS BIGINT) AS ts FROM lineitem),
        |tce AS (SELECT src, dst, ts FROM (SELECT src, dst, ts,
        |    row_number() OVER (PARTITION BY src
        |      ORDER BY md5('tcap:7:' || CAST(src AS VARCHAR) || ':' ||
        |        CAST(dst AS VARCHAR) || ':' || CAST(ts AS VARCHAR)),
        |        dst, ts) AS rn FROM te)
        |  WHERE rn <= 3),
        |tnbr AS (SELECT src, dst, ts,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY ts, dst) - 1
        |      AS BIGINT) AS rnk
        |  FROM tce),
        |tdeg AS (SELECT src AS node, count(*) AS deg FROM tce GROUP BY src),
        |tnlo AS (SELECT e.src, e.dst, e.ts,
        |    (SELECT count(*) FROM tce o
        |      WHERE o.src = e.dst AND o.ts <= e.ts) AS nlo
        |  FROM tce e),
        |tadj AS (SELECT n.src, n.rnk, n.dst, n.ts, l.nlo,
        |    COALESCE(d.deg, 0) - l.nlo AS ncnt
        |  FROM tnbr n
        |  JOIN tnlo l ON l.src = n.src AND l.dst = n.dst AND l.ts = n.ts
        |  LEFT JOIN tdeg d ON d.node = n.dst),
        |ts0 AS (SELECT d.node AS walk_id, d.node, CAST(0 AS BIGINT) AS lo,
        |    d.deg AS cnt
        |  FROM tdeg d JOIN (SELECT DISTINCT src FROM te WHERE src % 7 = 0) s
        |    ON s.src = d.node),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node,
        |  CAST(NULL AS BIGINT) AS ts FROM ts0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node, ts FROM ts1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node, ts FROM ts2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node, ts FROM ts3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node, ts FROM ts4
        |ORDER BY walk_id, step, node""".stripMargin
    }
  )
}
