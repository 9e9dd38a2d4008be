package graft.operators

import graft.functions.{MinHashSignature, SimHash64, SortedJaccardSim, TokenArray, TokenSet, WordShingles}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, token-set
  * Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison.
  * Exact dedup is a hash groupBy (one shuffle on the digest). Jaccard uses
  * equality blocking. MinHash/LSH shuffles only (band, bandHash) keys, so
  * the candidate join touches candidate buckets, not the corpus square.
  */
object Dedup {

  /** Exact dedup on a content digest: one representative row (lowest `idCol`)
    * per distinct digest. Single shuffle on the digest — the canonical
    * 100 TB-safe formulation (min-by aggregation, no window over skewed
    * groups, map-side partial aggregation applies).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))
  }

  /** Word 3-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)) - 1)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact Jaccard similarity of two string-array columns (as sets) —
    * native single-pass kernel (see [[graft.functions.ArrayJaccardSim]]).
    */
  def jaccard(a: Column, b: Column): Column = graft.functions.ArrayJaccardSim(a, b)

  /** Token-set Jaccard near-dup pairs under equality blocking.
    * `blockCols` bounds the candidate space (documented recall tradeoff);
    * at scale choose blocks so each block fits a partition.
    */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   blockCols: Seq[String], threshold: Double): DataFrame = {
    val toks = df.select(Seq(col(idCol).as("id"),
      TokenSet(col(textCol)).as("toks")) ++
      blockCols.map(col): _*)
    val l = toks.select(Seq(col("id").as("id1"), col("toks").as("t1")) ++
      blockCols.map(col): _*)
    val r = toks.select(Seq(col("id").as("id2"), col("toks").as("t2")) ++
      blockCols.map(col): _*)
    l.join(r, blockCols)
      .filter(col("id1") < col("id2"))
      // lossless size-ratio prefilter: jaccard >= t implies
      // t*|B| <= |A| and t*|A| <= |B| — prunes most pairs with two
      // integer-sized comparisons before the merge-scan kernel runs
      .filter(size(col("t1")).cast("double") >= lit(threshold) * size(col("t2")) &&
              size(col("t2")).cast("double") >= lit(threshold) * size(col("t1")))
      .withColumn("jaccard", SortedJaccardSim(col("t1"), col("t2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: shingle -> one-pass signature ->
    * band buckets -> bucket self-join for candidates -> exact Jaccard
    * verification (Broder'97; banding per Leskovec et al., MMDS ch.3).
    *
    * numPerm = bands * rowsPerBand. Only (band, bandHash) is shuffled;
    * candidate pairs are verified against exact shingle Jaccard so the
    * output has no false positives.
    */
  def minHashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, numPerm: Int = 128,
                      bands: Int = 32): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val base = df.select(col(idCol).as("id"),
      WordShingles(col(textCol), 3).as("sh"))
      .withColumn("sig", MinHashSignature(col("sh"), numPerm))
    val banded = base.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col("id").as("id1"), col("sh").as("sh1"))
    val r = banded.select(col("band"), col("band_hash"), col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2").dropDuplicates("id1", "id2")
      .withColumn("jaccard", SortedJaccardSim(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signature, exact-match buckets on
    * 16-bit quarters. By pigeonhole, any pair within Hamming distance <= 3
    * shares at least one exact quarter, so recall is total for
    * maxHamming <= 3; candidates are verified with an exact popcount.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      SimHash64(TokenArray(col(textCol))).as("sig"))
    // block on 16-bit quarters: any pair within Hamming<=3 shares >=1 exact quarter
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("sig"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "qkey")
    val l = blocked.select(col("q"), col("qkey"), col("id").as("id1"), col("sig").as("sig1"))
    val r = blocked.select(col("q"), col("qkey"), col("id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("q", "qkey"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "sig1", "sig2").dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Connected components over near-dup pairs via iterative min-label
    * propagation: each node adopts the smallest label among itself and its
    * neighbors until fixpoint. O(component diameter) rounds, each one
    * shuffle (join + min-aggregate) — near-dup components are shallow
    * (duplicates of duplicates), so this converges in a handful of rounds
    * even at corpus scale. Returns (id, component) with component = min id
    * in the component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          smallGraphEdges: Long = 5000000L): DataFrame = {
    // near-dup candidate graphs are a tiny fraction of the corpus; below
    // the threshold a driver-side union-find beats O(diameter) shuffle
    // rounds by orders of magnitude (same hybrid as broadcast-vs-shuffle
    // joins). The iterative path remains for genuinely huge pair sets.
    if (pairs.limit((smallGraphEdges + 1).toInt).count() <= smallGraphEdges)
      return unionFindComponents(pairs)
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "n_comp"), Seq("dst"))
        .select(col("src").as("id"), col("n_comp").as("component"))
      val updated = labels.select(col("id"), col("component"))
        .union(neighborLabels)
        .groupBy("id").agg(min("component").as("component"))
        .persist()
      val changed = updated.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") < col("old")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(blocking = false)
    labels
  }

  /** Driver-side union-find over a collected edge list, emitted back as a
    * (id, component) DataFrame with component = min id per component.
    */
  private def unionFindComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("id1").cast("long"), col("id2").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val rows = parent.keys.toSeq.map(id => (id, find(id)))
    rows.toDF("id", "component")
  }

  /** Corpus-level near-duplicate removal: cluster MinHash+LSH pairs into
    * components and keep the lowest-id document of each component (plus
    * every unpaired document). The end-to-end dedup a training-data
    * pipeline actually runs.
    */
  def dedupCorpus(df: DataFrame, textCol: String, idCol: String,
                  threshold: Double): DataFrame = {
    // persist: connectedComponents consumes the pairs twice (size probe +
    // edge collect); without it the full shingle -> signature -> band-join
    // pipeline evaluates twice
    val pairs = minHashLshPairs(df, textCol, idCol, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comps = connectedComponents(pairs)
    pairs.unpersist(blocking = false)
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("_keep", col(idCol) === col("component"))
      .filter(col("_keep")).drop("_keep")
  }
}
