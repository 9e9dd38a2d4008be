package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}

import org.apache.spark.sql.functions._

/** PII, normalization, decontamination, LM surprisal, vector transforms. */
class PiiNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("piiFeatures counts and redacts planted emails, IPs and SSNs") {
    val docs = Seq(
      (1L, "mail me at a.b@x.io and bob@corp.example.com thanks"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 ssn 123-45-6789"),
      (3L, "clean text, nothing to find")).toDF("doc_id", "text")
    val out = TextAnalysis.piiFeatures(docs, "text")
      .select("doc_id", "n_emails", "n_ipv4", "n_ssn", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, 0, 0, "mail me at [EMAIL] and [EMAIL] thanks")))
    assert(out(1) == ((2L, 0, 2, 1, "server at [IP] and [IP] ssn [SSN]")))
    assert(out(2) == ((3L, 0, 0, 0, "clean text, nothing to find")))
  }

  test("normalizeText lowers, strips punctuation, collapses whitespace") {
    val out = Seq("  Héllo,   WORLD!! 42  ").toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].head()
    assert(out == "h llo world 42")
  }
}

class DecontaminationSpec extends SparkSpecBase {
  import spark.implicits._

  test("contamination flags exactly the docs sharing a 3-shingle with the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark physical plans"),
      (3L, "quick brown fox appears here too")).toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox story")).toDF("doc_id", "text")
    val out = Dedup.contamination(train, bench, "text", "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // shared shingle: "quick brown fox" in docs 1 and 3; doc 2 clean
    assert(out == Map(1L -> 1L, 3L -> 1L))
  }
}

class SurprisalSpec extends SparkSpecBase {
  import spark.implicits._

  test("unigramSurprisal ranks rare-token docs above common-token docs") {
    val docs = Seq(
      (1L, "the the the the the"),
      (2L, "zygote quasar phoneme umlaut kudzu"),
      (3L, "the the the zygote the")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(2) > out(3) && out(3) > out(1),
      s"expected rare > mixed > common, got $out")
    val nt = TextAnalysis.unigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(nt == Map(1L -> 5L, 2L -> 5L, 3L -> 5L))
  }

  test("bigramSurprisal charges rare continuations more than the dominant pattern") {
    val docs = Seq(
      (1L, "a b a b a b a b a b"),     // only the dominant bigrams
      (2L, "a b a b a b a b a z"),     // one rare continuation (a,z)
      (3L, "a")).toDF("doc_id", "text") // <2 tokens: no row
    val out = TextAnalysis.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(3L), "single-token doc must emit no row")
    assert(out(1L)._2 == 9L && out(2L)._2 == 9L)
    assert(out(1L)._3 < out(2L)._3,
      s"doc with the unseen continuation must surprise more: $out")
    // hand-check doc 1 exactly: corpus counts c(a,b)=9, c(b,a)=8,
    // c(a)=11 (5+5+1 with doc 3), c(b)=9, c(z)=1, N=21, V=3
    val pAB = 0.75 * 9.0 / 11 + 0.25 * (9 + 1.0) / (21 + 3)
    val pBA = 0.75 * 8.0 / 9 + 0.25 * (11 + 1.0) / (21 + 3)
    val expect = -(5 * math.log(pAB) + 4 * math.log(pBA)) / 9
    assert(math.abs(out(1L)._3 - expect) < 1e-5,
      s"doc 1 surprisal ${out(1L)._3} != $expect")
  }
}

class DuplicatedSpansSpec extends SparkSpecBase {
  import spark.implicits._

  test("duplicatedSpans merges overlapping repeated k-grams into maximal spans") {
    // k=3. "p q r s" appears in docs 1 and 2 -> two overlapping dup
    // 3-grams (p q r @0/5 shifts, q r s) merge into one span per doc.
    val docs = Seq(
      (1L, "p q r s x y z w v u"),
      (2L, "m n p q r s o k j h"),
      (3L, "unique tokens only here nothing repeats at all")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpans(docs, "text", "doc_id", 3)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc1: "p q r s" at tokens 0..3 -> grams at 0 ("p q r") and 1
    // ("q r s"), both repeated in doc2 (positions 2 and 3) -> spans
    // [0,3] (2 grams) and [2,5]
    assert(out == Seq((1L, 0, 3, 2L), (2L, 2, 5, 2L)), s"got $out")
  }

  test("duplicatedSpans counts a within-document repeat and breaks on true gaps") {
    // "a b c" repeats inside ONE doc at positions 0 and 10 (gap > k)
    val docs = Seq(
      (7L, "a b c one two three four five six seven a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpans(docs, "text", "doc_id", 3)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((7L, 0, 2, 1L), (7L, 10, 12, 1L)), s"got $out")
  }
}

class GapFillSpec extends SparkSpecBase {
  import spark.implicits._

  test("dailyGapFill emits zero rows for missing days within each user's span") {
    val ev = Seq(
      (1L, "2026-01-01 10:00:00"),
      (1L, "2026-01-04 09:00:00"),
      (1L, "2026-01-04 11:00:00"),
      (2L, "2026-02-10 00:00:00")).toDF("user_id", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val out = graft.streaming.EventsOps.dailyGapFill(ev)
      .select($"user_id", $"day".cast("string"), $"n_events")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, "2026-01-01", 1L), (1L, "2026-01-02", 0L),
      (1L, "2026-01-03", 0L), (1L, "2026-01-04", 2L),
      (2L, "2026-02-10", 1L)))
  }
}

class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  test("containment catches an embedded doc that Jaccard dilutes below threshold") {
    val small = "alpha beta gamma delta"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small, "g"), (2L, big, "g"), (3L, "other stuff here", "g"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.containmentPairs(docs, "text", "doc_id", Seq("lang"), 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    // 1 is fully contained in 2 (containment 1.0); reverse direction ~4/44
    assert(out == Seq((1L, 2L, 1.0)))
    // Jaccard would be ~4/44 — far below any near-dup threshold
    val j = Dedup.jaccardPairs(docs, "text", "doc_id", Seq("lang"), 0.9).count()
    assert(j == 0)
  }

  test("unblocked containmentPairs matches blocked truth via prefix filter, no cartesian") {
    // constant block -> the blocked path IS the exhaustive truth; the
    // unblocked call must find the same pairs through the prefix-candidate
    // join, and its plan must never degrade to a cartesian product
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small, "g"), (2L, big, "g"),
      (3L, "other stuff entirely here", "g"),
      (4L, "alpha beta gamma delta zeta", "g"), // 4/5 of doc 1's tokens
      (5L, small, "g"))                         // exact twin of 1
      .toDF("doc_id", "text", "lang")
    val truth = Dedup.containmentPairs(docs, "text", "doc_id", Seq("lang"), 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val unblocked = Dedup.containmentPairs(docs, "text", "doc_id", Nil, 0.8)
    unblocked.collect()
    val p = unblocked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"unblocked containment degraded to a cartesian:\n$p")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", Nil, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == truth, s"prefix-filter pairs $got != blocked truth $truth")
    assert(truth.contains((1L, 2L, 1.0)) && truth.contains((1L, 5L, 1.0)) &&
      truth.contains((4L, 1L, 0.8)), s"expected planted pairs in $truth")
  }
}

class HardNegativesSpec extends SparkSpecBase {
  import spark.implicits._

  test("hardNegatives ranks the nearest OTHER-label vector first, never own-label") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),     // query
      (2L, Array(0.999f, 0.05f), 0),  // same label, nearest overall -> excluded
      (3L, Array(0.97f, 0.24f), 1),   // other label, closest negative
      (4L, Array(0.0f, 1.0f), 1),     // other label, orthogonal
      (5L, Array(0.9f, 0.44f), 2))    // third label
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .hardNegatives(vecs.filter($"vec_id" === 1L), vecs, 2)
      .select("query_id", "rank", "negative_id")
      .as[(Long, Int, Long)].collect().sortBy(_._2).toSeq
    assert(out.map(_._3) == Seq(3L, 5L), s"got $out")
    assert(!out.exists(_._3 == 2L), "own-label vector must never appear")
  }
}

class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("semanticDedupCorpus keeps one representative per cosine cluster") {
    val docs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.1f), 0), // cluster
      (3L, Array(0.0f, 1.0f), 0), // separate
      (4L, Array(1.0f, 0.0f), 1)) // same direction, other block
      .toDF("vec_id", "embedding", "label")
    val kept = graft.operators.Similarity
      .semanticDedupCorpus(docs, "label", 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }
}

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunkDocuments windows with overlap, short tail, empty doc dropped") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y z"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "text", "doc_id", 4, 1)
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    // step 3: starts 0,3,6,9 for doc 1
    assert(out == Seq(
      (1L, 0, "a b c d", 4), (1L, 1, "d e f g", 4),
      (1L, 2, "g h i j", 4), (1L, 3, "j", 1),
      (2L, 0, "x y z", 3)))
    // every token of doc 1 appears in at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
  }
}

class PackSequencesSpec extends SparkSpecBase {
  import spark.implicits._

  test("packSequences greedily fills, isolates oversize docs, resets on overflow") {
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, doc(3), "g"), (2L, doc(4), "g"), // 3+4=7 fits in 8
      (3L, doc(2), "g"), // 7+2 > 8 -> new seq
      (4L, doc(9), "g"), // oversize -> own seq
      (5L, doc(1), "g"), // after oversize -> new seq
      (6L, doc(5), "h"),
      (7L, null, "h")).toDF("doc_id", "text", "grp") // null text -> 0 tokens
    val out = TextAnalysis.packSequences(docs, "text", "doc_id", "grp", 8)
      .select("doc_id", "n_tokens", "seq_id", "offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0L), (2L, 4L, 0L, 3L),
      (3L, 2L, 1L, 0L), (4L, 9L, 2L, 0L),
      (5L, 1L, 3L, 0L), (6L, 5L, 0L, 0L),
      (7L, 0L, 0L, 5L)))
  }

  // Regression for round 4: column references resolved against tuple
  // positional names (`_1`) pass on a LocalRelation but fail analysis
  // on a file-backed relation, so the spec must exercise parquet input.
  test("packSequences works on parquet-backed input (not just LocalRelation)") {
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("pack_seq_parquet").toString
    try {
      Seq(
        (1L, doc(3), "g"), (2L, doc(4), "g"), (3L, doc(2), "g"),
        (4L, doc(9), "g"), (5L, doc(1), "g"),
        (6L, doc(5), "h"), (7L, null, "h"))
        .toDF("doc_id", "text", "grp")
        .write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      val out = TextAnalysis.packSequences(docs, "text", "doc_id", "grp", 8)
        .select("doc_id", "n_tokens", "seq_id", "offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(out == Seq(
        (1L, 3L, 0L, 0L), (2L, 4L, 0L, 3L),
        (3L, 2L, 1L, 0L), (4L, 9L, 2L, 0L),
        (5L, 1L, 3L, 0L), (6L, 5L, 0L, 0L),
        (7L, 0L, 0L, 5L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

class VectorTransformSpec extends SparkSpecBase {
  import spark.implicits._

  test("l2Normalize yields unit vectors and keeps zero vectors zero") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = df.select($"vec_id", Similarity.l2Normalize($"embedding").as("u"))
      .as[(Long, Array[Double])].collect().toMap
    assert(out(1L).toSeq == Seq(0.6, 0.8))
    assert(out(2L).toSeq == Seq(0.0, 0.0))
  }

  test("quantizeInt8 is within half-step of the scaled value and clamps to [-127,127]") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val (q, scale) = Similarity.quantizeInt8($"embedding")
    val (qs, sc) = df.select(q.as("q"), scale.as("s"))
      .as[(Array[Long], Double)].head()
    assert(sc == 127.0)
    assert(qs.toSeq == Seq(64L, -127L, 32L, 0L))
    assert(qs.forall(v => v >= -127 && v <= 127))
  }
}

class DsirSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("dsirWeights: in-domain docs outscore off-domain; tokenless score 0") {
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma alpha gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"),          // in-domain
      (2L, "zebra quokka wombat"),       // off-domain
      (3L, "alpha zebra"),               // mixed
      (4L, "")).toDF("doc_id", "text")   // tokenless
    val out = TextAnalysis.dsirWeights(raw, target, "text", "doc_id", 1000)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      s"expected in-domain > mixed > off-domain: $out")
    assert(out(1L)._2 > 0 && out(2L)._2 < 0)
    assert(out(4L) == (0L, 0.0))
    assert(out(1L)._1 == 3L && out(2L)._1 == 3L)
  }
}

class TopicTagSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("topicTag: token-boundary hits, dominance tie-break, zero-hit docs absent") {
    val docs = Seq(
      (1L, "scan filter scan table"),       // query_exec 3, storage 1
      (2L, "table row"),                    // storage only
      (3L, "partition artful"),             // NO hits: 'part'/'art' must
                                            // not fire inside larger tokens
      (4L, "scan table")                    // 1-1 tie -> query_exec wins
    ).toDF("doc_id", "text")
    val topics = Map(
      "query_exec" -> Seq("scan", "filter"),
      "storage" -> Seq("table", "row", "part", "art"))
    val out = TextAnalysis.topicTag(docs, topics).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("topic")) -> r).toMap
    assert(out((1L, "query_exec")).getAs[Long]("hits") == 3L)
    assert(out((1L, "query_exec")).getAs[Double]("share") == 0.75)
    assert(out((1L, "query_exec")).getAs[Boolean]("is_dominant"))
    assert(!out((1L, "storage")).getAs[Boolean]("is_dominant"))
    assert(out((2L, "storage")).getAs[Long]("hits") == 2L)
    assert(!out.keys.exists(_._1 == 3L)) // token boundary respected
    assert(out((4L, "query_exec")).getAs[Boolean]("is_dominant"))
    assert(!out((4L, "storage")).getAs[Boolean]("is_dominant"))
  }

  test("topicTag plan: keyword side broadcasts, explode stays narrow") {
    val docs = Seq((1L, "scan filter")).toDF("doc_id", "text")
    val df = TextAnalysis.topicTag(docs, Map("q" -> Seq("scan")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast kw join:\n$p")
  }

  test("tokenFertility: exact counts per language; empty-language guard") {
    val docs = Seq(
      ("en", "ab cd"),     // ws 2, bpe 2 ('ab','cd'), chars 5
      ("en", "a1!"),       // ws 1, bpe 3 ('a','1','!')
      ("zh", "xx yy zz")   // ws 3, bpe 3, chars 8
    ).toDF("lang", "text")
    val out = graft.operators.TextAnalysis.tokenFertility(docs)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("en").getAs[Long]("ws_tokens") == 3L)
    assert(out("en").getAs[Long]("bpe_tokens") == 5L)
    assert(out("en").getAs[Double]("fertility") ==
      BigDecimal(5.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("en").getAs[Double]("chars_per_token") == 1.6) // 8 chars / 5
    assert(out("zh").getAs[Double]("fertility") == 1.0)
  }
}

/** Secrets screen: rule precedence, entropy discrimination, masking. */
class DetectSecretsSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("detectSecrets: prefix convicts, high-entropy hex convicts, low-entropy hex walks") {
    val docs = Seq(
      (1L, "call sk-" + "abcdefghij0123456789 to auth"), // prefix (split: no key-shaped literal in source)
      (2L, "hash 3f7a9c1e5b2d8f4a6c0e9b1d7a3f5c8e present"), // 40 hex, high entropy
      (3L, "pad aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa here"), // 36 a's: entropy 0
      (4L, "short deadbeef and normal words only"),          // < minLen: no candidate
      (5L, "b64ish QmFzZTY0K1NlY3JldHMvRW50cm9weTIwMjQ9PQ wow")) // mixed-case candidate
      .toDF("doc_id", "text")
    val out = TextAnalysis.detectSecrets(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) == "prefix")
    assert(out(1L).getString(1).startsWith("sk-a") &&
      out(1L).getString(1).endsWith("***23"))
    assert(out(2L).getString(2) == "hex")
    assert(!out.contains(3L), "constant run has entropy 0: must walk")
    assert(!out.contains(4L))
    assert(out(5L).getString(2) == "b64")
    assert(out(5L).getAs[Double]("entropy") >= 4.0)
  }

  test("detectSecrets: the same token twice in a doc reports once") {
    val docs = Seq((1L, "k sk-" + "abcdefghij0123456789 and sk-" + "abcdefghij0123456789"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.detectSecrets(docs).count() == 1L)
  }
}

/** Canary sweep: hits with positions, misses clean, multi-canary docs. */
class FindCanariesSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("findCanaries reports each (doc, canary) hit with its 1-based position") {
    val docs = Seq(
      (1L, "clean text with nothing planted"),
      (2L, "xx CANARY-alpha yy"),
      (3L, "CANARY-beta first then CANARY-alpha too"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.findCanaries(docs,
        Seq("CANARY-alpha", "CANARY-beta"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((2L, "CANARY-alpha")) == 4L)
    assert(out((3L, "CANARY-beta")) == 1L)
    assert(out((3L, "CANARY-alpha")) == 24L)
    assert(out.size == 3)
  }
}

/** Heaps curve: exact cumulative checkpoints on a constructed corpus. */
class HeapsCurveSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("heapsCurve: exact token/vocab checkpoints and the log-log fit") {
    // 10 docs, one fresh term + one shared term each; 5 buckets of 2
    val docs = (0L until 10L).map(i => (i, s"w$i common")).toDF("doc_id", "text")
    val out = TextAnalysis.heapsCurve(docs, buckets = 5).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 8L, 12L, 16L, 20L))
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 5L, 7L, 9L, 11L))
    // replicate the operator's two-stage float contract exactly
    def r9(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP))
    val xs = Seq(4L, 8L, 12L, 16L, 20L).map(t => r9(math.log(t.toDouble)))
    val ys = Seq(3L, 5L, 7L, 9L, 11L).map(v => r9(math.log(v.toDouble)))
    val n = 5.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val expect = java.math.BigDecimal.valueOf(beta)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(out.forall(_.getAs[Double]("heaps_beta") == expect))
  }

  test("heapsCurve: a vocabulary-saturating corpus fits a smaller beta than a junk one") {
    val sat = (0L until 40L).map(i => (i, s"a b c d w${i % 4}")).toDF("doc_id", "text")
    val junk = (0L until 40L).map(i => (i, s"h${i}a h${i}b h${i}c h${i}d h${i}e")).toDF("doc_id", "text")
    val bSat = TextAnalysis.heapsCurve(sat).head().getAs[Double]("heaps_beta")
    val bJunk = TextAnalysis.heapsCurve(junk).head().getAs[Double]("heaps_beta")
    assert(bJunk > 0.95, s"every-token-fresh corpus must fit beta ~1, got $bJunk")
    assert(bSat < 0.3, s"saturating corpus must fit a small beta, got $bSat")
  }
}

/** Governance screens: Luhn payment-card candidates and encoding-damage
  * (mojibake) detection.
  */
class ScreenOpsSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("luhnScreen: mod-10 verdicts, masking, and length bounds") {
    // 4111-1111-1111-1111 is the canonical valid test PAN; +1 breaks it
    val pan = "4111" + "1111" + "1111" + "1111"
    val bad = "4111" + "1111" + "1111" + "1112"
    val docs = Seq(
      (1L, s"order $pan shipped"),
      (2L, s"ref $bad pending"),
      (3L, "phone 123456789012 call"), // 12 digits: below card length
      (4L, "id 12345678901234567890 x"), // 20 digits: above card length
      (5L, s"two: $pan and $bad")).toDF("doc_id", "text")
    val out = TextAnalysis.luhnScreen(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("masked")) -> r)
      .toMap
    assert(out.size == 4) // docs 3 and 4 produce no candidates
    assert(out((1L, "****1111")).getAs[Boolean]("luhn_valid"))
    assert(!out((2L, "****1112")).getAs[Boolean]("luhn_valid"))
    assert(out((1L, "****1111")).getAs[Long]("n_digits") == 16L)
    assert(out((5L, "****1111")).getAs[Boolean]("luhn_valid"))
    assert(!out((5L, "****1112")).getAs[Boolean]("luhn_valid"))
    // a 13-digit run is in range: 79927398713 is the classic Luhn
    // example (valid), padded to 13 with leading zeros stays valid
    val pad = Seq((9L, "n 0079927" + "398713 t")).toDF("doc_id", "text")
    assert(TextAnalysis.luhnScreen(pad).head().getAs[Boolean]("luhn_valid"))
  }

  test("kneserNeyBigram: hand-derived continuation probabilities") {
    // corpus bigram instances: (a,b)x2, (a,c)x1, (c,b)x1
    // c(a.)=3 N1+(a.)=2; c(c.)=1 N1+(c.)=1; N1+(.b)=2 N1+(.c)=1; types=3
    // P(b|a) = 1.25/3 + .75*2/3 * 2/3 = 0.75
    // P(c|a) = 0.25/3 + .75*2/3 * 1/3 = 0.25
    // P(b|c) = 0.25/1 + .75*1/1 * 2/3 = 0.75
    val docs = Seq("a b", "a b", "a c", "c b").toDF("text")
    val out = TextAnalysis.kneserNeyBigram(docs).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    assert(out.size == 3)
    assert(out(("a", "b")).getAs[Long]("c12") == 2L)
    assert(out(("a", "b")).getAs[Long]("c1") == 3L)
    assert(out(("a", "b")).getAs[Long]("n_follow") == 2L)
    assert(out(("a", "b")).getAs[Long]("n_prec") == 2L)
    assert(out(("a", "b")).getAs[Double]("p_kn") == 0.75)
    assert(out(("a", "c")).getAs[Double]("p_kn") == 0.25)
    assert(out(("c", "b")).getAs[Double]("p_kn") == 0.75)
    // seen-mass completeness: P(b|a) + P(c|a) = 1 (every continuation
    // of 'a' is seen, so no mass leaks to unseen types)
    assert(out(("a", "b")).getAs[Double]("p_kn")
      + out(("a", "c")).getAs[Double]("p_kn") == 1.0)
  }

  test("distinctN: exact n-gram diversity ratios; short docs filtered per n") {
    // unigrams 6/3 distinct -> 0.5; bigrams 4/3 -> 0.75; trigrams only
    // from the first doc (the 2-token doc filters out): 2/2 -> 1.0
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = TextAnalysis.distinctN(docs).collect()
      .map(r => r.getAs[Int]("n") -> r).toMap
    assert(out(1).getAs[Long]("total_ngrams") == 6L)
    assert(out(1).getAs[Long]("distinct_ngrams") == 3L)
    assert(out(1).getAs[Double]("distinct_ratio") == 0.5)
    assert(out(2).getAs[Long]("total_ngrams") == 4L)
    assert(out(2).getAs[Double]("distinct_ratio") == 0.75)
    assert(out(3).getAs[Long]("total_ngrams") == 2L)
    assert(out(3).getAs[Double]("distinct_ratio") == 1.0)
  }

  test("burstiness: bursty terms read Fano >> 1, spread terms ~ Poisson") {
    // x: 4 occurrences in ONE of 3 docs -> fano 4; y: spread over two
    // docs one each -> fano 0.5
    val docs = Seq((1L, "x x x x"), (2L, "y"), (3L, "y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.burstiness(docs).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(out("x").getAs[Long]("tf") == 4L)
    assert(out("x").getAs[Long]("doc_freq") == 1L)
    assert(out("x").getAs[Double]("fano") == 4.0)
    assert(out("y").getAs[Long]("doc_freq") == 2L)
    assert(out("y").getAs[Double]("fano") == 0.5)
  }

  test("scriptProfile: exact per-script counts and dominance precedence") {
    val docs = Seq(
      (1L, "pure ascii words"),
      (2L, "mix \u0410\u0411\u0412\u0413 ok"), // 4 Cyrillic vs 5 Latin
      (3L, "\u4E00\u4E8C\u4E09\u56DB\u4E94 cjk"), // 5 Han vs 3 Latin
      (4L, "\u0627\u0628\u062A\u062B"), // Arabic only
      (5L, "12345 .,;:!")).toDF("doc_id", "text")   // no script at all
    val out = TextAnalysis.scriptProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("dominant") == "latin")
    assert(out(2L).getAs[Long]("n_cyrillic") == 4L)
    assert(out(2L).getAs[Long]("n_latin") == 5L)
    assert(out(2L).getAs[String]("dominant") == "latin")
    assert(out(3L).getAs[Long]("n_han") == 5L)
    assert(out(3L).getAs[String]("dominant") == "han")
    assert(out(4L).getAs[Long]("n_arabic") == 4L)
    assert(out(4L).getAs[String]("dominant") == "arabic")
    assert(out(5L).getAs[String]("dominant") == "none")
    // tie goes to the fixed precedence order (latin first)
    val tie = Seq((9L, "ab \u0410\u0411")).toDF("doc_id", "text")
    assert(TextAnalysis.scriptProfile(tie).head()
      .getAs[String]("dominant") == "latin")
  }

  test("mojibakeScreen: counts damage markers, clean docs never return") {
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "Caf\u00C3\u00A9 and clich\u00C3\u00A9"), // 2 lead bytes
      (3L, "broken \uFFFD here \uFFFD too"),
      (4L, "\u00C2 nbsp artifact")).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeScreen(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L))
    assert(out(2L).getAs[Long]("n_latin1_marker") == 2L)
    assert(out(2L).getAs[Long]("n_replacement") == 0L)
    assert(out(3L).getAs[Long]("n_replacement") == 2L)
    assert(out(4L).getAs[Long]("n_latin1_marker") == 1L)
  }
}
