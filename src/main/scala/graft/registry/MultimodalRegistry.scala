package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal registry: image/audio/video headers,
  * perceptual hashes, frame planning and joint near-dup.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object MultimodalRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- multimodal: binary payload + stubbed decode via mapPartitions ----
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.decodeImageMeta(
        Multimodal.withPayload(t(s, dir, "documents"), "text")).orderBy("doc_id")),


    // ---- multimodal: per-frame sampling (explode shape + digests) ----
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSamples(t(s, dir, "documents"), 4)
        .withColumn("frame_idx", col("frame_idx").cast("long"))
        .orderBy("doc_id", "frame_idx")),


    // ---- video container metadata: REAL MP4 ISO-BMFF box walk + AVI
    //      RIFF header walk (VideoHeader.parse) over planted
    //      deterministic containers — doc_id % 3 picks mp4 / avi /
    //      junk-bytes, parameters are closed-form in doc_id so the
    //      oracle states the parsed truth directly; junk rows prove the
    //      NULL-not-crash contract ----
    "q_video_meta" -> ((s, dir) => {
      val mp4 = udf((d: Long) => VideoHeader.syntheticMp4(
        (16 * (d % 60 + 4)).toInt, (16 * (d % 40 + 3)).toInt,
        d % 9000 + 1000, ((d / 3) % 3 + 1).toInt))
      val avi = udf((d: Long) => VideoHeader.syntheticAvi(
        (d % 320 + 16).toInt, (d % 240 + 12).toInt, 40000L,
        d % 500 + 50, ((d / 3) % 2 + 1).toInt))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, mp4(col("doc_id")))
          .when(col("doc_id") % 3 === 1, avi(col("doc_id")))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      Multimodal.decodeVideoMeta(payloads).orderBy("doc_id")
    }),


    // ---- frame-seek plan from REAL parsed container durations: 5
    //      midpoint-uniform timestamps per video (integer div — exact),
    //      non-videos drop with their NULL duration ----
    "q_frame_timestamps" -> ((s, dir) => {
      val mp4 = udf((d: Long) => VideoHeader.syntheticMp4(
        (16 * (d % 60 + 4)).toInt, (16 * (d % 40 + 3)).toInt,
        d % 9000 + 1000, ((d / 3) % 3 + 1).toInt))
      val avi = udf((d: Long) => VideoHeader.syntheticAvi(
        (d % 320 + 16).toInt, (d % 240 + 12).toInt, 40000L,
        d % 500 + 50, ((d / 3) % 2 + 1).toInt))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, mp4(col("doc_id")))
          .when(col("doc_id") % 3 === 1, avi(col("doc_id")))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      Multimodal.frameTimestamps(Multimodal.decodeVideoMeta(payloads), 5)
        .orderBy("doc_id", "frame_idx")
    }),


    // ---- image near-dup via REAL pixel decode (javax.imageio): planted
    //      resized-and-re-encoded twins. Each selected doc gets a
    //      deterministic doc-seeded image, piecewise-constant on the
    //      9x8 dHash grid, and a twin at half resolution — cell-aligned
    //      area-average resize preserves the dHash EXACTLY (spec-
    //      proven), unrelated doc seeds land ~24/64 bits apart, so the
    //      banded-Hamming join returns exactly the planted pair set at
    //      Hamming 0, which the oracle states in closed form ----
    "q_image_neardup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select("doc_id")
      val imgs = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
      Dedup.hammingPairs(Multimodal.imagePHash(imgs))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id1", "id2")
    }),


    // ---- image near-dup with PIXEL verification: the corpus-scale
    //      two-stage shape (banded dHash candidates -> exact-grid
    //      verify). Planted per doc: a true resized twin (+10M) AND a
    //      DESIGNED dHash collision (+20M, every cell +40 — gradient
    //      directions unchanged, so both perceptual hashes match while
    //      pixels differ by exactly 40). The hash stage surfaces all
    //      three pairs at Hamming 0; the pixel stage keeps only the
    //      true twin — which the oracle states in closed form ----
    "q_image_verified_dedup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val mkDecoy = udf((d: Long) => Multimodal.syntheticImageShifted(d, 40))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 13 === 0)
        .select("doc_id")
      val imgs = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
        .unionByName(ids.select((col("doc_id") + lit(20000000L)).as("doc_id"),
          mkDecoy(col("doc_id")).as("payload")))
      val cand = Dedup.hammingPairs(Multimodal.imagePHash(imgs))
      Multimodal.verifyImagePairs(cand, imgs, maxMeanAbsDiff = 10.0)
        .orderBy("id1", "id2")
    }),


    // ---- audio near-dup via REAL PCM decode (RIFF/WAV chunk walk, no
    //      codec): planted half-rate resampled twins. Segment-aligned
    //      square-wave amplitudes make the 64-bit energy-envelope hash
    //      EXACTLY resample-invariant (spec-proven), unrelated seeds
    //      ~32/64 bits apart — the banded-Hamming join returns exactly
    //      the planted pairs at Hamming 0 ----
    "q_audio_neardup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticWav(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resampleWav(Multimodal.syntheticWav(d), 2))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 11 === 0)
        .select("doc_id")
      val clips = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
      Dedup.hammingPairs(Multimodal.audioPHash(clips))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id1", "id2")
    }),


    // ---- joint image+text dedup: the pretraining-corpus curation shape.
    //      Docs carry BOTH a text and an image; near-dup pairs from text
    //      MinHash-LSH and image dHash UNION into one graph, connected
    //      components fold, survivorship keeps the min id. Planted:
    //      text twins (+10M, drop-last-token, disjoint vocab) for
    //      d % 2 = 0, image twins (+20M, resized pixels) for d % 3 = 0 —
    //      twin rows carry UNRELATED content in the OTHER modality (own
    //      seed/vocab), so each modality contributes exactly its planted
    //      edges and the union clusters {d, d+10M?, d+20M?} collapse to
    //      component d. Oracle derives the same map in closed form ----
    "q_multimodal_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"), TokenArray(col("text")).as("tk"))
        .withColumn("tk", transform(col("tk"),
          tok => concat(lit("d"), col("doc_id"), lit("x"), tok)))
      val origs = base.select(col("doc_id"), concat_ws(" ", col("tk")).as("text"))
      val textTwins = base
        .filter(col("doc_id") % 2 === 0 &&
          size(WordShingles(concat_ws(" ", col("tk")), 3)) >= 10)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat_ws(" ", slice(col("tk"), lit(1), size(col("tk")) - 1)).as("text"))
      // image twins get their own disjoint vocabulary (no text edges)
      val imageTwins = base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(20000000L)).as("doc_id"),
          concat(lit("img"), col("doc_id"), lit(" solo row")).as("text"))
      val all = origs.unionByName(textTwins).unionByName(imageTwins)
      // image payload: base docs and their +20M twins share pixels
      // (twin = cell-aligned resize); text twins get their own seed
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val withImg = all.withColumn("payload",
        when(col("doc_id") >= 20000000L, mkTwin(col("doc_id") - 20000000L))
          .otherwise(mk(col("doc_id"))))
      val textPairs = Dedup.minHashLshPairs(withImg, "text", "doc_id", 0.5)
        .select("id1", "id2")
      val imagePairs = Dedup.hammingPairs(Multimodal.imagePHash(withImg))
        .select("id1", "id2")
      val comp = Dedup.connectedComponents(textPairs.unionByName(imagePairs))
        .select(col("id").as("doc_id"), col("component"))
      // isolated docs (no twin in either modality) are their own cluster
      withImg.select("doc_id").join(comp, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = dmap(

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  hex(encode(substr(text, 1, 4))) AS header_hex,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_multimodal_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    greatest(CAST(floor(length(text) / 4) AS INTEGER), 1) AS w FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(substr(text, 1 + i * w, w)) AS frame_md5
        |FROM f, generate_series(0, 3) AS t(i) ORDER BY doc_id, frame_idx""".stripMargin,


    // planted truth: container parameters are pure doc_id arithmetic
    // (mp4: mvhd timescale 1000 so duration units are ms; avi: 40000
    // us/frame so duration_ms = 40 * frames); junk rows parse to NULLs
    "q_video_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'mp4'
        |       WHEN doc_id % 3 = 1 THEN 'avi' END AS container,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 * (doc_id % 60 + 4) AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 320 + 16 AS INTEGER)
        |       END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 * (doc_id % 40 + 3) AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 240 + 12 AS INTEGER)
        |       END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 9000 + 1000
        |       WHEN doc_id % 3 = 1 THEN 40 * (doc_id % 500 + 50)
        |       END AS duration_ms,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id // 3) % 3 + 1 AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST((doc_id // 3) % 2 + 1 AS INTEGER)
        |       END AS n_tracks
        |FROM documents ORDER BY doc_id""".stripMargin,


    // frame-plan truth: closed-form duration per container class (the
    // q_video_meta derivation), midpoint-uniform integer timestamps
    "q_frame_timestamps" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 9000 + 1000
        |         WHEN doc_id % 3 = 1 THEN 40 * (doc_id % 500 + 50)
        |         END AS dur
        |  FROM documents),
        |f AS (SELECT doc_id, dur, CAST(i AS INTEGER) AS frame_idx
        |  FROM m CROSS JOIN range(0, 5) t(i)
        |  WHERE dur IS NOT NULL AND dur > 0)
        |SELECT doc_id, frame_idx,
        |  CAST(((2 * frame_idx + 1) * dur) // 10 AS BIGINT) AS ts_ms
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,


    // planted truth: every selected doc pairs with its +10M resized twin
    // at dHash Hamming 0 (cell-aligned pattern, spec-proven exact);
    // unrelated doc seeds sit ~24/64 bits apart, far outside <= 3
    "q_image_neardup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY id1, id2""".stripMargin,


    // planted truth: of the three Hamming-0 candidate pairs per doc,
    // only the true resized twin survives pixel verification (exact
    // grid distance 0; the +40 decoy sits at exactly 40)
    "q_image_verified_dedup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0.0 AS DOUBLE) AS mean_abs_diff
        |FROM documents WHERE doc_id % 13 = 0 ORDER BY id1, id2""".stripMargin,


    // planted truth: every selected doc pairs with its +10M resampled
    // twin at envelope Hamming 0 (segment-aligned amplitudes,
    // spec-proven exact); unrelated seeds sit ~32/64 bits apart
    "q_audio_neardup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id % 11 = 0 ORDER BY id1, id2""".stripMargin,


    // planted truth of the joint clusters: base docs are their own
    // component; +10M text twins attach when the drop-last-token twin
    // exists (shingle guard, same regime as q_planted_minhash); +20M
    // image twins always attach (resized pixels, dHash Hamming 0)
    "q_multimodal_dedup" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents
        |  WHERE doc_id % 9 = 0),
        |sh AS (SELECT doc_id, $shinglesSql AS s FROM tks)
        |SELECT doc_id, component FROM (
        |  SELECT doc_id, doc_id AS component FROM tks
        |  UNION ALL
        |  SELECT doc_id + 10000000, doc_id FROM sh
        |  WHERE doc_id % 2 = 0 AND len(s) >= 10
        |  UNION ALL
        |  SELECT doc_id + 20000000, doc_id FROM tks WHERE doc_id % 3 = 0)
        |ORDER BY doc_id""".stripMargin
  )
}
