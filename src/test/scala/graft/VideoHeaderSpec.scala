package graft

import graft.operators.{Multimodal, VideoHeader}

class VideoHeaderSpec extends SparkSpecBase {

  test("mp4 round-trip: synthetic box tree parses back exactly") {
    val bytes = VideoHeader.syntheticMp4(640, 360, 12345L, nTracks = 1)
    assert(VideoHeader.parse(bytes).contains(("mp4", 640, 360, 12345L, 1)))
  }

  test("mp4 multi-track: dimensions are max over tracks (audio is 0x0)") {
    val bytes = VideoHeader.syntheticMp4(1920, 1080, 5000L, nTracks = 3)
    assert(VideoHeader.parse(bytes).contains(("mp4", 1920, 1080, 5000L, 3)))
  }

  test("mp4 version-1 mvhd/tkhd offsets parse (64-bit duration fields)") {
    // hand-assemble a v1 variant: mvhd v1 (timescale@+20 u32,
    // duration@+24 u64), tkhd v1 (width@+88)
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 120 + 112)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    bb.putInt(8 + 8 + 120 + 112 - 0); cc("moov")
    bb.putInt(120); cc("mvhd")
    bb.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putLong(0L).putLong(0L) // creation, modification (u64)
    bb.putInt(1000) // timescale
    bb.putLong(7500L) // duration (u64)
    bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
    bb.putInt(0).putInt(0)
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    bb.putInt(112); cc("trak")
    bb.putInt(104); cc("tkhd")
    bb.put(1.toByte).put(0.toByte).put(0.toByte).put(7.toByte)
    bb.putLong(0L).putLong(0L) // creation, modification (u64)
    bb.putInt(1).putInt(0) // track id, reserved
    bb.putLong(7500L) // duration (u64)
    bb.putInt(0).putInt(0)
    bb.putShort(0).putShort(0).putShort(0).putShort(0)
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.putInt(854 << 16).putInt(480 << 16)
    assert(VideoHeader.parse(bb.array()).contains(("mp4", 854, 480, 7500L, 1)))
  }

  test("avi round-trip: RIFF hdrl/avih parses back exactly") {
    val bytes = VideoHeader.syntheticAvi(320, 240, 40000L, 250L, streams = 2)
    // 40000 us/frame * 250 frames = 10 s
    assert(VideoHeader.parse(bytes).contains(("avi", 320, 240, 10000L, 2)))
  }

  test("malformed bytes parse to None, never a throw") {
    assert(VideoHeader.parse(null).isEmpty)
    assert(VideoHeader.parse(Array.emptyByteArray).isEmpty)
    assert(VideoHeader.parse("not a container at all".getBytes).isEmpty)
    // truncated mp4: valid ftyp then a moov whose size runs past the end
    val good = VideoHeader.syntheticMp4(64, 48, 100L)
    assert(VideoHeader.parse(good.take(40)).isEmpty)
    // size-0 / size-1 boxes and a box shorter than its header must not loop
    val weird = java.nio.ByteBuffer.allocate(32)
    weird.putInt(16).put("ftyp".getBytes).putInt(0).putInt(0)
    weird.putInt(4).put("moov".getBytes) // size 4 < header 8
    assert(VideoHeader.parse(weird.array()).isEmpty)
  }

  test("decodeVideoMeta: mixed corpus yields typed rows, junk yields NULLs") {
    import spark.implicits._
    val mp4 = VideoHeader.syntheticMp4(640, 360, 2000L, 2)
    val avi = VideoHeader.syntheticAvi(160, 120, 40000L, 75L, 1)
    val junk = "plain text payload".getBytes("UTF-8")
    val df = Seq((1L, mp4), (2L, avi), (3L, junk), (4L, null))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoMeta(df).orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getString(1) == "mp4" && out(0).getInt(2) == 640 &&
      out(0).getInt(3) == 360 && out(0).getLong(4) == 2000L &&
      out(0).getInt(5) == 2)
    assert(out(1).getString(1) == "avi" && out(1).getInt(2) == 160 &&
      out(1).getLong(4) == 3000L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(4))
    assert(out(3).isNullAt(1))
  }

  test("video metadata survives a parquet round-trip as binary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vh_rt").toString
    Seq((1L, VideoHeader.syntheticMp4(320, 240, 999L)))
      .toDF("doc_id", "payload").write.mode("overwrite").parquet(dir)
    val back = Multimodal.decodeVideoMeta(spark.read.parquet(dir)).head()
    assert(back.getString(1) == "mp4" && back.getInt(2) == 320 &&
      back.getLong(4) == 999L)
  }
}

/** EXIF orientation round-trips through the synthetic JPEG in both TIFF
  * byte orders; non-JPEG and EXIF-less payloads yield NULL orientation.
  */
class ExifHeaderSpec extends SparkSpecBase {
  import graft.operators.{ExifHeader, ImageHeader}

  test("syntheticExifJpeg parses back: dims via SOF0, orientation via APP1, both byte orders") {
    for (be <- Seq(false, true); o <- 1 to 8) {
      val b = ExifHeader.syntheticExifJpeg(640, 480, o, bigEndian = be)
      assert(ImageHeader.parse(b).contains(("jpeg", 640, 480)), s"be=$be o=$o")
      assert(ExifHeader.orientation(b).contains(o), s"be=$be o=$o")
    }
  }

  test("orientation is None for non-JPEG, truncated, and EXIF-less payloads") {
    assert(ExifHeader.orientation("not an image".getBytes).isEmpty)
    assert(ExifHeader.orientation(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    val full = ExifHeader.syntheticExifJpeg(64, 64, 6, bigEndian = false)
    assert(ExifHeader.orientation(full.take(10)).isEmpty) // truncated mid-APP1
    // a real PNG has no EXIF: dims parse, orientation does not
    val png = graft.operators.Multimodal.syntheticImage(7L)
    assert(ImageHeader.parse(png).exists(_._1 == "png"))
    assert(ExifHeader.orientation(png).isEmpty)
  }

  test("imageExif DataFrame op: jpeg rows carry orientation, png rows NULL, junk all-NULL") {
    import spark.implicits._
    val rows = Seq(
      (1L, ExifHeader.syntheticExifJpeg(320, 240, 6, bigEndian = true)),
      (2L, graft.operators.Multimodal.syntheticImage(2L)),
      (3L, "junk bytes".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageExif(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "jpeg" && out(1L).getInt(2) == 320 &&
      out(1L).getInt(3) == 240 && out(1L).getInt(4) == 6)
    assert(out(2L).getString(1) == "png" && out(2L).isNullAt(4))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2) && out(3L).isNullAt(4))
  }

  test("frameTimestamps: midpoint-uniform integer seeks inside [0, dur); non-videos drop") {
    import spark.implicits._
    val meta = Seq((1L, Some(1000L)), (2L, Some(7L)), (3L, None),
      (4L, Some(0L))).toDF("doc_id", "duration_ms")
    val out = Multimodal.frameTimestamps(meta, 5)
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    // dur=1000, n=5 -> exact midpoints 100, 300, 500, 700, 900
    assert(out.filter(_._1 == 1L).map(_._3) == Seq(100L, 300L, 500L, 700L, 900L))
    // dur shorter than n: integer div keeps every seek in range and
    // non-decreasing: (2i+1)*7 div 10 = 0, 2, 3, 4, 6
    assert(out.filter(_._1 == 2L).map(_._3) == Seq(0L, 2L, 3L, 4L, 6L))
    // NULL and zero durations emit nothing
    assert(!out.exists(t => t._1 == 3L || t._1 == 4L))
    // every seek strictly below its duration
    assert(out.filter(_._1 == 1L).forall(_._3 < 1000L))
  }
}
