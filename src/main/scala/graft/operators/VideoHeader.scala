package graft.operators

import scala.util.control.NonFatal

/** Video CONTAINER metadata parsing — pure-JVM byte walking, the same
  * class of work as the shipped WAV RIFF chunk walk
  * ([[Multimodal.parsePcm16]]): no codec library is needed to read the
  * dimensions, duration and track count a curation pipeline filters on
  * (drop sub-360p clips, cap duration, require a video track). Frame
  * PIXEL decode remains genuinely environmental (no JVM-bundled video
  * codec) and stays on the deterministic-fake path
  * ([[Multimodal.frameSamples]]).
  *
  * Two containers, both walked defensively (any malformed structure →
  * `None`, never a task failure):
  *
  *   - MP4 / ISO-BMFF (ISO 14496-12): big-endian `[size][type]` box
  *     tree. `moov/mvhd` carries timescale + duration (version 0: u32s;
  *     version 1: u64 duration), `moov/trak/tkhd` carries per-track
  *     16.16 fixed-point width/height (non-zero only on video tracks).
  *     `size == 1` → 64-bit largesize follows; `size == 0` → box runs
  *     to end of enclosing scope.
  *   - AVI (RIFF): little-endian `[fourcc][size]` chunks;
  *     `LIST hdrl/avih` carries dwMicroSecPerFrame, dwTotalFrames,
  *     dwStreams, dwWidth, dwHeight at fixed payload offsets.
  *
  * Reference behavior target: lotad treats media columns as opaque
  * blobs; this extends the multimodal family the same way the image
  * and audio header parsers do.
  */
object VideoHeader {

  /** Parsed container metadata: (container, width, height, durationMs,
    * nTracks). Width/height are the max over tracks for MP4 (audio
    * tracks report 0×0).
    */
  def parse(bytes: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      if (fourcc(bytes, 4) == "ftyp" || fourcc(bytes, 4) == "moov")
        parseMp4(bytes)
      else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")
        parseAvi(bytes)
      else None
    } catch { case NonFatal(_) => None }
  }

  // ---- MP4 / ISO-BMFF -------------------------------------------------

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Visit each box in [start, end): callback gets (type, payloadStart,
    * payloadEnd). Malformed sizes (overflow, runs past scope, shorter
    * than its own header) abort the walk rather than loop.
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      visit: (String, Int, Int) => Unit): Unit = {
    var i = start
    while (i + 8 <= end) {
      val size32 = be32(b, i)
      val tpe = fourcc(b, i + 4)
      var hdr = 8L
      val size: Long =
        if (size32 == 1L) { hdr = 16L; if (i + 16 <= end) be64(b, i + 8) else return }
        else if (size32 == 0L) (end - i).toLong
        else size32
      if (size < hdr || i + size > end) return
      visit(tpe, i + hdr.toInt, i + size.toInt)
      i += size.toInt
    }
  }

  private def parseMp4(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var tracks = 0
    var sawMoov = false
    walkBoxes(b, 0, b.length) { (tpe, ps, pe) =>
      if (tpe == "moov") {
        sawMoov = true
        walkBoxes(b, ps, pe) { (ct, cs, ce) =>
          if (ct == "mvhd" && ce - cs >= 20) {
            val v = b(cs) & 0xFF
            if (v == 1 && ce - cs >= 32) {
              timescale = be32(b, cs + 20); duration = be64(b, cs + 24)
            } else {
              timescale = be32(b, cs + 12); duration = be32(b, cs + 16)
            }
          } else if (ct == "trak") {
            tracks += 1
            walkBoxes(b, cs, ce) { (tt, ts, te) =>
              if (tt == "tkhd" && te - ts >= 84) {
                val v = b(ts) & 0xFF
                // 16.16 fixed-point width/height; v1 adds 12 bytes of
                // 64-bit creation/modification/duration widening
                val off = if (v == 1) ts + 88 else ts + 76
                if (off + 8 <= te) {
                  val tw = (be32(b, off) >> 16).toInt
                  val th = (be32(b, off + 4) >> 16).toInt
                  if (tw > w) w = tw
                  if (th > h) h = th
                }
              }
            }
          }
        }
      }
    }
    if (!sawMoov) None
    else {
      val ms = if (timescale > 0) duration * 1000L / timescale else 0L
      Some(("mp4", w, h, ms, tracks))
    }
  }

  // ---- AVI / RIFF -----------------------------------------------------

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def parseAvi(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
    // walk top-level RIFF chunks for LIST hdrl, then its avih chunk
    var res: Option[(String, Int, Int, Long, Int)] = None
    var i = 12
    while (res.isEmpty && i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      val payload = i + 8
      if (id == "LIST" && payload + 4 <= b.length &&
        fourcc(b, payload) == "hdrl") {
        var j = payload + 4
        val listEnd = math.min(payload + size, b.length.toLong).toInt
        while (res.isEmpty && j + 8 <= listEnd) {
          val cid = fourcc(b, j)
          val csize = le32(b, j + 4)
          val cp = j + 8
          if (cid == "avih" && csize >= 40 && cp + 40 <= b.length) {
            val microsPerFrame = le32(b, cp)
            val totalFrames = le32(b, cp + 16)
            val streams = le32(b, cp + 24).toInt
            val w = le32(b, cp + 32).toInt
            val hh = le32(b, cp + 36).toInt
            val ms = microsPerFrame * totalFrames / 1000L
            res = Some(("avi", w, hh, ms, streams))
          }
          val step = 8L + csize + (csize & 1L)
          if (step <= 0 || j + step > listEnd) j = listEnd else j += step.toInt
        }
      }
      val step = 8L + size + (size & 1L)
      if (step <= 0 || i + step > b.length) i = b.length else i += step.toInt
    }
    res
  }

  // ---- synthetic containers for planted-truth harnesses ---------------

  /** Hand-assembled minimal MP4: ftyp + moov(mvhd v0 + nTracks ×
    * trak(tkhd v0)) + empty mdat. Track 1 carries the video dimensions
    * (16.16 fixed); extra tracks are 0×0 (audio-shaped) so the
    * max-over-tracks rule is exercised whenever nTracks > 1.
    * Deterministic bytes — the planted-truth analogue of
    * [[Multimodal.syntheticWav]].
    */
  def syntheticMp4(width: Int, height: Int, durationMs: Long,
                   nTracks: Int = 1): Array[Byte] = {
    require(nTracks >= 1, "nTracks must be >= 1")
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108 + nTracks * 100 + 8)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    // ftyp
    bb.putInt(16); cc("ftyp"); cc("isom"); bb.putInt(0x200)
    // moov
    bb.putInt(8 + 108 + nTracks * 100); cc("moov")
    // mvhd v0: timescale 1000 so duration units ARE milliseconds
    bb.putInt(108); cc("mvhd")
    bb.putInt(0) // version + flags
    bb.putInt(0).putInt(0) // creation, modification
    bb.putInt(1000) // timescale
    bb.putInt(durationMs.toInt) // duration
    bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
    bb.putInt(0).putInt(0) // reserved
    unityMatrix(bb)
    var k = 0; while (k < 6) { bb.putInt(0); k += 1 } // pre_defined
    bb.putInt(nTracks + 1) // next_track_ID
    // traks
    var t = 0
    while (t < nTracks) {
      bb.putInt(100); cc("trak")
      bb.putInt(92); cc("tkhd")
      bb.putInt(0x000007) // v0, flags: enabled|in-movie|in-preview
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(t + 1) // track_ID
      bb.putInt(0) // reserved
      bb.putInt(durationMs.toInt) // duration
      bb.putInt(0).putInt(0) // reserved
      bb.putShort(0).putShort(0) // layer, alternate_group
      bb.putShort(if (t == 0) 0 else 0x0100.toShort).putShort(0) // volume, reserved
      unityMatrix(bb)
      bb.putInt(if (t == 0) width << 16 else 0)  // 16.16 fixed
      bb.putInt(if (t == 0) height << 16 else 0)
      t += 1
    }
    // empty mdat
    bb.putInt(8); cc("mdat")
    bb.array()
  }

  private def unityMatrix(bb: java.nio.ByteBuffer): Unit = {
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
  }

  /** Hand-assembled minimal AVI: RIFF('AVI ' LIST('hdrl' avih)).
    * `microsPerFrame` × `totalFrames` / 1000 is the parsed duration.
    */
  def syntheticAvi(width: Int, height: Int, microsPerFrame: Long,
                   totalFrames: Long, streams: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(4 + 12 + 8 + 56); cc("AVI ")
    cc("LIST"); bb.putInt(4 + 8 + 56); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(microsPerFrame.toInt) // dwMicroSecPerFrame
    bb.putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, flags
    bb.putInt(totalFrames.toInt) // dwTotalFrames
    bb.putInt(0) // dwInitialFrames
    bb.putInt(streams) // dwStreams
    bb.putInt(0) // dwSuggestedBufferSize
    bb.putInt(width).putInt(height)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
    bb.array()
  }
}
