package graft.operators

/** Real image-container header parsing — dimensions from fixed byte
  * offsets and marker scans, no codec library required. Covers the
  * formats whose headers are trivially self-describing:
  *
  *   - PNG:  8-byte signature, IHDR width/height at offsets 16/20 (BE)
  *   - GIF:  "GIF87a"/"GIF89a", logical screen w/h at offsets 6/8 (LE)
  *   - BMP:  "BM", BITMAPINFOHEADER w/h at offsets 18/22 (LE, h signed)
  *   - JPEG: FF D8, scan segment markers to the first SOFn frame header
  *           (height/width big-endian at payload offsets 3/5)
  *
  * Used by [[Multimodal.decodeImageMeta]]: real payloads get real
  * dimensions; unrecognized bytes fall back to the documented stub.
  */
object ImageHeader {

  /** Returns (format, width, height) when the payload is a recognized
    * image container, None otherwise. Never throws on truncated input.
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    try {
      if (b.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        Some(("png", be32(16), be32(20)))
      } else if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        Some(("gif", le16(6), le16(8)))
      } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        // DIB header size at offset 14 selects the layout: 12 is the
        // OS/2 BITMAPCOREHEADER (16-bit w/h), >= 16 covers the
        // BITMAPINFOHEADER family (32-bit w/h, height signed: negative
        // means top-down rows, dimension is |h|)
        val dib = le32(14)
        if (dib == 12) Some(("bmp", le16(18), le16(20)))
        else if (dib >= 16) Some(("bmp", le32(18), math.abs(le32(22))))
        else None
      } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
        // walk JPEG segments: FF marker, 2-byte BE length incl. itself
        var i = 2
        while (i + 9 < b.length) {
          if (u8(i) != 0xFF) return None // desynced, not a valid stream
          // markers may be padded with extra 0xFF fill bytes
          while (i + 9 < b.length && u8(i + 1) == 0xFF) i += 1
          val marker = u8(i + 1)
          if (marker == 0x00) return None // stuffed byte: not in the header section
          if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
            i += 2 // standalone markers have no length field
          } else if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            // SOFn: [len][precision][height BE][width BE]
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          } else {
            val len = be16(i + 2)
            if (len < 2) return None // length includes itself; < 2 is corrupt
            i += 2 + len
          }
        }
        None
      } else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}

/** WAV (RIFF) header parsing — the audio twin of [[ImageHeader]]:
  * channels, sample rate, bit depth and duration from the canonical
  * fmt/data chunk layout, no codec library required.
  */
object AudioHeader {

  /** Returns (format, channels, sample_rate_hz, duration_ms) for a
    * RIFF/WAVE payload with a PCM fmt chunk, None otherwise.
    */
  def parse(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
    try {
      if (b.length < 12 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      // walk chunks: 4-byte id, 4-byte LE size
      var i = 12
      var rate = 0; var channels = 0; var byteRate = 0L
      var dataBytes = -1L
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(i + 4)
        if (id == "fmt " && i + 24 <= b.length) {
          channels = le16(i + 10)
          rate = le32(i + 12).toInt
          byteRate = le32(i + 16)
        } else if (id == "data") {
          dataBytes = size
        }
        // advance in Long space: a crafted size near 0xFFFFFFFF would
        // wrap/zero an Int step and wedge the loop forever
        val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
        if (next <= i || next > b.length.toLong) i = b.length
        else i = next.toInt
      }
      if (rate <= 0 || channels <= 0 || dataBytes < 0 || byteRate <= 0) None
      else Some(("wav", channels, rate, dataBytes * 1000L / byteRate))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}

/** JPEG EXIF metadata from the APP1 segment's embedded TIFF structure —
  * the third header-only parser in this file. Orientation (tag 0x0112)
  * is the one EXIF field a training pipeline CANNOT skip: cameras store
  * sensor-native pixels and record the rotation here, so an
  * orientation-blind pipeline trains on sideways images. Header-only
  * parsing is the 100 TB fast path — a few hundred bytes per file
  * against a full pixel decode.
  *
  * Both TIFF byte orders ("II" little-endian, "MM" big-endian) are
  * real in the wild and both are parsed; a missing/malformed APP1
  * yields None, never a throw.
  */
object ExifHeader {

  /** Returns the EXIF orientation (1..8) from a JPEG payload's APP1
    * TIFF IFD0, None when absent or malformed. Never throws.
    */
  def orientation(b: Array[Byte]): Option[Int] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    try {
      if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
      var i = 2
      while (i + 4 < b.length) {
        if (u8(i) != 0xFF) return None
        while (i + 4 < b.length && u8(i + 1) == 0xFF) i += 1
        val marker = u8(i + 1)
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) ||
          marker == 0x01) { i += 2 }
        else if (marker == 0xDA || marker == 0xD9) return None // scan/EOI: no APP1 seen
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          if (marker == 0xE1 && i + 4 + len - 2 <= b.length && len >= 16 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
            return tiffOrientation(b, i + 10, i + 2 + len)
          }
          i += 2 + len
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Walk the TIFF structure at [t, end): byte-order mark, magic 42,
    * IFD0 offset, then IFD0 entries looking for tag 0x0112 (SHORT).
    */
  private def tiffOrientation(b: Array[Byte], t: Int, end: Int): Option[Int] = {
    def u8(i: Int): Int = b(i) & 0xFF
    val le =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return None
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)) & 0xFFFFFFFFL
    if (t + 8 > end || u16(t + 2) != 42) return None
    val ifd = t + u32(t + 4).toInt
    if (ifd + 2 > end) return None
    val n = u16(ifd)
    var e = 0
    while (e < n && ifd + 2 + 12 * (e + 1) <= end) {
      val off = ifd + 2 + 12 * e
      if (u16(off) == 0x0112 && u16(off + 2) == 3 && u32(off + 4) == 1L) {
        val v = u16(off + 8) // SHORT count 1: value in the field's first 2 bytes
        return if (v >= 1 && v <= 8) Some(v) else None
      }
      e += 1
    }
    None
  }

  /** Hand-assembled minimal EXIF JPEG for specs and planted-truth
    * queries (the image sibling of `VideoHeader.syntheticMp4`):
    * SOI + APP1 (TIFF with a single orientation entry, in the chosen
    * byte order) + SOF0 carrying the dimensions + EOI. Not decodable —
    * there is no scan data — but every header-only parser above reads
    * it exactly like a camera file.
    */
  def syntheticExifJpeg(width: Int, height: Int, orientation: Int,
                        bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "orientation in 1..8")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w16(v: Int): Unit = if (bigEndian) wbe16(v) else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
      else { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    w8(0xFF); w8(0xD8) // SOI
    // APP1: len(2) + "Exif\0\0"(6) + TIFF header(8) + count(2) + entry(12) + next(4)
    w8(0xFF); w8(0xE1); wbe16(2 + 6 + 8 + 2 + 12 + 4)
    out.write("Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    w8(0); w8(0)
    val bom = if (bigEndian) 'M' else 'I'
    w8(bom); w8(bom); w16(42); w32(8L) // TIFF header, IFD0 at offset 8
    w16(1) // one IFD entry
    w16(0x0112); w16(3); w32(1L) // orientation, SHORT, count 1
    w16(orientation); w16(0) // value left-justified in the 4-byte field
    w32(0L) // no next IFD
    // SOF0: len 17 for 3 components
    w8(0xFF); w8(0xC0); wbe16(17); w8(8); wbe16(height); wbe16(width); w8(3)
    for (c <- 1 to 3) { w8(c); w8(0x11); w8(0) }
    w8(0xFF); w8(0xD9) // EOI
    out.toByteArray
  }
}
