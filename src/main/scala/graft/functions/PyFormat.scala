package graft.functions

/** Python-compatible scalar renderings.
  *
  * The reference engine collapses every scalar to Python `str(value)`
  * before hashing (reference: lotad/utils.py:76-77), which makes row
  * comparison deliberately type-insensitive (`1` == `"1"`). To keep hash
  * semantics equivalent we reproduce Python's renderings for the types
  * that can appear after a JSON parse: bool -> True/False, None -> None,
  * int -> decimal, float -> repr (shortest round-trip with Python's
  * fixed/scientific threshold rules).
  */
object PyFormat {

  /** Python `str(float)` for a double: shortest round-trip decimal,
    * fixed notation when the decimal exponent is in [-4, 16), otherwise
    * scientific `d.dddde[+-]XX` with >=2 exponent digits and no trailing
    * `.0` in the mantissa.
    */
  def pyDouble(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val abs = math.abs(d)
    // JDK Double.toString is either "ddd.ddd" or "d.dddEnn"; extract the
    // significant digits and the exponent of the leading digit.
    val s = java.lang.Double.toString(abs)
    val (digits0, firstDigitExp) = {
      val eIdx = s.indexOf('E')
      if (eIdx >= 0) {
        val mant = s.substring(0, eIdx)
        val exp = s.substring(eIdx + 1).toInt
        val dig = mant.replace(".", "")
        (dig, exp)
      } else {
        val dot = s.indexOf('.')
        val intPart = s.substring(0, dot)
        val frac = s.substring(dot + 1)
        if (intPart != "0") {
          (intPart + frac, intPart.length - 1)
        } else {
          // 0.000ddd -> exponent of first significant digit
          val firstSig = frac.indexWhere(_ != '0')
          (frac.substring(firstSig), -(firstSig + 1))
        }
      }
    }
    val digits = {
      val t = digits0.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (firstDigitExp >= 16 || firstDigitExp < -4) {
      // scientific
      sb.append(digits.charAt(0))
      if (digits.length > 1) { sb.append('.'); sb.append(digits.substring(1)) }
      sb.append('e')
      if (firstDigitExp >= 0) sb.append('+') else sb.append('-')
      val ae = math.abs(firstDigitExp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (firstDigitExp >= 0) {
      if (digits.length > firstDigitExp + 1) {
        sb.append(digits.substring(0, firstDigitExp + 1))
        sb.append('.')
        sb.append(digits.substring(firstDigitExp + 1))
      } else {
        sb.append(digits)
        var i = digits.length
        while (i <= firstDigitExp) { sb.append('0'); i += 1 }
        sb.append(".0")
      }
    } else {
      sb.append("0.")
      var i = -1
      while (i > firstDigitExp) { sb.append('0'); i -= 1 }
      sb.append(digits)
    }
    sb.toString
  }

  /** Python `urllib.parse.unquote`: decode %XX escapes as UTF-8 with
    * replacement; unlike java.net.URLDecoder, `+` is NOT a space.
    * (reference: lotad/utils.py:9-16 decodes "%7B…"-prefixed JSON.)
    */
  def urlUnquote(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val bs = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Code-point order string comparison (Python `sorted` semantics);
    * differs from String.compareTo only around surrogate pairs.
    */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  val cpOrdering: Ordering[String] = (a, b) => cpCompare(a, b)
}
