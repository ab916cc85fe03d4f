package graft.tx

/** Delta protocol `add.path`/`remove.path` codec — ONE copy shared by
  * [[DeltaExport]] (encode) and [[DeltaImport]] (decode), so the two
  * protocol halves can never drift (round-12 self-review: each had grown
  * its own private decoder).
  *
  * The protocol stores table-root-relative paths PERCENT-ENCODED (the
  * RFC 2396/3986 fragment delta-rs and Spark's Delta both apply), so an
  * exported path must encode — a graft table partitioned on a string
  * value like `a=b` stores its files under the hive-escaped dir
  * `k=a%3Db/…`, and writing that byte sequence verbatim would make a
  * conforming reader DECODE it to `k=a=b/…` and fail to find the file.
  * Decoding accumulates %XX BYTES and decodes them as UTF-8: a
  * char-at-a-time decoder would mangle every multi-byte rune (delta-rs
  * encodes `city=Zürich` as `city=Z%C3%BCrich`; byte-wise that is one
  * 'ü', char-wise the mojibake 'Ã¼' — and a spurious refusal). */
private[tx] object DeltaPaths {

  /** Percent-encode every byte outside RFC 3986's unreserved set, keeping
    * '/' as the segment separator. */
  def encode(s: String): String = {
    val bytes = s.getBytes("UTF-8")
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if (b >= 0 && (c.isLetterOrDigit || c == '-' || c == '.' || c == '_' ||
          c == '~' || c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Decode %XX byte escapes (UTF-8), leaving '+' alone (URLDecoder's
    * form-data rule would corrupt literal plus signs in file names) and
    * passing malformed escapes through verbatim rather than throwing. */
  def decode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try { out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3 }
        catch { case _: NumberFormatException =>
          out.write(c.toString.getBytes("UTF-8")); i += 1 }
      } else {
        out.write(c.toString.getBytes("UTF-8")); i += 1
      }
    }
    new String(out.toByteArray, "UTF-8")
  }
}
