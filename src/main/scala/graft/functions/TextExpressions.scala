package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for per-row text analysis.
  *
  * The HOF formulations (array_intersect over stopword literals, nested
  * transform/slice/array_min for winnowing) evaluate INTERPRETED — and
  * nested array lambdas re-evaluate their outer array per element, which
  * made winnowing O(n^2) md5 calls per document. These kernels are plain
  * tight-loop JVM code; [[LangId]] exposes the language-ID kernel as a
  * codegen'd Catalyst expression (a single static call inside the
  * whole-stage-codegen span, same preference order as
  * [[DotProduct]]/[[CosineSimilarity]]).
  *
  * Semantics are bit-identical to the SQL/DuckDB oracle formulations
  * (same tokenization, same tie-breaks, same md5 hex).
  */
object TextKernels {

  /** (lang, stopwords) sorted ascending by lang code — iteration order
    * matters for the argmax tie-break (larger code wins ties). */
  private val langs: Array[(String, Array[String])] = Array(
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "en" -> Array("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Array("el", "la", "los", "y", "es", "un", "una", "en", "por", "para"),
    "fr" -> Array("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"))

  private val ZH  = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1))

  /** Language ID: argmax of distinct-stopword hits (ties -> larger lang
    * code), 'und' on zero hits, 'zh' when CJK code points dominate.
    * Matches the langScores/greatest(struct) formulation exactly. */
  def langId(u: UTF8String): UTF8String = {
    val text = u.toString
    // CJK override: count code points in [U+4E00, U+9FFF] vs total
    var cjk = 0
    var cp = 0
    var i = 0
    while (i < text.length) {
      val c = text.codePointAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      cp += 1
      i += Character.charCount(c)
    }
    if (cjk * 2 > cp) return ZH
    val toks = new java.util.HashSet[String]()
    // Locale.ROOT: Spark's lower() is locale-independent; the default
    // locale (e.g. Turkish dotless i) would silently diverge from it
    val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var w = 0
    while (w < ws.length) { toks.add(ws(w)); w += 1 }
    var bestS = -1
    var bestI = -1
    var li = 0
    while (li < langs.length) {
      val sw = langs(li)._2
      var s = 0
      var j = 0
      while (j < sw.length) { if (toks.contains(sw(j))) s += 1; j += 1 }
      // strict >= : later (larger) lang code wins ties, like
      // greatest(struct(s, l)) / ORDER BY s DESC, lang DESC
      if (s >= bestS) { bestS = s; bestI = li }
      li += 1
    }
    if (bestS == 0) UND else langU8(bestI)
  }

  private val md5tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Lowercase md5 hex of a string's UTF-8 bytes — identical to Spark's
    * `md5()` / DuckDB's `md5()`. */
  def md5Hex(s: String): String = {
    val d = md5tl.get()
    d.reset()
    toHex(d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** md5 hex of `prefix ++ suffix` without concatenating (equal to
    * md5Hex(prefixString + suffixString) when the byte arrays are the
    * UTF-8 encodings) — lets callers encode shared parts once. */
  def md5Hex2(prefix: Array[Byte], suffix: Array[Byte]): String = {
    val d = md5tl.get()
    d.reset()
    d.update(prefix)
    toHex(d.digest(suffix))
  }

  /** md5 RAW digest of `prefix ++ suffix` written into `out` (16
    * bytes) — the allocation-free core of [[md5Hex2]] for min-tracking
    * loops: lowercase fixed-width hex preserves the digest's UNSIGNED
    * lexicographic byte order, so `Arrays.compareUnsigned` on raw
    * digests ranks exactly like `String.compareTo` on the hex — track
    * the min on bytes, hex-encode only the winner (round 16: the
    * minhash signature loop was allocating one 32-char string per
    * (seed, gram) hash — hundreds of millions at corpus scale). */
  def md5Into(prefix: Array[Byte], suffix: Array[Byte],
              out: Array[Byte]): Unit = {
    val d = md5tl.get()
    d.reset()
    d.update(prefix)
    d.update(suffix)
    d.digest(out, 0, 16)
    ()
  }

  /** Lowercase hex of a raw 16-byte digest (the [[md5Into]] twin). */
  def hexOf(bytes: Array[Byte]): String = toHex(bytes)

  /** First 8 bytes of the md5 digest as a big-endian long — equal to
    * `java.lang.Long.parseUnsignedLong(md5Hex(s).substring(0, 16), 16)`
    * without the hex round-trip (the simhash word-hash form). */
  def md5Long(s: String): Long = {
    val d = md5tl.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v
  }

  /** md5 hex of each character k-gram (positions 1..max(len-k+1, 1);
    * the final grams may be shorter, like substr). */
  def gramHashes(text: String, k: Int): Array[String] = {
    val len = text.length
    val n = math.max(len - (k - 1), 1)
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      out(i) = md5Hex(text.substring(i, math.min(i + k, len)))
      i += 1
    }
    out
  }

  /** Winnowing selection: distinct minimum hash per sliding window of
    * `w` consecutive gram hashes, first-occurrence order. */
  def winnow(text: String, k: Int, w: Int): Array[String] = {
    val gh = gramHashes(text, k)
    val n = math.max(gh.length - w, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= n) {
      var m = gh(i)
      var j = i + 1
      val end = math.min(i + w, gh.length)
      while (j < end) { if (gh(j).compareTo(m) < 0) m = gh(j); j += 1 }
      seen.add(m)
      i += 1
    }
    seen.toArray(Array.empty[String])
  }

  /** Minimum gram hash (the min-hash fingerprint member). */
  def minGramHash(text: String, k: Int): String = {
    val gh = gramHashes(text, k)
    var m = gh(0)
    var i = 1
    while (i < gh.length) { if (gh(i).compareTo(m) < 0) m = gh(i); i += 1 }
    m
  }
}

/** Codegen'd language-ID expression: a single static kernel call inside
  * the whole-stage-codegen span (the HOF version interpreted 4 array
  * intersections + a regex per row). */
case class LangId(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql] in Spark 4; rely on the inferred
  // covariant Seq[StringType] to satisfy ExpectsInputTypes
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.langId(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
