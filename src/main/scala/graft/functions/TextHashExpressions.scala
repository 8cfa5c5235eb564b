package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local text-hashing expressions for the dedup suite — native
  * Catalyst expressions (option (b) of the custom-operator ladder)
  * replacing the md5-hex → substring → conv(16,10) string chains and
  * the explode-then-aggregate dataflows they fed.
  *
  * The key equivalence: `split(text, ' ')` + `concat_ws(' ', w_i,
  * w_i+1, w_i+2)` reconstructs the EXACT byte range of the original
  * text between the start of word i and the end of word i+2 (single
  * ASCII space is both the split and the join token, and a 0x20 byte
  * can never be part of a multi-byte UTF-8 sequence). So every shingle
  * digest here runs over a (offset, length) window of the text's UTF-8
  * bytes — one `getBytes` per ROW, zero per-shingle string allocation,
  * and the MD5 instance is thread-local. The per-shingle value is the
  * first `nibbles` hex digits of the digest as a LONG, bit-identical
  * to `conv(substring(md5(sh), 1, nibbles), 16, 10)`.
  *
  * An earlier all-row-local attempt via higher-order functions
  * (array_distinct(transform(...))) was measured SLOWER than
  * explode+groupBy — HOFs are CodegenFallback and re-evaluate the
  * interpreted lambda per consumer (BENCH_NOTES r8). These expressions
  * are single-pass compiled Java with a static-call codegen hook, so
  * the whole-stage span stays intact around them.
  */
object TextHash {

  private val md5TL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First `nibbles` hex digits of md5(bytes[off, off+len)) as a long. */
  def md5Prefix(bytes: Array[Byte], off: Int, len: Int, nibbles: Int): Long = {
    val md = md5TL.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Word-start offsets for single-space splitting (split(text, ' ')
    * with unlimited limit: leading/trailing/consecutive spaces yield
    * empty words, exactly like Spark's StringSplit). Returns the
    * boundary array [s0, s1, ..., sn] where word i spans
    * [starts(i), starts(i+1) - 1) and starts(n) = len + 1. */
  private def wordStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1
    starts
  }

  /** All 3-word-shingle md5-prefix hashes of the text; sorted+deduped
    * when `distinct`. Empty array when the text has < 3 words. */
  def shingleHashes(text: UTF8String, nibbles: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    val starts = wordStarts(bytes)
    val nWords = starts.length - 1
    val nSh = math.max(nWords - 2, 0)
    var vs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      val s = starts(i)
      val e = starts(i + 3) - 1 // end of word i+2
      vs(i) = md5Prefix(bytes, s, e - s, nibbles)
      i += 1
    }
    if (distinct && nSh > 1) {
      java.util.Arrays.sort(vs)
      var out = 1
      var j = 1
      while (j < nSh) {
        if (vs(j) != vs(j - 1)) { vs(out) = vs(j); out += 1 }
        j += 1
      }
      if (out != nSh) vs = java.util.Arrays.copyOf(vs, out)
    }
    new GenericArrayData(vs)
  }

  /** K min-hash signatures in one pass: min over shingles of
    * `(v * a(k) + b(k)) mod p` with v the 8-nibble md5 prefix.
    * Null when the text has < 3 words (no shingles — matches the
    * min-over-empty-group semantics of the aggregate spelling). */
  def minHashSigs(text: UTF8String, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val bytes = text.getBytes
    val starts = wordStarts(bytes)
    val nSh = starts.length - 3 // nWords - 2
    if (nSh <= 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val s = starts(i)
      val e = starts(i + 3) - 1
      val v = md5Prefix(bytes, s, e - s, 8)
      var j = 0
      while (j < k) {
        val h = (v * a(j) + b(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash fingerprint over the DISTINCT words of the text: each
    * word's first `nibbles` md5 digits vote ±1 per bit, the sign of
    * each bit-sum sets the output bit.
    *
    * `digitWise = true` reproduces the 16-bit oracle's bit layout
    * (bit (j-1)*4+k comes from bit k of hex DIGIT j — the first digit
    * holds bits 0-3); `false` uses the natural value layout of the
    * combined prefix (bit b of the long v), the 60-bit variant. */
  def simHashFp(text: UTF8String, nibbles: Int, digitWise: Boolean): Long = {
    val bytes = text.getBytes
    val starts = wordStarts(bytes)
    val nWords = starts.length - 1
    val seen = new java.util.HashSet[UTF8String]()
    val nBits = nibbles * 4
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < nWords) {
      val s = starts(i)
      val len = starts(i + 1) - 1 - s
      val w = UTF8String.fromBytes(bytes, s, len)
      if (seen.add(w)) {
        val v = md5Prefix(bytes, s, len, nibbles)
        var b = 0
        while (b < nBits) {
          // value bit position of output bit b
          val p = if (digitWise) (nibbles - 1 - b / 4) * 4 + b % 4 else b
          counts(b) += (if (((v >>> p) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < nBits) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

private[functions] trait TextHashInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects STRING, got ${other.simpleString}")
  }
}

/** Array of 3-shingle md5-prefix hashes (optionally deduped). */
case class ShingleHashes(child: Expression, nibbles: Int, distinct: Boolean)
    extends UnaryExpression with TextHashInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    TextHash.shingleHashes(v.asInstanceOf[UTF8String], nibbles, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextHash.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$helper.shingleHashes($v, $nibbles, $distinct)")
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** K banded min-hash signatures in one pass; null when < 3 words. */
case class MinHashSigs(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with TextHashInput {
  require(a.length == b.length, "minhash seed arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(v: Any): Any =
    TextHash.minHashSigs(v.asInstanceOf[UTF8String], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextHash.getClass.getName.stripSuffix("$")
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    val resultCode = (v: String) => s"$helper.minHashSigs($v, $aRef, $bRef, ${p}L)"
    // nullSafeCodeGen (not defineCodeGen): the result itself can be
    // null for shingle-less rows even when the input is non-null
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = ${resultCode(v)};
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

/** SimHash fingerprint over distinct words (see TextHash.simHashFp). */
case class SimHashFp(child: Expression, nibbles: Int, digitWise: Boolean)
    extends UnaryExpression with TextHashInput {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(v: Any): Any =
    TextHash.simHashFp(v.asInstanceOf[UTF8String], nibbles, digitWise)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextHash.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$helper.simHashFp($v, $nibbles, $digitWise)")
  }
  override protected def withNewChildInternal(c: Expression): SimHashFp = copy(child = c)
}

object TextHashColumns {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  def shingleHashes(c: Column, nibbles: Int, distinct: Boolean): Column =
    toColumn(ShingleHashes(toExpression(c), nibbles, distinct))
  def minHashSigs(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    toColumn(MinHashSigs(toExpression(c), a, b, p))
  def simHashFp(c: Column, nibbles: Int, digitWise: Boolean): Column =
    toColumn(SimHashFp(toExpression(c), nibbles, digitWise))
}
