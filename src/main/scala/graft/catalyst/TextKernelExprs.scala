package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd twins of the TEXT-STAT kernels (optimization r15).
  *
  * The text suite's hot projections were built from
  * `size(regexp_extract_all(lower(text), '[a-z]', 0))` (materializes one
  * UTF8String per matched CHAR just to count them) and
  * `size(filter(split(lower(text), ' '), t -> array_contains(...)))`
  * (higher-order functions are CodegenFallback — the lambda is interpreted
  * per token, and each HOF re-evaluates its own `split(lower(text))` child,
  * so one t35-shaped projection tokenized the same text 4×). Guide §1.2
  * step 2 (per-task work) and §4.1 (prefer built-ins/codegen): each kernel
  * here is ONE tight loop over the string's UTF-8 bytes or code points,
  * called from whole-stage codegen via the [[BandedLevenshtein]] static-
  * kernel pattern, with the interpreted eval backed by the SAME kernel so
  * the two paths cannot diverge.
  *
  * Every kernel is COUNT/HASH-exact vs the expression form it replaces
  * (integer results — no float reassociation anywhere); the equivalences
  * are pinned per kernel in TextKernelExprsSpec against the original
  * regexp/HOF formulations, and the DuckDB oracle SQL is untouched.
  */
object TextKernels {
  private val P = 1000000007L

  /** Count UTF-8 bytes in [lo, hi] (both ≤ 0x7F). Bytes of multi-byte
    * sequences are ≥ 0x80, so this equals the count of CODE POINTS in the
    * range — i.e. `size(regexp_extract_all(s, '[<lo>-<hi>]', 0))`. */
  def asciiCount(s: UTF8String, lo: Int, hi: Int): Int = {
    val nb = s.numBytes()
    var cnt = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b >= lo && b <= hi) cnt += 1
      i += 1
    }
    cnt
  }

  /** Count space-split segments byte-equal to any of `words` — i.e.
    * `size(filter(split(s, ' '), t -> array_contains(array(<words>), t)))`.
    * U+0020 never occurs inside a multi-byte UTF-8 sequence, so byte-level
    * splitting is exact; words must be non-empty ASCII (enforced at
    * construction), so empty segments never match. */
  def stopCount(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val nb = s.numBytes()
    var cnt = 0
    var st = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 32) {
        val len = i - st
        var w = 0
        var matched = false
        while (!matched && w < words.length) {
          val wb = words(w)
          if (wb.length == len) {
            var j = 0
            var eq = true
            while (eq && j < len) {
              if (s.getByte(st + j) != wb(j)) eq = false
              j += 1
            }
            if (eq) { matched = true; cnt += 1 }
          }
          w += 1
        }
        st = i + 1
      }
      i += 1
    }
    cnt
  }

  /** Count DISTINCT `words` that occur as a space-split segment of `s` —
    * i.e. `size(filter(array(<words>), w -> array_contains(split(s, ' '), w)))`
    * (the reversed t147 form). */
  def wordsPresent(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val found = new Array[Boolean](words.length)
    val nb = s.numBytes()
    var st = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 32) {
        val len = i - st
        var w = 0
        while (w < words.length) {
          if (!found(w)) {
            val wb = words(w)
            if (wb.length == len) {
              var j = 0
              var eq = true
              while (eq && j < len) {
                if (s.getByte(st + j) != wb(j)) eq = false
                j += 1
              }
              if (eq) found(w) = true
            }
          }
          w += 1
        }
        st = i + 1
      }
      i += 1
    }
    var cnt = 0
    var w = 0
    while (w < words.length) { if (found(w)) cnt += 1; w += 1 }
    cnt
  }

  /** Count NON-EMPTY space-split segments whose every byte is in [lo, hi]
    * — i.e. `size(filter(split(s, ' '), t -> t rlike '^[<lo>-<hi>]+$'))`. */
  def segAllInRange(s: UTF8String, lo: Int, hi: Int): Int = {
    val nb = s.numBytes()
    var cnt = 0
    var st = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 32) {
        if (i > st) {
          var j = st
          var ok = true
          while (ok && j < i) {
            val b = s.getByte(j)
            if (b < lo || b > hi) ok = false
            j += 1
          }
          if (ok) cnt += 1
        }
        st = i + 1
      }
      i += 1
    }
    cnt
  }

  /** Poly-hashes of every k-gram of `toks` joined by ' ' — i.e.
    * `transform(seqAsc(1, size(toks) - k + 1),
    *    i -> poly_hash(concat_ws(' ', slice(toks, i, k))))`.
    * Per token the fold-from-zero value f and 31^len mod P are computed
    * ONCE; gram g then composes in O(k) modular steps via
    * hash(concat(A, c)) = (hash(A)·31^len(c) + f(c)) mod P. Null tokens
    * are skipped exactly like concat_ws; an all-empty gram reproduces
    * poly_hash('') = (7·31) mod P. */
  def gramHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val f = new Array[Long](n)
    val pw = new Array[Long](n)
    val nul = new Array[Boolean](n)
    val ln = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) nul(i) = true
      else {
        val t = toks.getUTF8String(i).toString
        var acc = 0L
        var pow = 1L
        var cps = 0
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          acc = (acc * 31L + cp) % P
          pow = (pow * 31L) % P
          cps += 1
          j += Character.charCount(cp)
        }
        f(i) = acc; pw(i) = pow; ln(i) = cps
      }
      i += 1
    }
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var acc = 7L
      var totalLen = 0
      var first = true
      var j = g
      while (j < g + k) {
        if (!nul(j)) {
          if (!first) { acc = (acc * 31L + 32L) % P; totalLen += 1 }
          acc = (acc * pw(j) + f(j)) % P
          totalLen += ln(j)
          first = false
        }
        j += 1
      }
      out(g) = if (totalLen == 0) (7L * 31L) % P else acc
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-chunk poly-hashes of the content-defined chunking of `s` — the
    * fused form of Pretrain2.chunkRows' boundary + cut + hash pipeline:
    * boundaries are 1-based code-point positions p in [win, len(s)) where
    * poly_hash(substring(s, p-win+1, win)) % mod == 0; each chunk is the
    * span between cuts (cut INCLUSIVE on the left chunk) and is hashed
    * with poly_hash (seed 7, empty-string edge (7·31) mod P). ONE pass
    * over the code points computes window hashes, chunk folds and cuts
    * simultaneously — the HOF form re-hashed a win-char substring
    * allocation per position and then re-scanned every chunk. */
  def cdcChunkHashes(u: UTF8String, win: Int, mod: Int): ArrayData = {
    val s = u.toString
    val w = new Array[Int](win)
    var out = new Array[Long](8)
    var nOut = 0
    def emit(v: Long): Unit = {
      if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
      out(nOut) = v
      nOut += 1
    }
    var cur = 7L
    var curLen = 0
    var pos = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      w((pos - 1) % win) = cp
      cur = (cur * 31L + cp) % P
      curLen += 1
      // boundary candidate at pos: window full AND pos < len (more chars
      // remain) — the b < len filter of the HOF form
      if (pos >= win && i < s.length) {
        var h = 7L
        var j = pos - win
        while (j < pos) { h = (h * 31L + w(j % win)) % P; j += 1 }
        if (h % mod == 0) {
          emit(cur)
          cur = 7L
          curLen = 0
        }
      }
    }
    emit(if (curLen == 0) (7L * 31L) % P else cur)
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }
}

/** ascii_count(s, lo, hi): code points with lo ≤ cp ≤ hi (ASCII range). */
case class AsciiRangeCount(child: Expression, lo: Int, hi: Int)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ascii_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && lo >= 1 && hi <= 127 && lo <= hi)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_count expects (string, lo, hi literals in [1,127]), got " +
        s"(${child.dataType.simpleString}, $lo, $hi)")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.asciiCount(input.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.asciiCount($a, $lo, $hi);")

  override protected def withNewChildInternal(newChild: Expression): AsciiRangeCount =
    copy(child = newChild)
}

/** Shared shape of the word-set segment kernels (byte-array word set
  * pinned at plan time from a foldable array literal). */
sealed abstract class WordSetKernel extends UnaryExpression {
  def words: Seq[String]
  override def dataType: DataType = IntegerType

  // @transient lazy: Java deserialization re-runs this superclass's field
  // initializers BEFORE the case-class fields are restored (words would be
  // null — measured InvalidClassException); lazy defers to first use, and
  // codegen captures the array via addReferenceObj at plan time anyway.
  @transient protected lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got ${child.dataType.simpleString}")
    else if (words.isEmpty || words.exists(w =>
        w.isEmpty || w.exists(c => c > 127 || c == ' ')))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects non-empty ASCII words without spaces")
    else TypeCheckResult.TypeCheckSuccess
}

/** stop_count(s, array(words…)): space-split segments of s that equal any
  * word — the native `size(filter(split(s,' '), t -> array_contains(…)))`. */
case class StopSegmentCount(child: Expression, words: Seq[String])
  extends WordSetKernel {
  override def prettyName: String = "stop_count"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.stopCount(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ws = ctx.addReferenceObj("stopWords", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.stopCount($a, $ws);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopSegmentCount =
    copy(child = newChild)
}

/** words_present(s, array(words…)): how many DISTINCT words occur as a
  * space-split segment of s — the native
  * `size(filter(array(words…), w -> array_contains(split(s,' '), w)))`. */
case class WordsPresentCount(child: Expression, words: Seq[String])
  extends WordSetKernel {
  override def prettyName: String = "words_present"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordsPresent(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ws = ctx.addReferenceObj("presentWords", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.wordsPresent($a, $ws);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordsPresentCount =
    copy(child = newChild)
}

/** seg_in_range(s, lo, hi): non-empty space-split segments whose every
  * code point is in [lo, hi] — the native
  * `size(filter(split(s,' '), t -> t rlike '^[<lo>-<hi>]+$'))`. */
case class SegmentsAllInRange(child: Expression, lo: Int, hi: Int)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "seg_in_range"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && lo >= 1 && hi <= 127 && lo <= hi)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"seg_in_range expects (string, lo, hi literals in [1,127]), got " +
        s"(${child.dataType.simpleString}, $lo, $hi)")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.segAllInRange(input.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.segAllInRange($a, $lo, $hi);")

  override protected def withNewChildInternal(newChild: Expression): SegmentsAllInRange =
    copy(child = newChild)
}

/** gram_hashes(toks, k): poly_hash of every ' '-joined k-gram of toks. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects (array<string>, positive int literal), got " +
        s"(${other.simpleString}, $k)")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gramHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.gramHashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** cdc_chunk_hashes(s, win, mod): per-chunk poly_hashes of the content-
  * defined chunking of s (boundary: win-char window hash ≡ 0 mod mod). */
case class CdcChunkHashes(child: Expression, win: Int, mod: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && win >= 1 && mod >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_hashes expects (string, positive win, positive mod), got " +
        s"(${child.dataType.simpleString}, $win, $mod)")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.cdcChunkHashes(input.asInstanceOf[UTF8String], win, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.catalyst.TextKernels.cdcChunkHashes($a, $win, $mod);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}
