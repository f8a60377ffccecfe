package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd twins of the [[graft.functions.PortableHash]] sketch
  * kernels. The higher-order-function formulations (`aggregate(transform(...))`)
  * are interpreted per element per row — measured as the dominant cost of the
  * dedup/fingerprint suite at sf0.1. Each expression here emits the same
  * sequential fold as a tight Java loop inside whole-stage codegen, so results
  * are bit-identical to the HOF form AND to the DuckDB oracle (pure 64-bit
  * integer arithmetic / index-ordered double sums — no reassociation).
  *
  * The interpreted forms remain in [[graft.functions.PortableHash]] as the
  * cross-engine specification; `CatalystKernelsSpec` asserts native == HOF.
  */

/** poly_hash(s[, seed]): h = fold over code points, (h*31 + cp) mod 1e9+7.
  *
  * Empty-string edge: Spark's `split('', '')` returns `[""]`, so the HOF
  * spec folds a single `ascii('') = 0` step — (seed*31) mod P, not seed.
  * Replicated here so swapping HOF → native is an identity on EVERY input,
  * not just the non-empty strings the harness data produces. */
case class PolyHash(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) (seed * 31L) % 1000000007L
    else {
      var acc = seed
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $a.toString();
         |long $acc = ${seed}L;
         |if ($s.isEmpty()) {
         |  $acc = ($acc * 31L) % 1000000007L;
         |} else {
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $acc = ($acc * 31L + $cp) % 1000000007L;
         |    $i += Character.charCount($cp);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** simhash30(hashes): bit j of the signature is set iff the count of hashes
  * with bit j set exceeds the count without — Σ(±1) > 0, order-independent. */
case class SimHash30(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash30"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash30 expects array<bigint>, got ${other.simpleString}")
  }

  // NULL elements → NULL result in BOTH eval paths. Without the explicit
  // check the interpreted path NPEs on GenericArrayData while codegen over
  // UnsafeArrayData silently reads the null slot as 0 — the two paths this
  // design promises are bit-identical would diverge. Null propagation also
  // matches the HOF fold these kernels replace (null poisons aggregate()).
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var k = 0
    while (k < n) { if (hs.isNullAt(k)) return null; k += 1 }
    var sig = 0L
    var j = 0
    while (j < 30) {
      var s = 0
      k = 0
      while (k < n) {
        s += (if (((hs.getLong(k) >> j) & 1L) == 1L) 1 else -1)
        k += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < 30; $j++) {
         |    int $s = 0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $s += ((($a.getLong($k) >> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |    if ($s > 0) $sig |= (1L << $j);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
}

/** minhash16(hashes): mins[i] = min over hashes of ((2i+1)·h + i·12345 + 678)
  * mod 1e9+7 — the 16 permutation-min sketch, min is order-independent. */
case class MinHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash16 expects array<bigint>, got ${other.simpleString}")
  }

  // see SimHash30's null-element note — same contract
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var k = 0
    while (k < n) { if (hs.isNullAt(k)) return null; k += 1 }
    val mins = Array.fill(16)(Long.MaxValue)
    k = 0
    while (k < n) {
      val h = hs.getLong(k)
      var i = 0
      while (i < 16) {
        val v = ((2L * i + 1L) * h + i * 12345L + 678L) % 1000000007L
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[16];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $h = $a.getLong($k);
         |    for (int $i = 0; $i < 16; $i++) {
         |      long $v = ((2L * $i + 1L) * $h + $i * 12345L + 678L) % 1000000007L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

/** lsh_bucket8(v): 8-bit random-hyperplane signature. Plane weights are the
  * deterministic LCG w(p,k) = ((1103515245·(p·64+k) + 12345) mod 2^31) mod
  * 2001 − 1000; each plane's dot product accumulates in index order, so the
  * double sum is bit-identical to the sequential HOF fold and the oracle. */
case class LshBucket8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket8 expects array<double>, got ${other.simpleString}")
  }

  // see SimHash30's null-element note — same contract
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), 64)
    var k = 0
    while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    var bucket = 0
    var p = 0
    while (p < 8) {
      var acc = 0.0
      k = 0
      while (k < n) {
        val w = ((1103515245L * (p * 64 + k) + 12345L) % 2147483648L % 2001L - 1000L).toDouble
        acc += v.getDouble(k) * w
        k += 1
      }
      if (acc >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val w = ctx.freshName("w")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |boolean $bad = false;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < 8; $p++) {
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      double $w = (double)((1103515245L * ($p * 64 + $k) + 12345L)
         |        % 2147483648L % 2001L - 1000L);
         |      $acc += $a.getDouble($k) * $w;
         |    }
         |    if ($acc >= 0) $bucket |= (1 << $p);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket8 =
    copy(child = newChild)
}
