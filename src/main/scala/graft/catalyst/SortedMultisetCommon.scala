package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `sorted_multiset_common(a, b)` — the row
  * count of the equi-join `a JOIN b ON a.v = b.v` between two MULTISETS
  * given as ascending-sorted `array<long>` columns, i.e.
  * Σ_v cnt_a(v) · cnt_b(v). One two-pointer merge, O(|a| + |b|) per row,
  * fully inside whole-stage codegen.
  *
  * This is the shared-shingle verification count of the prefix-filter
  * joins (d181/d225): the oracle scores a candidate pair by joining both
  * docs' full posting rows on the shingle hash, so if two distinct
  * shingle strings in one doc ever collide under poly_hash the count
  * carries the multiplicity product — this kernel reproduces that
  * arithmetic exactly (cnt_a · cnt_b per equal run, NOT min), keeping the
  * multiset-exact gate guarantee of the join formulation while replacing
  * a |cand| · n̄-row shuffle join + hash aggregate with a per-pair scalar
  * loop over broadcast-joined doc arrays.
  *
  * Inputs must be sorted ascending (`sort_array(collect_list(h))` — the
  * doc-array layout both callers build); unsorted input silently
  * under-counts, which is why the arrays are built and consumed inside
  * the same operators rather than accepted from user data. A null array
  * yields null; arrays from collect_list never carry null elements, and
  * the element type is declared non-null there, so no per-element null
  * handling is emitted.
  */
case class SortedMultisetCommon(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_multiset_common"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_multiset_common expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else {
        var ca = 0L; var cb = 0L
        while (i < na && x.getLong(i) == xi) { ca += 1; i += 1 }
        while (j < nb && y.getLong(j) == xi) { cb += 1; j += 1 }
        acc += ca * cb
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else {
         |    long $ca = 0L; long $cb = 0L;
         |    while ($i < $na && $a.getLong($i) == $xi) { $ca++; $i++; }
         |    while ($j < $nb && $b.getLong($j) == $xi) { $cb++; $j++; }
         |    $acc += $ca * $cb;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedMultisetCommon =
    copy(left = newLeft, right = newRight)
}
