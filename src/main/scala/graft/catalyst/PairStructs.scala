package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native pair generator: `pair_structs(ids)` — the C(n, 2) ordered-pair
  * array `[struct(ids[i] AS id1, ids[j] AS id2) | i < j]` over an
  * `array<long>` column, exactly the value of the shared
  * `pairExplodeExpr` HOF chain (`flatten(transform(ids, (x, i) ->
  * transform(slice(ids, i + 2, …), y -> struct(x, y))))`) it replaces at
  * the eleven bucket-explosion sites (d30/d31/d141/d142/d185/d189/d135/
  * m194/q242 …).
  *
  * Why: higher-order functions are CodegenFallback with per-element
  * interpreted lambda dispatch, and the slice() inside the old chain
  * copies the array tail once per element — O(n²) GenericArrayData
  * allocations per bucket before the pairs even exist. This expression
  * builds the pair array in one compiled loop per bucket row. It is
  * itself CodegenFallback (one compiled eval call per ROW — the loop is
  * compiled Scala; what mattered was killing the per-ELEMENT interpreted
  * dispatch and the slice copies).
  *
  * Input arrays are bucket collect_lists: element type long, no null
  * elements (enforced by the type check staying permissive on
  * containsNull but eval reading primitives — collect_list never emits
  * null elements). Null array → null. */
case class PairStructs(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "pair_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_structs expects array<bigint>, got ${other.simpleString}")
  }

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData]
    val n = ids.numElements()
    val total = n * (n - 1) / 2
    val out = new Array[Any](total)
    var k = 0
    var i = 0
    while (i < n) {
      val x = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](x, ids.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PairStructs = copy(child = newChild)
}
