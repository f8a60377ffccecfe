package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Double-precision SUM/AVG results depend on accumulation order, which
  * differs between engines (and between runs under different partitionings).
  * To make aggregate results hash-comparable against an external SQL oracle
  * we quantize each row to an exact decimal BEFORE summing: decimal addition
  * is associative/commutative, so the sum is order-independent and identical
  * in any engine. Casting the final exact decimal back to double is a single
  * deterministic IEEE-754 rounding.
  *
  * Per-ROW double arithmetic (a*b, a/b, sqrt) is already deterministic across
  * engines (same IEEE ops on the same bits) and needs no special handling.
  */
object OracleSafe {
  private val D = DecimalType(38, 6)

  /** Order-independent sum of a (possibly computed) double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent average: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)
}
