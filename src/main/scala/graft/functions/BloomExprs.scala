package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

import org.apache.spark.sql.graftbridge.GraftSql

/** Codegen'd Bloom-filter membership probe over a long key column.
  *
  * This is the 100 TB shuffle-reduction primitive: build a Bloom filter over
  * a selective build side's keys, then drop probe rows BEFORE the join
  * shuffle. A Scala UDF would leave the probe-side scan interpreting a
  * boxed function per row; this expression inlines
  * `bloom.mightContainLong(key)` into whole-stage codegen (the filter stays
  * inside the scan's codegen span, so pruning/pushdown around it survive).
  *
  * The filter object rides the plan as a codegen reference (serialized once
  * per task binary, not per row). False positives are fine by construction:
  * the real join afterwards removes them, so results are exactly the plain
  * join's.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain needs a BIGINT key, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftSql.column(BloomMightContain(GraftSql.expression(key), bloom))

  /** serialize a filter for the SQL surface (`graft_bloom_might_contain(key,
    * X'<hex of these bytes>')`) — Spark's own sketch wire format
    */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
