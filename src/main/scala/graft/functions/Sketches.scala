package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register aggregation (Flajolet et al. 2007) as a native
  * Catalyst aggregate — the one-pass, fixed-memory cardinality sketch for
  * "how many distinct shingles/tokens/urls per group" at corpus scale.
  *
  * Why a custom aggregate when `approx_count_distinct` exists: Spark's
  * HLL++ buffer is an opaque implementation detail — its registers cannot
  * be exported, compared across engines, or unioned with sketches built
  * elsewhere. This aggregate RETURNS the registers (`ARRAY<INT>`, m = 2^p
  * entries, register = max leading-zero rank seen in the bucket), making
  * the sketch itself the verifiable artifact: the DuckDB oracle replays
  * the exact same buckets/ranks from the same XXH64 hashes and matches the
  * register array bit-for-bit (`OracleXX.hllOracle`), and two register
  * arrays from different corpus partitions union by element-wise max —
  * the property that lets a 100 TB scan keep ONE 2^p-byte buffer per
  * group per task and shuffle only that.
  *
  * Input is the 64-bit hash (`xxhash64(value)`), not the value: hashing
  * stays in codegen'd columnar land; only the rank bookkeeping is
  * imperative. Update is O(1); merge is element-wise max (associative,
  * commutative — order-independent, hence deterministic under any task
  * scheduling); the estimate is derived DECLARATIVELY from the registers
  * (see `TextAnalysis.hllCardinality`) so the math stays auditable.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"graft_hll_regs: p must be in [4, 16], got $p")

  private def m: Int = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p // the 64-p suffix bits, left-aligned
      val rho = // leading-zero rank within the suffix, capped at 64-p+1
        (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(buffer.map(_.toInt))

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect("graft_hll_regs", child -> LongType)
  override def prettyName: String = "graft_hll_regs"
}

object Sketches {
  /** Column wrapper: HLL registers of a 64-bit-hash column, 2^p buckets. */
  def hllRegisters(hash: Column, p: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(HllRegisters(expression(hash), p).toAggregateExpression())
  }
}
