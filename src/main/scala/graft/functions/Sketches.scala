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

/** Bloom-filter bit array as a native Catalyst aggregate — the mergeable
  * MEMBERSHIP sketch completing the set the other two sketches started
  * (HLL = cardinality, Count-Min = frequency): "was this shingle/url/id
  * seen in corpus X" with zero false negatives and a tunable false-positive
  * rate, in `numBits` of state per group regardless of corpus size.
  *
  * Why not Spark's internal `BloomFilterAggregate`: same reason as HLL —
  * the buffer is an opaque blob tied to Spark's serialization, not
  * exportable, not cross-engine verifiable. This aggregate RETURNS the bit
  * array (`ARRAY<LONG>`, `numBits/64` words), so the sketch is the
  * artifact: the DuckDB oracle replays the exact bit positions from the
  * same hashes (`OracleXX.mix64Pmod` streams) and matches the words
  * bit-for-bit, and two arrays from different corpus partitions union by
  * element-wise OR — the merge that lets a 100 TB build keep one small
  * buffer per task and broadcast the result to probe a stream.
  *
  * Input is a 64-bit hash column (`xxhash64(value)`); the `j`-th probe
  * position is `floorMod(splitmix64_at(seed=j, n=h), numBits)` — k
  * independent derived streams off one input hash (standard double-ish
  * hashing via a full mixer), each replayable as ~1 KB of oracle SQL.
  * Update O(k); merge = word-wise OR (associative, commutative —
  * deterministic under any partitioning). Probing is DECLARATIVE
  * ([[Sketches.bloomMightContain]] unrolls k codegen'd bit tests), so the
  * hot probe path never leaves whole-stage codegen. */
case class BloomBits(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 28),
    s"graft_bloom_bits: numBits must be a positive multiple of 64 <= 2^28, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom_bits: numHashes must be in [1, 16], got $numHashes")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val pos = java.lang.Math.floorMod(
          graft.util.SplitMix64.at(j.toLong, h), numBits.toLong).toInt
        buffer(pos >>> 6) |= (1L << (pos & 63))
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) |= other(i)
      i += 1
    }
    buffer
  }

  // snapshot: GenericArrayData wraps the array it is given, and the agg
  // buffer is the framework's mutable scratch — alias it and a later
  // update could corrupt an already-emitted row
  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storage.length / 8)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect("graft_bloom_bits", child -> LongType)
  override def prettyName: String = "graft_bloom_bits"
}

object Sketches {
  /** Column wrapper: HLL registers of a 64-bit-hash column, 2^p buckets. */
  def hllRegisters(hash: Column, p: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(HllRegisters(expression(hash), p).toAggregateExpression())
  }

  /** Column wrapper: Bloom bit array (`ARRAY<LONG>`) of a 64-bit-hash
    * column — `numBits` bits set through `numHashes` derived streams. */
  def bloomBits(hash: Column, numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(BloomBits(expression(hash), numBits, numHashes)
      .toAggregateExpression())
  }

  /** Declarative Bloom probe: true iff every one of the `numHashes` bit
    * positions of `hash` is set in `words` (an `ARRAY<LONG>` built by
    * [[bloomBits]] with the same `numBits`/`numHashes`). Statically
    * unrolled over j — k codegen'd bit tests, no lambda, no UDF — so a
    * 100 TB probe scan stays inside whole-stage codegen with the sketch
    * riding a broadcast. Zero false negatives by construction.
    *
    * Defensive semantics (advisor round 10): a NULL hash or NULL sketch
    * probes to FALSE (not NULL — a NULL would silently vanish from
    * `sum(when(hit,...))` rollups), and a non-null `words` array whose
    * length does not match `numBits/64` raises at runtime instead of
    * yielding NULL hits via out-of-range `element_at` — a sketch/probe
    * sizing mismatch is a caller bug that must surface loudly. */
  def bloomMightContain(hashCol: Column, words: Column, numBits: Int,
                        numHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    require(numBits >= 64 && numBits % 64 == 0,
      s"bloomMightContain: numBits must be a positive multiple of 64, got $numBits")
    val numWords = numBits / 64
    // loud sizing guard: every word lookup goes through `sized`, which is
    // `words` iff the length matches and a raised error otherwise. The
    // size() comparison is a cheap codegen'd branch per row.
    val sized = when(words.isNull || size(words) === lit(numWords), words)
      .otherwise(raise_error(concat(
        lit(s"bloomMightContain: words length != $numWords (numBits=$numBits), got "),
        size(words).cast("string"))))
    // Spark's shiftleft/shiftright take a LITERAL shift count, so the
    // dynamic bit test goes through a 64-entry power-of-two literal array
    // (index 64 = 1L<<63 = Long.MinValue — the sign bit as a mask)
    val pow2 = array((0 until 64).map(b => lit(1L << b)): _*)
    val hit = (0 until numHashes).map { j =>
      // pos >= 0 (pmod) and < 2^28, so the double-typed `/64` is exact
      // (needs < 2^53) and &63 is the exact mod
      val pos = pmod(Mix64.mix64(hashCol, j.toLong), lit(numBits.toLong))
      val word = element_at(sized,
        floor(pos.cast("double") / 64.0).cast("int") + 1)
      word.bitwiseAND(element_at(pow2,
        pos.bitwiseAND(lit(63L)).cast("int") + 1)) =!= lit(0L)
    }.reduce(_ && _)
    coalesce(hit, lit(false))
  }
}
