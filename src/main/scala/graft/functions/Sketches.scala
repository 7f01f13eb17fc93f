package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

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

/** Mutable bounded max-heap on lexicographic (h, v) — the aggregation
  * buffer of [[BottomKSketch]]. Keeps the k SMALLEST pairs seen: while
  * under capacity new pairs sift up; at capacity a pair smaller than the
  * root (the current maximum) replaces it and sifts down. All operations
  * are O(log k); the state is exactly 16k bytes + a counter. */
final class BottomKHeap(val k: Int) {
  var n: Int = 0
  val hs = new Array[Long](k)
  val vs = new Array[Long](k)

  @inline private def less(h1: Long, v1: Long, h2: Long, v2: Long): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  private def swap(i: Int, j: Int): Unit = {
    val th = hs(i); hs(i) = hs(j); hs(j) = th
    val tv = vs(i); vs(i) = vs(j); vs(j) = tv
  }

  def insert(h: Long, v: Long): Unit =
    if (n < k) {
      var i = n
      hs(i) = h; vs(i) = v; n += 1
      while (i > 0 && less(hs((i - 1) / 2), vs((i - 1) / 2), hs(i), vs(i))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (less(h, v, hs(0), vs(0))) {
      hs(0) = h; vs(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && less(hs(m), vs(m), hs(l), vs(l))) m = l
        if (r < n && less(hs(m), vs(m), hs(r), vs(r))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  def mergeFrom(other: BottomKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.hs(i), other.vs(i)); i += 1 }
  }

  /** The kept pairs sorted ascending by (h, v) — the canonical emitted
    * form (a pure function of the input row SET, whatever the heap's
    * internal layout ended up as). */
  def sortedPairs(): Array[(Long, Long)] = {
    val out = Array.tabulate(n)(i => (hs(i), vs(i)))
    scala.util.Sorting.quickSort(out)
    out
  }
}

/** Bottom-k quantile sketch — the mergeable QUANTILE member of the native
  * sketch family (HLL = cardinality, CMS = frequency, Bloom = membership):
  * keeps the k pairs `(h, v)` with lexicographically smallest `(h, v)`,
  * where `h` is a ROW-UNIQUE 64-bit hash (e.g. `mix64(id)`) and `v` the
  * LONG value whose distribution is sketched. A uniform hash ranks rows in
  * a fixed pseudo-random order, so the kept pairs are a uniform
  * without-replacement sample of the rows; sample quantiles estimate
  * population quantiles with rank error O(sqrt(q(1-q)/k)) (bottom-k / KMV
  * sampling, Cohen & Kaplan 2007). At 100 TB this replaces the exact
  * sort-based `percentile` in the length/latency distribution reports:
  * one scan, 16k bytes of state per group, only sketches cross the merge
  * shuffle.
  *
  * Why bottom-k and not KLL or t-digest (the textbook mergeable quantile
  * sketches): their compactions depend on insertion AND merge order
  * (KLL's coin flips, t-digest's centroid formation), and Spark's task
  * scheduling makes those orders nondeterministic run-to-run — a bit-exact
  * gate, and any diffable/storable 100 TB sketch artifact, needs the
  * sketch to be a pure FUNCTION OF THE ROW SET. The k smallest hashes are
  * exactly that: order-independent, deterministic, mergeable by
  * union-then-truncate (associative and commutative; idempotent only at
  * the SET level — see the disjoint-input precondition on
  * [[Sketches.sketchMerge]]), and
  * cross-engine replicable as an ORDER BY + LIMIT. The price is accuracy
  * per byte — KLL converges O(1/k) vs bottom-k O(1/sqrt(k)); at k = 1024
  * that is ~3% rank error, adequate for distribution QA reports, and the
  * knob is k, not the algorithm.
  *
  * Emits the sketch itself: `ARRAY<STRUCT<h: LONG, v: LONG>>` sorted
  * ascending by (h, v). Merge two emitted sketches DECLARATIVELY with
  * `slice(array_sort(concat(a, b)), 1, k)` — struct array_sort is
  * lexicographic on field order, which is the buffer's own (h, v) order;
  * probe quantiles with [[Sketches.sketchQuantile]]. Ties on h (a hash
  * collision across rows) break on v, so truncation at k stays
  * deterministic. */
case class BottomKSketch(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKHeap] with BinaryLike[Expression] {

  require(k >= 16 && k <= (1 << 20),
    s"graft_bottomk: k must be in [16, 2^20], got $k")

  override def createAggregationBuffer(): BottomKHeap = new BottomKHeap(k)

  override def update(buffer: BottomKHeap, input: InternalRow): BottomKHeap = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      buffer.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKHeap, other: BottomKHeap): BottomKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BottomKHeap): Any =
    new GenericArrayData(buffer.sortedPairs()
      .map { case (h, v) => InternalRow(h, v) }.toArray[Any])

  override def serialize(buffer: BottomKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.hs(i)); bb.putLong(buffer.vs(i)); i += 1 }
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): BottomKHeap = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val m = bb.getInt()
    val out = new BottomKHeap(k)
    var i = 0
    while (i < m) { out.insert(bb.getLong(), bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSketch =
    copy(left = newLeft, right = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
                   StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect("graft_bottomk", left -> LongType, right -> LongType)
  override def prettyName: String = "graft_bottomk"
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

  /** Column wrapper: bottom-k quantile sketch (`ARRAY<STRUCT<h,v>>` sorted
    * by (h, v)) of LONG `value`, sampled by the row-unique 64-bit `hash`. */
  def bottomKSketch(hash: Column, value: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(BottomKSketch(expression(hash), expression(value), k)
      .toAggregateExpression())
  }

  /** Quantile-q estimate from a [[bottomKSketch]] column: the sample value
    * at 1-based rank `floor(q·(m−1)) + 1` of the value-sorted sample (the
    * deterministic lower-interpolation rule — one IEEE multiply on exact
    * integer operands, bit-identical in any engine). NULL on an empty
    * sketch. Declarative (sort + element_at), so probing N quantiles of a
    * stored sketch table never leaves codegen. */
  def sketchQuantile(sketch: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    require(q >= 0.0 && q <= 1.0, s"sketchQuantile: q must be in [0,1], got $q")
    val vals = array_sort(transform(sketch, x => x.getField("v")))
    val m = size(vals)
    when(m === 0, lit(null).cast("long")).otherwise(
      element_at(vals,
        floor(lit(q) * (m - lit(1)).cast("double")).cast("int") + 1))
  }

  /** Declarative merge of two emitted [[bottomKSketch]] columns — the
    * union-then-truncate algebra (struct array_sort is lexicographic on
    * (h, v), the sketches' own order).
    *
    * PRECONDITION: the two sketches must cover DISJOINT row sets (e.g.
    * per-partition or per-group sketches being rolled up — every current
    * caller). `concat` is a bag union, so merging sketches over
    * overlapping rows keeps the shared (h, v) pairs twice and the
    * truncate then over-weights the overlap (merging a sketch with
    * itself yields doubled pairs, not the same sketch). For stored
    * sketches that may overlap, dedup first:
    * `slice(array_sort(array_distinct(concat(a, b))), 1, k)` — kept out
    * of this helper because every in-repo rollup is disjoint by
    * construction and the extra pass would be pure cost there. */
  def sketchMerge(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(concat(a, b)), 1, k)
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
