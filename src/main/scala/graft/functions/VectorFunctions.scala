package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Embedding-vector kernels for the similarity-search / near-dup operators
  * (SURVEY.md §7 phase 5; `embeddings.parquet` is `ARRAY<FLOAT>` 64-dim).
  *
  * These are native Catalyst expressions with `doGenCode` — the dot-product
  * loop stays inside whole-stage codegen on primitive `ArrayData.getFloat`
  * accesses, no boxing, no UDF serialization. At 100 TB scale the
  * brute-force kernel is the inner loop of a (candidates × queries) join, so
  * this is the hottest code path the engine has; `zip_with`+`aggregate`
  * compositions allocate per-row, this does not.
  */
object VectorExpressions {

  /** dot(a, b) over ARRAY<FLOAT> → DOUBLE (accumulated in double,
    * sequential order — deterministic). */
  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      GraftTypeCheck.expect(prettyName, left -> ArrayType(FloatType), right -> ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
      copy(left = l, right = r)
    override def prettyName: String = "dot_f"
  }

  /** cosine(a, b) over ARRAY<FLOAT> → DOUBLE; 0.0 when either norm is 0. */
  case class CosineSimF(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      GraftTypeCheck.expect(prettyName, left -> ArrayType(FloatType), right -> ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      // dot / (sqrt(na)*sqrt(nb)) — matches DuckDB list_cosine_similarity
      // bit-for-bit (sqrt(na*nb) differs in the last ulp)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.getFloat($i);
           |  double $yv = (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimF =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim_f"
  }

  /** Euclidean (L2) norm of ARRAY<FLOAT> → DOUBLE. */
  case class NormF(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < x.numElements()) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i); $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): NormF = copy(c)
    override def prettyName: String = "norm_f"
  }
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dotF(a: Column, b: Column): Column =
    column(VectorExpressions.DotF(expression(a), expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    column(VectorExpressions.CosineSimF(expression(a), expression(b)))
  def normF(a: Column): Column =
    column(VectorExpressions.NormF(expression(a)))
}

/** Static kernels shared by expressions and driver-side training. */
object VectorKernels {
  def l2Sq(a: org.apache.spark.sql.catalyst.util.ArrayData,
           c: Array[Float]): Double = {
    val n = math.min(a.numElements(), c.length)
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getFloat(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Indices of the `probes` nearest centroids by L2, nearest first
    * (deterministic tie-break on index). */
  def nearestCentroids(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                       cents: Array[Array[Float]], probes: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = cents.length
    val d = new Array[Double](k)
    var i = 0
    while (i < k) { d(i) = l2Sq(vec, cents(i)); i += 1 }
    val idx = Array.range(0, k).sortBy(j => (d(j), j)).take(math.min(probes, k))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(idx)
  }
}

/** `probes` nearest centroid ids for an ARRAY<FLOAT> vector — the IVF
  * coarse quantizer. Centroids ride along as a codegen reference object;
  * evaluation is one primitive pass, no boxing. */
case class NearestCentroids(child: org.apache.spark.sql.catalyst.expressions.Expression,
                            centroids: Array[Array[Float]], probes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> ArrayType(FloatType))
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroids(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], centroids, probes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCentroids($c, $cRef, $probes)")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroids =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

/** Number of positions where two ARRAY<BIGINT> signatures agree — the
  * MinHash similarity estimator (est_jaccard = agree / k). Native because
  * the zip_with+aggregate composition allocates a boxed intermediate array
  * per pair on the LSH verify path. */
case class SigAgree(left: org.apache.spark.sql.catalyst.expressions.Expression,
                    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      GraftTypeCheck.expect(prettyName, left -> ArrayType(LongType), right -> ArrayType(LongType))
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): SigAgree =
    copy(left = l, right = r)
  override def prettyName: String = "sig_agree"
}

/** JVM kernel behind [[Int8QuantStats]] — one sequential pass whose
  * arithmetic the DuckDB oracle replays operation-for-operation (every op
  * IEEE exact-rounded, fixed element order), so the whole report is
  * bit-identical cross-engine. */
object Int8QuantUtil {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData

  def stats(v: ArrayData): GenericInternalRow = {
    val n = v.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > ma) ma = a
      i += 1
    }
    var dot = 0.0; var nv = 0.0; var nr = 0.0
    var err = 0.0; var clamped = 0L
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      var c = 0L
      if (ma != 0.0) {
        val raw = math.floor(x * 127.0 / ma)
        if (raw > 127.0 || raw < -127.0) clamped += 1
        c = math.max(-127.0, math.min(127.0, raw)).toLong
      }
      val r = c.toDouble * ma / 127.0
      dot += x * r; nv += x * x; nr += r * r
      val e = math.abs(x - r)
      if (e > err) err = e
      i += 1
    }
    val cos: Any =
      if (ma == 0.0 || nr == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(nv) * math.sqrt(nr)))
    new GenericInternalRow(Array[Any](ma, cos, err, clamped))
  }
}

/** Per-vector int8 symmetric-quantization report over ARRAY<FLOAT>:
  * scale = max|x| (the standard symmetric max-abs calibration), codes =
  * clamp(floor(x·127/scale), ±127), and the stats a 100 TB embedding
  * store needs before committing to 4x-smaller shards — reconstruction
  * cosine, max absolute error, clamp count. One native pass per row
  * (struct output, no HOF lambdas — the CollapseProject re-evaluation
  * trap) with `floor` (not round) so both engines truncate identically.
  * Returns struct(max_abs DOUBLE, cos_recon DOUBLE nullable — NULL for
  * the degenerate all-zero vector, max_abs_err DOUBLE, n_clamped LONG). */
case class Int8QuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("max_abs", DoubleType, nullable = false),
    StructField("cos_recon", DoubleType, nullable = true),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("n_clamped", LongType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any =
    Int8QuantUtil.stats(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8QuantUtil.stats($c)")
  override protected def withNewChildInternal(c: Expression): Int8QuantStats = copy(c)
  override def prettyName: String = "int8_quant_stats"
}
