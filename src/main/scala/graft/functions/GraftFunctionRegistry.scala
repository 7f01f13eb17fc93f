package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration for graft's native Catalyst expressions.
  *
  * The reference exposes its transforms only through component configs; a
  * Spark-native engine should expose them to `spark.sql(...)` too, so a
  * user can mix graft operators with plain SQL without touching the Scala
  * DSL. Two installation paths, same builders:
  *
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide,
  *    set before session build — this is what `Verify`/`Bench` use, so the
  *    driver's correctness gate exercises it end-to-end);
  *  - API: `GraftFunctionRegistry.register(spark)` on an existing session
  *    (e.g. a shared notebook session the library user doesn't own).
  *
  * Non-column parameters (shingle width, minhash k/seed, language lists)
  * must be foldable literals — they parameterize codegen, they are not
  * per-row data — and the builders reject anything else with a message
  * naming the argument, at analysis time rather than mid-job.
  */
object GraftFunctionRegistry {

  type Desc = (FunctionIdentifier, ExpressionInfo, FunctionBuilder)

  private def arity(name: String, args: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(args.length))
      throw new IllegalArgumentException(
        s"$name expects ${ns.mkString(" or ")} argument(s), got ${args.length}")

  private def intLit(name: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType)  => v
    case Literal(v: Short, ShortType)  => v.toInt
    case Literal(v: Byte, ByteType)    => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be an INT literal, got ${e.sql}")
  }

  private def longLit(name: String, what: String, e: Expression): Long = e match {
    case Literal(v: Long, LongType) => v
    case other                      => intLit(name, what, other).toLong
  }

  private def stringArrayLit(name: String, what: String,
                             e: Expression): Seq[String] = e.dataType match {
    case ArrayType(StringType, _) if e.foldable =>
      e.eval() match {
        case null => Seq.empty
        case a: ArrayData =>
          a.toArray[UTF8String](StringType)
            .map(u => if (u == null) null else u.toString).toSeq
      }
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be a foldable ARRAY<STRING> " +
      s"(e.g. array('en', 'fr')), got ${e.sql}")
  }

  /** Lift a NULL literal (NullType) to a typed null so the expression's
    * codegen stays compilable (`((Object)null).getBytes()` would not) —
    * the same analysis-time cast Spark's ImplicitCastInputTypes inserts
    * for builtins, which we cannot mix in from outside `private[sql]`. */
  private def nn(e: Expression, dt: DataType): Expression =
    if (e.dataType == NullType) Literal(null, dt) else e

  private val longArray  = ArrayType(LongType)
  private val floatArray = ArrayType(FloatType)

  private def d(name: String, clazz: Class[_])
               (b: (String, Seq[Expression]) => Expression): Desc =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name),
     (args: Seq[Expression]) => b(name, args))

  /** Every registered function: (identifier, info, builder). One entry per
    * public native expression; arity and literal checks in the builder. */
  val all: Seq[Desc] = Seq(
    d("graft_b64_encode", classOf[B64Encode]) { (n, a) =>
      arity(n, a, 1); B64Encode(nn(a.head, BinaryType))
    },
    d("graft_b64_decode", classOf[B64Decode]) { (n, a) =>
      arity(n, a, 1); B64Decode(nn(a.head, StringType))
    },
    d("graft_nfc", classOf[NfcNormalize]) { (n, a) =>
      arity(n, a, 1); NfcNormalize(nn(a.head, StringType))
    },
    // a COMPOSED builtin tree, not a single expression: the SQL surface
    // gets the markup extractor by expanding the same catalyst chain the
    // Column API wraps (MarkupFunctions.htmlTextExpr is the single
    // source of truth)
    d("graft_html_text", classOf[MarkupFunctions.type]) { (n, a) =>
      arity(n, a, 1)
      MarkupFunctions.htmlTextExpr(nn(a.head, StringType))
    },
    d("graft_nfkc", classOf[NfkcNormalize]) { (n, a) =>
      arity(n, a, 1); NfkcNormalize(nn(a.head, StringType))
    },
    d("graft_gzip", classOf[GzipCompress]) { (n, a) =>
      arity(n, a, 1); GzipCompress(nn(a.head, BinaryType))
    },
    d("graft_gunzip", classOf[GzipDecompress]) { (n, a) =>
      arity(n, a, 1); GzipDecompress(nn(a.head, BinaryType))
    },
    // graft_shingles takes graft-NORMALIZED text (TextFunctions.normText —
    // compose with lower/regexp_replace/trim in SQL) and yields the sorted
    // distinct ARRAY<BIGINT> shingle hashes; graft_minhash / graft_simhash
    // consume that array, so the sketch chain composes in pure SQL:
    //   graft_simhash(graft_shingles(<norm>, 3))
    d("graft_shingles", classOf[ShingleHashes]) { (n, a) =>
      arity(n, a, 2); ShingleHashes(nn(a(0), StringType), intLit(n, "n (shingle width)", a(1)))
    },
    d("graft_minhash", classOf[MinHashSig]) { (n, a) =>
      arity(n, a, 2, 3)
      MinHashSig(nn(a(0), longArray), intLit(n, "k (signature length)", a(1)),
        if (a.length > 2) longLit(n, "seed", a(2)) else 42L)
    },
    d("graft_simhash", classOf[SimHash64]) { (n, a) =>
      arity(n, a, 1); SimHash64(nn(a.head, longArray))
    },
    d("graft_winnow", classOf[WinnowFingerprints]) { (n, a) =>
      arity(n, a, 3)
      WinnowFingerprints(nn(a(0), StringType), intLit(n, "n (gram width)", a(1)),
        intLit(n, "w (window)", a(2)))
    },
    // aggregate: HLL registers of a 64-bit-hash column, 2^p buckets —
    // `graft_hll_regs(xxhash64(tok), 8)`; the analyzer wraps the returned
    // AggregateFunction in an AggregateExpression like any builtin agg
    d("graft_hll_regs", classOf[HllRegisters]) { (n, a) =>
      arity(n, a, 2); HllRegisters(nn(a(0), LongType), intLit(n, "p (log2 buckets)", a(1)))
    },
    // aggregate: bottom-k quantile sketch of (row-hash, value) —
    // `graft_bottomk(mix64_hash, value, 1024)`
    d("graft_bottomk", classOf[BottomKSketch]) { (n, a) =>
      arity(n, a, 3)
      BottomKSketch(nn(a(0), LongType), nn(a(1), LongType),
        intLit(n, "k (sample size)", a(2)))
    },
    d("graft_text_profile", classOf[TextProfile]) { (n, a) =>
      arity(n, a, 1); TextProfile(nn(a.head, StringType))
    },
    d("graft_quality_keep", classOf[QualityLangKeep]) { (n, a) =>
      arity(n, a, 2, 3)
      QualityLangKeep(nn(a(0), StringType), longLit(n, "minScore", a(1)),
        if (a.length > 2) stringArrayLit(n, "langs", a(2)) else Seq.empty)
    },
    d("graft_rollhash", classOf[RollingHash64]) { (n, a) =>
      arity(n, a, 1); RollingHash64(nn(a.head, StringType))
    },
    d("graft_lines_offsets", classOf[LinesWithOffsets]) { (n, a) =>
      arity(n, a, 1, 2)
      LinesWithOffsets(nn(a(0), BinaryType),
        if (a.length > 1) intLit(n, "maxLineBytes", a(1)) else 0)
    },
    d("graft_vocab_encode", classOf[VocabEncode]) { (n, a) =>
      arity(n, a, 3)
      VocabEncode(nn(a(0), ArrayType(StringType)), stringArrayLit(n, "vocab", a(1)).toArray,
        intLit(n, "unkId", a(2)))
    },
    d("graft_dot", classOf[VectorExpressions.DotF]) { (n, a) =>
      arity(n, a, 2); VectorExpressions.DotF(nn(a(0), floatArray), nn(a(1), floatArray))
    },
    d("graft_cosine", classOf[VectorExpressions.CosineSimF]) { (n, a) =>
      arity(n, a, 2); VectorExpressions.CosineSimF(nn(a(0), floatArray), nn(a(1), floatArray))
    },
    d("graft_norm", classOf[VectorExpressions.NormF]) { (n, a) =>
      arity(n, a, 1); VectorExpressions.NormF(nn(a(0), floatArray))
    })

  /** Install on an EXISTING session (replaces prior registrations — safe to
    * call repeatedly). For new sessions prefer the config path:
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (ident, inf, builder) =>
      reg.registerFunction(ident, inf, builder)
    }
  }

  /** Register only if the functions aren't already present (either from the
    * extensions config or a prior `register`) — lets library code that
    * issues SQL run on any caller-provided session. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier("graft_rollhash")))
      register(spark)
}
