package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.functions.{Base64Functions, GraftFunctionRegistry, TextFunctions => TF, VectorFunctions}

/** SQL registration surface (`GraftExtensions` / `GraftFunctionRegistry`):
  * every registered `graft_*` function must be callable from `spark.sql`
  * and produce bit-identical results to its DataFrame-API wrapper. The
  * config path (`spark.sql.extensions=graft.GraftExtensions`) is exercised
  * end-to-end by Verify/Bench (the `sql_functions` gate row fails loudly if
  * injection breaks); this suite covers the API path plus the builders'
  * analysis-time argument validation, on the shared test session.
  */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val docs = {
    GraftFunctionRegistry.register(spark)
    val d = spark.read.parquet(sf("documents"))
    d.createOrReplaceTempView("sqlfn_docs")
    d
  }

  private def qlk(c: org.apache.spark.sql.Column, minScore: Long,
                  langs: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.QualityLangKeep(expression(c), minScore, langs))
  }

  private def assertSameRows(name: String,
                             sql: org.apache.spark.sql.DataFrame,
                             api: org.apache.spark.sql.DataFrame): Unit = {
    val diff = sql.exceptAll(api).count() + api.exceptAll(sql).count()
    assert(diff == 0, s"$name: SQL vs DataFrame-API mismatch ($diff rows differ)")
  }

  test("text sketch chain via SQL matches the DataFrame API") {
    docs
    val sqlRes = spark.sql("""
      SELECT doc_id,
             graft_rollhash(text) AS rh,
             graft_shingles(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '), '\\s+', ' ')), 3) AS sh,
             graft_simhash(graft_shingles(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '), '\\s+', ' ')), 3)) AS sim,
             graft_minhash(graft_shingles(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '), '\\s+', ' ')), 3), 32) AS mh
      FROM sqlfn_docs""")
    val apiRes = docs.select(
      col("doc_id"),
      TF.rollingHash(col("text")).as("rh"),
      TF.shingleHashes(col("text"), 3).as("sh"),
      TF.simhash64(TF.shingleHashes(col("text"), 3)).as("sim"),
      TF.minhashSignature(TF.shingleHashes(col("text"), 3), k = 32).as("mh"))
    assertSameRows("sketch chain", sqlRes, apiRes)
  }

  test("HLL register aggregate via SQL matches the DataFrame API") {
    docs
    val sqlRes = spark.sql("""
      SELECT lang, graft_hll_regs(xxhash64(text), 8) AS regs
      FROM sqlfn_docs GROUP BY lang""")
    val apiRes = docs.groupBy(col("lang"))
      .agg(graft.functions.Sketches.hllRegisters(xxhash64(col("text")), 8).as("regs"))
    assertSameRows("hll registers", sqlRes, apiRes)
  }

  test("bottom-k quantile sketch aggregate via SQL matches the DataFrame API") {
    docs
    val sqlRes = spark.sql("""
      SELECT lang, graft_bottomk(xxhash64(doc_id), cast(length(text) AS BIGINT), 64) AS sk
      FROM sqlfn_docs GROUP BY lang""")
    val apiRes = docs.groupBy(col("lang"))
      .agg(graft.functions.Sketches.bottomKSketch(
        xxhash64(col("doc_id")), length(col("text")).cast("long"), 64).as("sk"))
    assertSameRows("bottomk sketch", sqlRes, apiRes)
  }

  test("quality/profile/codec functions via SQL match the DataFrame API") {
    docs
    val sqlRes = spark.sql("""
      SELECT doc_id,
             graft_quality_keep(text, 450, array('en', 'fr')) AS keep,
             graft_quality_keep(text, 450) AS keep_any,
             graft_text_profile(text).n_tokens AS n_tokens,
             graft_b64_decode(graft_b64_encode(cast(text AS BINARY))) AS b64rt,
             graft_gunzip(graft_gzip(cast(text AS BINARY))) AS gzrt
      FROM sqlfn_docs""")
    val apiRes = docs.select(
      col("doc_id"),
      qlk(col("text"), 450L, Seq("en", "fr")).as("keep"),
      qlk(col("text"), 450L, Seq.empty).as("keep_any"),
      TF.textProfile(col("text")).getField("n_tokens").as("n_tokens"),
      Base64Functions.unb64(Base64Functions.b64(col("text").cast("binary"))).as("b64rt"),
      graft.functions.GzipFunctions.gunzip(
        graft.functions.GzipFunctions.gzip(col("text").cast("binary"))).as("gzrt"))
    assertSameRows("quality/codec", sqlRes, apiRes)
  }

  test("unicode normalization via SQL matches the DataFrame API and the UAX #15 cases") {
    docs
    // NB Spark SQL's chr() is mod-256 ASCII (not a codepoint constructor
    // like DuckDB's) — the non-ASCII literals are interpolated in directly
    val sqlRes = spark.sql(s"""
      SELECT doc_id,
             graft_nfc(text || '${"é"}') AS nfc,
             graft_nfkc(text || '${"ﬁ"}') AS nfkc
      FROM sqlfn_docs""")
    val apiRes = docs.select(
      col("doc_id"),
      graft.functions.UnicodeFunctions.nfc(
        concat(col("text"), lit("é"))).as("nfc"),
      graft.functions.UnicodeFunctions.nfkc(
        concat(col("text"), lit("ﬁ"))).as("nfkc"))
    assertSameRows("unicode normalization", sqlRes, apiRes)
    // the composed-builtin registration: graft_html_text must expand to
    // the exact chain the Column API builds
    val htmlSql = spark.sql("""
      SELECT doc_id, graft_html_text('<p>' || text || '</p><script>x("&amp;")</script>') AS t
      FROM sqlfn_docs""")
    val htmlApi = docs.select(col("doc_id"),
      graft.functions.MarkupFunctions.htmlText(
        concat(lit("<p>"), col("text"),
               lit("</p><script>x(\"&amp;\")</script>"))).as("t"))
    assertSameRows("graft_html_text", htmlSql, htmlApi)
    // the canonical/compatibility cases themselves, against hand-known
    // UAX #15 results: composition, ligature + fullwidth + superscript
    // folds, NFC leaving compatibility chars alone
    val one = spark.sql(s"""
      SELECT graft_nfc('${"é"}') AS c1,
             graft_nfc('${"ﬁ"}') AS c2,
             graft_nfkc('${"ﬁ１²"}') AS k1,
             graft_nfkc('${"ä"}') AS k2""").head()
    assert(one.getString(0) == "é")         // e + U+0301 -> é
    assert(one.getString(1) == "ﬁ")         // NFC keeps the ligature
    assert(one.getString(2) == "fi12")           // ﬁ, fullwidth 1, ² fold
    assert(one.getString(3) == "ä")         // NFKC also composes
  }

  test("vector kernels via SQL match the DataFrame API") {
    GraftFunctionRegistry.register(spark)
    val emb = spark.read.parquet(sf("embeddings"))
    emb.createOrReplaceTempView("sqlfn_emb")
    val sqlRes = spark.sql("""
      SELECT vec_id, graft_dot(embedding, embedding) AS d,
             graft_cosine(embedding, embedding) AS c,
             graft_norm(embedding) AS n
      FROM sqlfn_emb""")
    val apiRes = emb.select(
      col("vec_id"),
      VectorFunctions.dotF(col("embedding"), col("embedding")).as("d"),
      VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("c"),
      VectorFunctions.normF(col("embedding")).as("n"))
    assertSameRows("vector kernels", sqlRes, apiRes)
  }

  test("non-literal and wrong-arity arguments fail at analysis with a clear message") {
    docs
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM sqlfn_docs").collect()
    }
    assert(e1.getMessage.contains("INT literal"),
      s"expected literal-arg message, got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_rollhash(text, 3) FROM sqlfn_docs").collect()
    }
    assert(e2.getMessage.contains("argument"),
      s"expected arity message, got: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_quality_keep(text, 450, 7) FROM sqlfn_docs").collect()
    }
    assert(e3.getMessage.contains("ARRAY<STRING>"),
      s"expected langs-type message, got: ${e3.getMessage}")
    // wrong COLUMN type fails at analysis (checkInputDataTypes), not as a
    // mid-job ClassCastException or silently-wrong codegen read
    val e4 = intercept[Exception] {
      spark.sql("SELECT graft_simhash(array(1, 2))").collect()
    }
    assert(e4.getMessage.contains("array<bigint>"),
      s"expected analysis-time type error, got: ${e4.getMessage}")
    val e5 = intercept[Exception] {
      spark.sql("SELECT graft_rollhash(doc_id) FROM sqlfn_docs").collect()
    }
    assert(e5.getMessage.contains("string"),
      s"expected analysis-time type error, got: ${e5.getMessage}")
    // non-positive winnow parameters fail at analysis (the constructor
    // guard), not as a mid-job index error in the executor
    val e6 = intercept[Exception] {
      spark.sql("SELECT graft_winnow(text, 4, 0) FROM sqlfn_docs").collect()
    }
    assert(e6.getMessage.contains("must be >= 1"),
      s"expected positivity message, got: ${e6.getMessage}")
    val e7 = intercept[Exception] {
      spark.sql("SELECT graft_winnow(text, 0, 8) FROM sqlfn_docs").collect()
    }
    assert(e7.getMessage.contains("must be >= 1"),
      s"expected positivity message, got: ${e7.getMessage}")
  }

  test("NULL literals fold to NULL like Spark builtins, not analysis failures") {
    // NullType args are lifted to typed nulls by the builders (codegen
    // stays compilable); the null-safe eval paths return NULL
    val r = spark.sql("""
      SELECT graft_rollhash(NULL)            AS a,
             graft_b64_encode(NULL)          AS b,
             graft_simhash(NULL)             AS c,
             graft_shingles(NULL, 3)         AS d,
             graft_minhash(NULL, 4)          AS e,
             graft_text_profile(NULL)        AS f,
             graft_quality_keep(NULL, 100)   AS g,
             graft_dot(NULL, array(CAST(1.0 AS FLOAT)))    AS h,
             graft_cosine(NULL, NULL)        AS i,
             graft_norm(NULL)                AS j,
             graft_gzip(NULL)                AS k,
             graft_vocab_encode(NULL, array('a'), 0) AS l,
             graft_lines_offsets(NULL)       AS m,
             graft_winnow(NULL, 4, 8)        AS n""").collect().head
    (0 until r.length).foreach(i => assert(r.isNullAt(i),
      s"column ${r.schema.fieldNames(i)} should be NULL"))
  }

  test("non-foldable NullType args are rejected at analysis, not left to codegen") {
    // a foldable NULL constant-folds away before codegen (test above), and
    // the SQL builders substitute typed nulls for ANY NullType argument
    // (sound: a NullType expression can only ever evaluate to null). The
    // DataFrame-API path has neither shield: a NON-foldable NullType child
    // would reach codegen as an Object-typed value the generated code
    // cannot compile against — analysis must reject it, naming the argument
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val nonFoldableNull = when(rand() > 0.5, lit(null))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1)
        .select(column(graft.functions.RollingHash64(expression(nonFoldableNull))))
        .collect()
    }
    assert(e.getMessage.contains("argument 1"), e.getMessage)
  }

  test("ensureRegistered is idempotent and GraftExtensions injects cleanly") {
    GraftFunctionRegistry.ensureRegistered(spark)
    GraftFunctionRegistry.ensureRegistered(spark) // second call: no-op, no throw
    assert(spark.sql("SELECT graft_rollhash('abc') AS h").count() == 1)
    // the extensions class itself (config path wiring; executed for real by
    // Verify/Bench sessions and the sql_functions gate row)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
