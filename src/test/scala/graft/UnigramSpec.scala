package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Unigram-LM tokenizer: the lexicographic integer Viterbi DP
  * ([[graft.functions.UnigramSegment]]) and the EM induction / encode
  * operators built on it. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(vocab: Map[String, Long], words: String*): Seq[String] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    words.toDF("w").select(column(graft.functions.UnigramSegmentExpr(
        expression(col("w")), vocab, 6, 12)).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  test("segment: fewest pieces wins; length-2+ pieces must be in vocab") {
    val v = Map("ab" -> 10L, "b" -> 5L, "abc" -> 3L)
    // "abc" as one piece beats any 2-piece split; "abb" forced to ab+b;
    // "ba" not in vocab -> single chars
    assert(seg(v, "abc", "abb", "ba") == Seq("abc", "ab b", "b a"))
  }

  test("segment: frequency mass breaks piece-count ties") {
    // "aab": a+ab (mass 0+10) beats aa+b were aa in vocab; with aa absent
    // the only 2-piece split is a|ab
    assert(seg(Map("ab" -> 10L), "aab") == Seq("a ab"))
    // both 2-piece splits valid: ab+cd mass 12 beats a... (no others);
    // raise "bc" so no 2-split uses it (a+bc+d is 3 pieces)
    assert(seg(Map("ab" -> 5L, "cd" -> 7L, "bc" -> 99L), "abcd")
      == Seq("ab cd"))
  }

  test("segment: lexicographic final tie-break; OOV and empty contracts") {
    // "aba": a|ba and ab|a tie on (2 pieces, mass 5) -> "a ba" < "ab a"
    assert(seg(Map("ab" -> 5L, "ba" -> 5L), "aba") == Seq("a ba"))
    // longer than maxWordLen (12) bypasses as one opaque piece
    val long = "abcdefghijklm"
    assert(seg(Map.empty, long) == Seq(long))
    assert(seg(Map.empty, "") == Seq(""))
  }

  test("segment: single chars always valid at frequency 0") {
    assert(seg(Map.empty, "xyz") == Seq("x y z"))
  }

  test("unigramTrain at production vocab: >=2k pieces, 2 EM rounds, bounded time") {
    // per-iteration cost audit (round-13 verdict item 5): a vocabulary two
    // orders past the gate config must train in one job + one <=vocabSize
    // collect per round — no per-piece expression growth, no cross-round
    // state. 3000 distinct 12-char pseudo-random words: EM keeps ~1 used
    // pieces per word, so the post-EM piece pool stays above the cut.
    val rnd = new java.util.Random(11)
    val words = (0 until 3000).map { _ =>
      val sb = new StringBuilder
      (0 until 12).foreach(_ => sb.append(('a' + rnd.nextInt(26)).toChar))
      sb.toString
    }
    val docs = spark.createDataFrame(
      words.zipWithIndex.map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 5)) })
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val vocab = graft.operators.TextAnalysis.unigramTrain(
      docs, "text", vocabSize = 2048, maxPieceLen = 6, maxWordLen = 12,
      emIters = 2)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(vocab.size >= 2000, s"vocabulary cut returned ${vocab.size} pieces")
    assert(vocab.forall(_._2 >= 1L), "a kept piece must have positive frequency")
    assert(secs < 120.0, s"2k-piece train took ${secs}s — per-round cost shape broken")
    // and the trained vocabulary segments the corpus without error
    val enc = graft.operators.TextAnalysis.unigramEncode(
      docs, "doc_id", "text", vocabSize = 2048, maxPieceLen = 6,
      maxWordLen = 12, emIters = 2)
    assert(enc.count() == 3000L)
  }

  test("unigramVocab: coverage cut promotes whole words through EM") {
    val docs = Seq((1L, "foo bar foo"), (2L, "foo barbar"), (3L, "bar foo"))
      .toDF("doc_id", "text")
    val v = TextAnalysis.unigramVocab(docs, "text", vocabSize = 8,
        maxPieceLen = 6, maxWordLen = 12, emIters = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3)))
    // seed coverage favors foo (4*3=12), bar (4*3=12), barbar (1*6=6)
    // over any single char (max 8); the E-step then segments every word
    // with those pieces and the recount keeps exactly the used set
    assert(v.map(x => (x._2, x._3, x._4)).toSeq == Seq(
      ("foo", 4L, 12L), ("bar", 2L, 6L), ("barbar", 1L, 6L)),
      s"got ${v.mkString(", ")}")
    assert(v.head._1 == 1L)
    // ranks strictly ordered by (coverage desc, piece asc)
    val key = v.map(x => (-x._4, x._2))
    assert(key.sameElements(key.sorted), s"rank order broken: ${v.mkString(", ")}")
  }

  test("unigramVocab/unigramEncode: partitioning-invariant on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.unigramEncode(d, "doc_id", "text", vocabSize = 48,
          maxPieceLen = 6, maxWordLen = 12, emIters = 2)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b, "unigram encode depends on input partitioning")
    assert(a.nonEmpty)
  }

  test("unigramFertility: exact per-group ‰ ratios; empty-group guard NULLs") {
    // one lang, trivially learnable corpus: "foo bar" x2 docs -> vocab
    // {foo, bar}; every word is one piece -> tokens_per_word = 1000‰,
    // chars_per_token = 3000‰
    val docs = Seq((1L, "foo bar", "en"), (2L, "bar foo", "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.unigramFertility(docs, "text", "lang",
        vocabSize = 8, maxPieceLen = 6, maxWordLen = 12, emIters = 1)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("sum_words") == 4L)
    assert(r(0).getAs[Long]("sum_uni_tokens") == 4L)
    assert(r(0).getAs[Long]("tokens_per_word_pm") == 1000L)
    assert(r(0).getAs[Long]("chars_per_token_pm") == 3000L)
  }

  test("unigramEncode: token count equals segmentation piece count") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramEncode(docs, "doc_id", "text",
        vocabSize = 32, maxPieceLen = 6, maxWordLen = 12, emIters = 1)
      .orderBy("doc_id").collect()
    // doc 2 normalizes to "" -> one empty word, zero tokens
    assert(r(1).getAs[Long]("n_words") == 1L)
    assert(r(1).getAs[Long]("n_tokens_uni") == 0L)
    assert(r(0).getAs[Long]("n_tokens_uni") >= 2L)
  }

  test("tokenizerCompareFertility: fused pipeline equals the composed bpe ⋈ unigram form") {
    // the round-17 fusion must be VALUE-identical to the two-operator
    // composition it replaces (same trainers over the same word counts,
    // same encoders, same ‰ arithmetic) — the gate query's oracle hash
    // depends on it
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = TextAnalysis.tokenizerCompareFertility(docs, "text", "lang",
        numMerges = 8, vocabSize = 48, maxPieceLen = 6, maxWordLen = 12,
        emIters = 2)
      .select(col("lang"), col("sum_words"), col("sum_bpe_tokens"),
        col("sum_uni_tokens"), col("bpe_tpw_pm"), col("uni_tpw_pm"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.bpeFertility(docs, "doc_id", "text", "lang",
        numMerges = 8)
      .select(col("lang"), col("sum_words"), col("sum_bpe_tokens"),
        col("tokens_per_word_pm").as("bpe_tpw_pm"))
    val u = TextAnalysis.unigramFertility(docs, "text", "lang",
        vocabSize = 48, maxPieceLen = 6, maxWordLen = 12, emIters = 2)
      .select(col("lang"), col("sum_uni_tokens"),
        col("tokens_per_word_pm").as("uni_tpw_pm"))
    val composed = b.join(u, Seq("lang"))
      .select(col("lang"), col("sum_words"), col("sum_bpe_tokens"),
        col("sum_uni_tokens"), col("bpe_tpw_pm"), col("uni_tpw_pm"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(fused.nonEmpty && fused == composed,
      s"fused tokenizer compare diverged from the composed form")
  }
}
