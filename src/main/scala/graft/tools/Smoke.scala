package graft.tools

import graft.config.GraftConfig
import graft.functions.{Compressor, DumpCodec, TextFunctions => TF, VectorFunctions => VF}
import graft.event.Event
import graft.operators.{Dedup, Graph, Multimodal, Similarity, TextAnalysis}
import graft.streaming.Pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke driver: exercises the public library surface against
  * the driver corpus + a real config-assembled streaming pipeline.
  * Run: `sbt "runMain graft.tools.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[time] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); t0 = System.nanoTime()
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.parquet is ns
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    lap("startup")

    // 1. streaming pipeline from config: directory source -> interceptor -> file sink
    val work = java.nio.file.Files.createTempDirectory("graft-smoke")
    val inDir = work.resolve("in"); val outDir = work.resolve("out")
    java.nio.file.Files.createDirectories(inDir)
    java.nio.file.Files.write(inDir.resolve("a.txt"),
      "hello world\nERROR bad line\nanother event\n".getBytes)
    val conf = GraftConfig.parse(s"""
      graft {
        source { s1 { type = directory, path = "$inDir",
                      interceptors = [keep], sinks = [f1] } }
        interceptor { keep { fqcn = "graft.interceptor.Transparent", priority = 90 } }
        sink { f1 { type = file, path = "$outDir" } }
      }""")
    val pipelines = Pipeline.start(spark, conf, work.resolve("ckpt").toString)
    pipelines.foreach(_.query.processAllAvailable())
    pipelines.foreach(_.query.stop())
    val delivered = spark.read.parquet(outDir.toString)
    println(s"[smoke] pipeline delivered rows=${delivered.count()}")
    delivered.show(5, truncate = false)
    lap("pipeline")

    // 2. interceptor chain semantics (drop + fail-open) via typed path
    import graft.interceptor._
    val chain = InterceptorChain(Seq(
      RegexFilter("noerr", "^(?!ERROR).*", priority = 90),
      Transparent("t", priority = 10)))
    println(s"[smoke] chain drops ERROR line: ${chain.interceptOne(Event("ERROR x"))}")
    println(s"[smoke] chain keeps normal:     ${chain.interceptOne(Event("fine"))}")

    // 3. gzip + dump codec round trips
    val gz = Compressor.gzipDecompress(Compressor.gzipCompress("payload ü".getBytes("UTF-8")))
    println(s"[smoke] gzip roundtrip: ${new String(gz, "UTF-8")}")
    val ev = Event("body;x", Map("k,1" -> "v;2"))
    println(s"[smoke] dump roundtrip ok: ${DumpCodec.decode(DumpCodec.encode(ev)) == ev}")

    // 4. operators on the driver corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    println("[smoke] text profile:")
    TextAnalysis.profile(docs, "doc_id", "text").show(3, truncate = false)
    lap("profile")

    println("[smoke] minhash LSH near-dup pairs (threshold .7):")
    Dedup.minhashLshPairs(docs, "doc_id", "text").show(5)
    lap("minhash")

    println("[smoke] simhash pairs (hamming<=8):")
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8).show(5)
    lap("simhash")

    println("[smoke] ngram jaccard pairs (threshold .2):")
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.2).show(5)
    lap("ngram")

    println("[smoke] brute-force cosine top-3 for first 2 vectors:")
    val queries = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 3).show()
    lap("brute")

    println("[smoke] LSH ANN top-3 (same queries):")
    Similarity.lshTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 3).show()
    lap("lsh")

    println("[smoke] RP ANN top-3 (same queries):")
    Similarity.rpTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, outDim = 16, refine = 20)
      .show(3)
    lap("rp")
    println("[smoke] PQ ANN top-3 (same queries):")
    Similarity.pqTopK(emb, "vec_id", "embedding", queries, "qid", "qvec",
      k = 3, refine = 20).show()
    lap("pq")

    println("[smoke] semantic dedup survivors (SemDeDup, fixed centroids):")
    Dedup.semanticSurvivors(emb, "vec_id", "embedding",
      Similarity.fixedCentroids(16, 64), threshold = 0.4).show(5)
    lap("semantic")

    println("[smoke] multimodal stub decode:")
    val media = Multimodal.withBinaryPayload(docs.limit(5), "doc_id", "text", "video")
    Multimodal.decodeMeta(media).show(truncate = false)
    lap("multimodal")

    println("[smoke] as-of join (latest purchase value per event):")
    val evts = graft.functions.EventTime.withEpochMs(
      spark.read.parquet(s"$sf/events.parquet"))
    val probe = evts.select("event_id", "user_id", "ts_ms")
    val changelog = evts.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts_ms").agg(max("value").as("v"))
    graft.operators.Relational.asofJoin(probe, changelog, "user_id", "ts_ms", Seq("v"))
      .show(5)
    lap("asof")

    println("[smoke] binned range join (events inside view windows):")
    val iv = evts.where(col("event_type") === "view")
      .select(col("event_id").as("iv_id"), col("user_id"),
              col("ts_ms").as("s_ms"), (col("ts_ms") + 600000L).as("e_ms"))
    graft.operators.Relational.rangeJoinBinned(probe, "ts_ms", iv,
        "s_ms", "e_ms", keyCol = Some("user_id"), binWidth = 600000L)
      .select("event_id", "iv_id").show(5)
    lap("range")

    println("[smoke] packing offsets + hash split + contamination:")
    TextAnalysis.packingOffsets(docs, "doc_id", "text", seqLen = 2048L).show(3)
    graft.operators.Sampling.hashSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().show()
    TextAnalysis.contamination(docs.where(col("doc_id") >= 10), "text",
        docs.where(col("doc_id") < 10), "doc_id", "text").show(3)
    graft.operators.Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.3)).groupBy("lang").count().show()
    lap("curation")

    println("[smoke] transitive dup clusters (connected components):")
    val ccPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
    Dedup.connectedComponents(docs, ccPairs, "doc_id")
      .where(col("doc_id") =!= col("cluster_id")).show(5)
    lap("clusters")

    println("[smoke] duplicate spans (exact substring dedup, merged):")
    Dedup.duplicateSpans(docs, "doc_id", "text", n = 10).show(5)
    lap("spans")

    println("[smoke] temperature mixture + tf-idf top terms:")
    graft.operators.Sampling.temperatureMixture(docs, "source", "doc_id",
        targetRows = 50L).groupBy("source").count().show()
    TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3).show(6)
    lap("mixture+tfidf")

    println("[smoke] forward as-of + batch twin of the stream interval join:")
    graft.operators.Relational.asofJoin(probe, changelog, "user_id", "ts_ms",
        Seq("v"), direction = "forward").show(3)
    graft.streaming.StreamJoins.intervalJoin(
        probe.select(col("user_id"), col("event_id").as("p_id"),
          timestamp_millis(col("ts_ms")).as("p_ts")), "p_ts", "30 minutes",
        evts.where(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("v_id"),
            timestamp_millis(col("ts_ms")).as("v_ts")), "v_ts", "30 minutes",
        "user_id", -1800000L, 0L)
      .select("p_id", "v_id").show(3)
    lap("asof-fwd+interval")

    println("[smoke] round-6 additions: cap/classifier/LM/kmeans/winnow:")
    graft.operators.Sampling.capPerGroup(docs, "source", 3,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .groupBy("source").count().show(3)
    TextAnalysis.classifierScore(docs, "doc_id", "text",
        TextAnalysis.fixedClassifierWeights(64), bias = 5L)
      .groupBy("label").count().show()
    TextAnalysis.lmScore(docs, "doc_id", "text").show(3)
    graft.operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
        k = 4, iters = 2, dim = 64)
      .groupBy("cluster").count().show()
    TextAnalysis.winnowFingerprints(docs, "doc_id", "text").show(3)
    Dedup.winnowOverlapPairs(docs, "doc_id", "text", minShared = 1L).show(3)
    TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .groupBy("bucket_label").count().show()
    TextAnalysis.packManifest(docs, "doc_id", "text", seqLen = 512L).show(3)
    TextAnalysis.chunkManifest(docs, "doc_id", "text",
      chunkTokens = 16, strideTokens = 8).show(3)
    graft.operators.Sampling.weightedSample(docs, "doc_id",
        TF.qualityScore(col("text")).cast("long") * 1200L)
      .agg(count(lit(1)).as("weighted_sample_kept")).show()
    Dedup.snapshotDiff(docs.where(col("doc_id") < 40),
        docs.where(col("doc_id") >= 20), "doc_id", "text")
      .groupBy("status").count().show()
    Dedup.lineSurvivors(
        docs.groupBy(expr("doc_id DIV 5").as("page_id"))
          .agg(concat_ws("\n", lit("shared banner"),
            array_join(transform(sort_array(collect_list(
              struct(col("doc_id"), col("text")))),
              e => e.getField("text")), "\n")).as("page_text")),
        "page_id", "page_text")
      .agg(sum("n_lines_cut").as("lines_cut"),
           sum("n_lines_kept").as("lines_kept")).show()
    locally { // crawl-ingestion dedup loop: 3 batches against the growing index
      val bs = Seq(docs.where(col("doc_id") < 20),
        docs.where(col("doc_id") >= 20 && col("doc_id") < 40),
        docs.where(col("doc_id") >= 40))
      Dedup.dedupIngest(bs, "doc_id", "text",
          "graft_smoke_ingest", "/tmp/graft_smoke_ingest")
        .agg(count(lit(1)).as("ingest_survivors")).show()
    }
    Dedup.clusterSurvivors(docs,
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          numHashes = 128, bands = 16, threshold = 0.4), "doc_id")
      .agg(count(lit(1)).as("survivors"), sum("n_members").as("covered")).show()
    TextAnalysis.decontaminateReport(
        docs.where(col("doc_id") >= 20), "doc_id", "text",
        docs.where(col("doc_id") < 20), "text",
        estimatedBenchShingles = 20000L, numBits = 160000L)
      .groupBy("contaminated").count().show()
    // the composed curation pipeline: gopher → normalized dedup → cap
    TextAnalysis.curationPipeline(docs, "doc_id", "text",
        groupCol = "source", sizeCol = "n_chars",
        minScore = 450L, langs = Seq("en", "fr"),
        maxDupPpm = 120000L, maxTopPpm = 60000L, maxPerGroup = 25)
      .groupBy("source").count().show(3)
    println("[smoke] prefix-filtered exact jaccard + source overlap matrix:")
    val prefPairs = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      threshold = 0.4)
    prefPairs.agg(count(lit(1)).as("prefix_pairs")).show()
    Dedup.sourceOverlapMatrix(docs, prefPairs, "doc_id", "source")
      .orderBy(desc("n_pairs")).show(5)
    println("[smoke] embedding QA report:")
    Similarity.embeddingQa(emb, "embedding", dim = 64, "label")
      .orderBy("label").show(3)
    println("[smoke] BPE vocabulary induction (merge table):")
    TextAnalysis.bpeMerges(docs, "text", numMerges = 4).orderBy("rank").show()
    println("[smoke] BPE application (encode with the learned merges):")
    TextAnalysis.bpeEncode(docs, "doc_id", "text", numMerges = 4)
      .orderBy("doc_id").show(3)
    println("[smoke] Count-Min heavy hitters (sketch est vs exact):")
    TextAnalysis.heavyHitters(docs, "text", depth = 4, width = 32,
        minCount = 20L)
      .orderBy(desc("n_exact")).show(5)
    println("[smoke] HLL shingle cardinality (registers + raw estimate):")
    TextAnalysis.hllCardinality(docs, "text", p = 8, "lang")
      .orderBy("lang").show(5)
    println("[smoke] PageRank over the near-dup candidate graph (top hubs):")
    Graph.pageRank(
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 128,
            bands = 16, threshold = 0.4).select("id_a", "id_b"),
        "id_a", "id_b", iters = 5)
      .orderBy(desc("rank")).show(5)
    println("[smoke] incremental embedding dedup (batch vs accepted corpus):")
    Dedup.incrementalEmbedSurvivors(
        emb.where(col("vec_id") < 30), emb.where(col("vec_id") >= 30),
        "vec_id", "embedding", threshold = 0.4)
      .agg(count(lit(1)).as("embed_ingest_survivors")).show()
    println("[smoke] IVF epsilon-ball search (cosine >= 0.25):")
    Similarity.ivfRangeSearch(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", minCosine = 0.25, nCentroids = 8, nProbe = 4)
      .groupBy("qid").count().orderBy("qid").show()
    lap("round6-ops")

    println("[smoke] round-8 additions: epoch plan + image headers + gzip decode oracle:")
    graft.operators.Sampling.epochPlan(docs, "source",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"),
        budgetTokens = 50000L)
      .orderBy(desc("avail_tokens")).show(3)
    graft.operators.Multimodal.imageHeaders(
        spark.read.format("binaryFile")
          .load(new java.io.File("fixtures/images").getAbsolutePath))
      .orderBy("name").show()
    lap("round8-ops")

    println("[smoke] behavioral analytics: funnel + retention + salted join:")
    val evms = graft.functions.EventTime.withEpochMs(
      spark.read.parquet(s"$sf/events.parquet"))
    graft.operators.Analytics.funnel(evms, "user_id", "event_type", "ts_ms",
      Seq("signup", "view", "click", "purchase"),
      windowMs = Some(7L * 86400000L)).show()
    graft.operators.Analytics.retention(evms, "user_id", "ts_ms").show(5)
    graft.operators.Analytics.saltedJoin(evms,
        spark.read.parquet(s"$sf/customer.parquet")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        "user_id", nSalts = 8, saltSrc = col("event_id"))
      .groupBy("c_mktsegment").count().orderBy("c_mktsegment").show()
    graft.operators.Analytics.madOutliers(
      evms.select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")),
      "event_type", "cents", nMads = 3.0).show(3)
    TextAnalysis.vocabCoverage(docs, "text", Seq(100, 1000)).show()
    println("[smoke] approximate k-NN graph (IVF-blocked, all nodes):")
    Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      centroidsOverride = Some(Similarity.fixedCentroids(16, 64))).show(5)
    lap("analytics")

    println("[smoke] round-9 additions: k-core + int8 quant QA + language mixture:")
    Graph.kCore(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.4, maxDocFreq = Long.MaxValue)
          .select("id_a", "id_b"),
        "id_a", "id_b", k = 2).orderBy("id").show(5)
    Similarity.int8QuantReport(emb, "vec_id", "embedding").show(3)
    TextAnalysis.langMixtureReport(docs, "doc_id", "text")
      .where(col("mixed")).show(3)
    Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text").show(3)
    TextAnalysis.calibratedQualityFilter(docs, "doc_id", "text", "lang")
      .where(!col("kept")).show(3)
    graft.operators.Analytics.holtSmoothing(
      evts.groupBy(col("event_type"), expr("ts_ms DIV 3600000").as("hour"))
        .agg(count(lit(1)).as("y")),
      "event_type", "hour", "y").show()
    graft.operators.Analytics.winsorizedReport(
      evts.selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c"),
      "event_type", "c").show()
    TextAnalysis.ngramNovelty(docs, "doc_id", "text")
      .orderBy(col("novelty_ppm")).show(3)
    Dedup.weightedMinhashPairs(docs, "doc_id", "text", threshold = 0.3).show(3)
    TextAnalysis.bpeFertility(docs, "doc_id", "text", "lang", numMerges = 8)
      .show()
    lap("round-9")

    println("[smoke] round-9 third sweep: masking plans + A/B + filtered ANN + CUSUM:")
    TextAnalysis.mlmMaskPlan(docs, "doc_id", "text").show(3)
    TextAnalysis.spanCorruptionPlan(docs, "doc_id", "text").show(3)
    TextAnalysis.featureHashing(docs, "doc_id", "text").show(3)
    graft.operators.Graph.linkPrediction(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.4, maxDocFreq = Long.MaxValue)
          .select("id_a", "id_b"),
        "id_a", "id_b").show(3)
    graft.operators.Analytics.abTestReport(
      evts.selectExpr("user_id", "event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c"),
      "user_id", "event_type", "c", "purchase").show()
    graft.operators.Analytics.cusumChangepoints(
      evts.groupBy(col("event_type"), expr("ts_ms DIV 3600000").as("hour"))
        .agg(count(lit(1)).as("y")),
      "event_type", "hour", "y").show()
    val fq = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    Similarity.filteredTopK(emb, "vec_id", "embedding", "label",
      fq, "qid", "qvec", "qlabel", k = 3).show(3)
    Similarity.hammingTopK(emb, "vec_id", "embedding",
      fq.drop("qlabel"), "qid", "qvec", dim = 64, k = 3).show(3)
    Similarity.centroidClassifierConfusion(emb, "vec_id", "embedding",
      "label").orderBy("label", "pred").show(3)
    println("[smoke] plan/apply pairs: denoising inputs+targets, masked corpus, packed windows:")
    TextAnalysis.spanCorruptionApply(docs, "doc_id", "text").show(2, truncate = 60)
    TextAnalysis.mlmMaskApply(docs, "doc_id", "text").show(2, truncate = 60)
    TextAnalysis.packApply(docs, "doc_id", "text", seqLen = 512L).show(3)
    lap("round-9c")

    println("[smoke] round-9 fourth sweep: unigram tokenizer + basket rules + graph walks:")
    TextAnalysis.unigramVocab(docs, "text", vocabSize = 32).show(5)
    TextAnalysis.unigramEncode(docs, "doc_id", "text", vocabSize = 32).show(3)
    TextAnalysis.unigramFertility(docs, "text", "lang", vocabSize = 32).show(3)
    Similarity.pcaTopComponent(emb, "embedding", dim = 64).show(3)
    TextAnalysis.cmsProbeVerify(TextAnalysis.cmsTokens(docs, "text"),
      TextAnalysis.cmsSketch(TextAnalysis.cmsTokens(docs, "text"),
        depth = 4, width = 32), depth = 4, width = 32, minCount = 20L)
      .show(3)
    graft.operators.Analytics.basketRules(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      "l_orderkey", "l_partkey", minItemSupport = 2L, minPairSupport = 1L,
      topN = 5).show()
    locally {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          numHashes = 128, bands = 16, threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      graft.operators.Graph.hits(pairs, "id_a", "id_b", rounds = 2).show(3)
      graft.operators.Graph.bfsDistances(pairs, "id_a", "id_b",
        pairs.select(col("id_a").as("id")).limit(2), maxHops = 2).show(3)
      graft.operators.Graph.landmarkEstimate(pairs, "id_a", "id_b",
        graft.operators.Graph.landmarkDistances(pairs, "id_a", "id_b",
          pairs.select(col("id_a").as("id")).limit(2), maxHops = 2)).show(3)
    }
    lap("round-9d")

    println("[smoke] round-11: quantile sketch + indexed IVF + decoded-pixel dHash:")
    TextAnalysis.lengthSketch(docs, "doc_id", "text", k = 64, "lang").show(3)
    TextAnalysis.lengthSketchRollup(docs, "doc_id", "text", k = 64,
      fineCol = "source", coarseCol = "lang").show(3)
    locally {
      val cents = Similarity.fixedCentroids(16, 64)
      val idx = graft.operators.Relational.bucketMaterialize(
        Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents),
        "graft_b_ivf_smoke", "cluster", 4,
        s"${graft.util.Scratch.base}/graft_bucketed_smoke/ivf")
      Similarity.ivfTopKIndexed(idx,
        emb.where(col("vec_id") < 2)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", cents, k = 3, nProbe = 4).show(3)
    }
    locally {
      import spark.implicits._
      val imgs = new java.io.File("fixtures/images").listFiles()
        .filter(_.getName.endsWith(".png")).sortBy(_.getName).take(2)
        .zipWithIndex
        .map { case (f, i) =>
          (i.toLong, java.nio.file.Files.readAllBytes(f.toPath)) }
        .toSeq.toDF("id", "payload")
      Multimodal.perceptualHash(imgs).show()
    }
    Multimodal.wavFrames(
      spark.read.format("binaryFile")
        .load(new java.io.File("fixtures/audio").getAbsolutePath)).show()
    TextAnalysis.fimTransform(docs, "doc_id", "text").show(3, truncate = 50)
    lap("round-11")

    println("[smoke] round-12: rendered real-pixel corpus + audio fingerprint + live IVF probe:")
    locally {
      import spark.implicits._
      val ids = (0L until 10L).toDF("doc_id")
      // real PNG render -> real ImageIO decode, hashes vs the formula
      Multimodal.perceptualHash(Multimodal.renderedImagePayloads(ids, "doc_id"))
        .show(5)
      // mixed-codec corpus: the corrupt row must be a NULL hash, not a kill
      Multimodal.perceptualHash(Multimodal.renderedMixedPayloads(
        (0L until 20L).toDF("doc_id"), "doc_id")).where(col("phash").isNull).show()
      // real javax.sound WAVs -> byte-level PCM decode -> lag-energy code
      Multimodal.audioFingerprint(Multimodal.renderedAudioPayloads(ids, "doc_id"))
        .show(5)
      Multimodal.audioNearDup(
        Multimodal.renderedAudioPayloads(ids, "doc_id"), maxHamming = 3).show(5)
    }
    println("[smoke] round-12b: real AVI container walk + per-frame dHash + majority code:")
    locally {
      import spark.implicits._
      val ids = (0L until 10L).toDF("doc_id")
      val vids = Multimodal.renderedVideoPayloads(ids, "doc_id", truncateMod = 11L)
      Multimodal.videoMeta(vids).show(5)
      Multimodal.videoFrameHashes(vids).show(5)
      Multimodal.videoFingerprint(vids).show(5)
      Multimodal.videoNearDup(vids, maxHamming = 3).show(5)
      Multimodal.videoSharedFrames(
        Multimodal.renderedVideoPayloads((0L until 10L).toDF("doc_id"),
          "doc_id"), minShared = 2).show(5)
      // ingest router over the all-formats mixed corpus
      Multimodal.sniff(Multimodal.renderedSniffPayloads(
        (0L until 14L).toDF("doc_id"), "doc_id")).show(14)
      // sentence manifest + ingest-QA profile
      graft.operators.TextAnalysis.sentenceManifest(
        docs.limit(3).select(col("doc_id"),
          concat(col("text"), lit(". tail! end")).as("text")),
        "doc_id", "text").show(5, truncate = 40)
      graft.operators.Relational.profileTable(docs.limit(100), Seq(
        "doc_id" -> col("doc_id"), "lang" -> col("lang"))).show()
      // unicode canonicalization + markup extraction over doctored docs
      graft.functions.GraftFunctionRegistry.ensureRegistered(spark)
      docs.limit(3).select(
          graft.functions.UnicodeFunctions.nfc(
            regexp_replace(col("text"), "e", "é")).as("nfc"),
          graft.functions.MarkupFunctions.htmlText(
            concat(lit("<p>"), col("text"), lit("</p><script>x()</script>")))
            .as("clean"))
        .show(3, truncate = 40)
    }
    lap("round-12")

    println("[smoke] round-13: MJPEG decode + composed ingest DAG + fingerprint index:")
    locally {
      import spark.implicits._
      val ids = (0L until 20L).toDF("doc_id")
      // 'MJPG' containers: real ImageIO JPEG decode per frame, one-scan
      // decode report (corrupt frame -> dropped, never a task kill)
      Multimodal.videoDecodeReport(
        Multimodal.renderedMjpegPayloads(ids, "doc_id", corruptMod = 9L))
        .show(5)
      // the composed DAG: mixed corpus -> sniff-route -> decode once ->
      // family-keyed unified near-dup -> curation data card
      val (card, pairs) = Multimodal.ingestPipeline(
        Multimodal.renderedIngestPayloads((0L until 40L).toDF("doc_id"), "doc_id"))
      card.orderBy("family").show()
      pairs.show(5)
      // fingerprint ingest loop over the persisted fragment-bucketed index
      val fp = Multimodal.perceptualHash(
          Multimodal.renderedImagePayloads(ids, "doc_id"))
        .select(col("id"), col("phash").as("sh"))
      graft.operators.Dedup.hammingIngest(
        Seq(fp.where(col("id") < 8), fp.where(col("id") >= 8)),
        "graft_b_smoke_mmingest",
        s"${graft.util.Scratch.base}/graft_bucketed_smoke/mmingest",
        maxHamming = 3).show(5)
    }
    lap("round-13")

    println("[smoke] round-14: config-declared ingest DAG + native BPE + index compaction:")
    locally {
      import spark.implicits._
      val work = java.nio.file.Files.createTempDirectory("graft-smoke-r14")
      // two payload batches on disk, then the flagship DAG booted from
      // HOCON ONLY: fqcn payload source -> mm-ingest sink (exactly-once
      // epoch layout, auto-initialized index)
      Seq(0L until 10L, 10L until 20L).zipWithIndex.foreach { case (r, i) =>
        val part = work.resolve(s"b$i")
        Multimodal.renderedIngestPayloads(
          spark.range(r.start, r.end).toDF("doc_id"), "doc_id")
          .coalesce(1).write.parquet(part.toString)
        val src = part.toFile.listFiles().find(_.getName.startsWith("part-")).get
        val dst = work.resolve("in").toFile
        dst.mkdirs()
        val f = new java.io.File(dst, f"b$i%02d.parquet")
        require(src.renameTo(f) && f.setLastModified(1700000000000L + i * 60000L))
      }
      val conf = graft.config.GraftConfig.parse(s"""
        graft {
          source { media { fqcn = "graft.tools.SmokePayloadSource",
                           path = "${work.resolve("in")}",
                           available-now = true, sinks = [ingest] } }
          sink { ingest { type = mm-ingest,
                          index-table = graft_smoke_cfg_mm,
                          index-path = "${work.resolve("idx")}",
                          out-path = "${work.resolve("out")}",
                          layout = gen, compact-every = 1 } }
        }""")
      val ps = graft.streaming.Pipeline.start(spark, conf,
        work.resolve("ck").toString)
      ps.foreach(_.query.awaitTermination())
      spark.read.parquet(work.resolve("out").toString)
        .orderBy("id").show(5)
      spark.sql("DROP TABLE IF EXISTS graft_smoke_cfg_mm")
      // native BPE at a beyond-gate merge count: one projection node
      graft.operators.TextAnalysis.bpeEncode(
        docs.limit(200), "doc_id", "text", numMerges = 64).show(3)
      // embedding ingest loop: persisted LSH index, accepted-so-far probes
      println("[smoke] embedding ingest loop (persisted LSH index):")
      val embBatches = Seq((0L, 150L), (150L, 400L), (400L, Long.MaxValue))
        .map { case (lo, hi) =>
          emb.where(col("vec_id") >= lo && col("vec_id") < hi)
            .select(col("vec_id").as("id"), col("embedding").as("vec")) }
      Dedup.embedIngest(embBatches, "graft_smoke_embingest",
        work.resolve("embidx").toString, buckets = 8, threshold = 0.25).show(5)
      spark.sql("DROP TABLE IF EXISTS graft_smoke_embingest")
    }
    lap("round-14")

    println("[smoke] SQL surface (graft_* functions via spark.sql):")
    graft.functions.GraftFunctionRegistry.ensureRegistered(spark)
    docs.limit(3).createOrReplaceTempView("smoke_docs")
    spark.sql("""SELECT doc_id, graft_rollhash(text) AS rh,
                        graft_simhash(graft_shingles(trim(regexp_replace(
                          regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
                          '\\s+', ' ')), 3)) AS sim
                 FROM smoke_docs""").show()
    lap("sql-surface")

    println("[smoke] cosine expression plan (codegen check):")
    emb.limit(1).select(VF.cosineSim(col("embedding"), col("embedding")).as("c"))
      .explain("codegen")

    spark.stop()
    println("[smoke] DONE")
  }
}

/** FQCN payload source for the round-14 smoke: a `(id, payload)` parquet
  * stream as Events — payload base64 in the body, id in a header (the
  * [[graft.streaming.MmIngestSink]] default projection). */
class SmokePayloadSource(cfg: graft.config.GraftConfig)
    extends graft.streaming.SourcePlugin {
  override def build(spark: org.apache.spark.sql.SparkSession,
                     sc: graft.config.GraftConfig)
      : org.apache.spark.sql.Dataset[graft.event.Event] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    implicit val enc = org.apache.spark.sql.Encoders.product[graft.event.Event]
    spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
                             StructField("payload", BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(sc.getString("path"))
      .select(base64(col("payload")).as("body"),
              map(lit("id"), col("id").cast("string")).as("headers"))
      .as[graft.event.Event]
  }
}
