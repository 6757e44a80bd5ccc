package graft

import org.apache.spark.sql.functions._

import graft.llm.{Classifier, Curation, Dsir, Quantize, Similarity, Web}

/** Behavior of the round-9 training-data operators: URL canonicalization /
  * domain curation, int8 scalar quantization, the NB quality classifier,
  * and DSIR importance resampling. */
class TrainingDataOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- Web: URL canonicalization / dedup / domains ----

  test("canonicalizeUrl normalizes every declared noise class") {
    val cases = Seq(
      // scheme case + www + default port + tracking + fragment + trailing /
      ("HTTPS://www.News.Example.com:443/a/b/?utm_source=x&utm_campaign=y#frag",
        "https://news.example.com/a/b"),
      // real param survives tracking-param removal
      ("https://example.com/p/?utm_source=f&utm_campaign=c2&id=7",
        "https://example.com/p?id=7"),
      ("http://site.org:80/x/", "http://site.org/x"),
      ("https://example.com/q?fbclid=abc&gclid=def", "https://example.com/q"),
      // already canonical stays fixed
      ("https://example.com/a?id=1", "https://example.com/a?id=1"))
    val out = cases.map(_._1).toDF("url")
      .select(Web.canonicalizeUrl(col("url"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) => assert(got == want, s"want $want got $got") }
  }

  test("urlDedup collapses canonical-equal URLs to the min-id keeper") {
    val df = Seq(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://www.a.com/x/"),
      (3L, "https://a.com/x?utm_source=t"),
      (4L, "https://a.com/y")).toDF("doc_id", "url")
    val out = Web.urlDedup(df).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("https://a.com/x", 1L, 3L), ("https://a.com/y", 4L, 1L)))
  }

  test("registrableDomain keeps the last two labels; domainStats blocks") {
    val hosts = Seq("a.b.example.com", "example.com", "localhost").toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect()
    assert(hosts.sameElements(Array("example.com", "example.com", "localhost")))
  }

  test("registrableDomain is public-suffix-aware for two-label suffixes") {
    // PSL hosts keep three labels (register under co.uk/com.au/co.jp...),
    // non-PSL hosts keep two, and a bare public suffix passes through
    val cases = Seq(
      "a.b.co.uk" -> "b.co.uk",
      "shop.example.co.uk" -> "example.co.uk",
      "news.example.com.au" -> "example.com.au",
      "x.y.co.jp" -> "y.co.jp",
      "sub.site.gob.mx" -> "site.gob.mx",
      "a.b.example.com" -> "example.com", // .com: last-two unchanged
      "example.co" -> "example.co",       // two labels, 'example.co' not a suffix
      "co.uk" -> "co.uk")                 // bare suffix: declared pass-through
    val out = cases.map(_._1).toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
    // PRIVATE-registry suffixes (PSL PRIVATE section, r11): platform
    // customer subdomains are independent registrants — two-label
    // (blogspot.com-class) and three-label (s3.amazonaws.com-class)
    val priv = Seq(
      "foo.blogspot.com" -> "foo.blogspot.com",
      "www.foo.blogspot.com" -> "foo.blogspot.com",
      "alice.github.io" -> "alice.github.io",
      "blogspot.com" -> "blogspot.com", // bare private suffix: pass-through
      "mybucket.s3.amazonaws.com" -> "mybucket.s3.amazonaws.com",
      "assets.mybucket.s3.amazonaws.com" -> "mybucket.s3.amazonaws.com",
      "s3.amazonaws.com" -> "amazonaws.com", // bare 3-label suffix: last-two fallback
      "www.amazonaws.com" -> "amazonaws.com")
    val privOut = priv.map(_._1).toDF("h")
      .select(Web.registrableDomain(col("h"))).as[String].collect()
    assert(privOut.toSeq == priv.map(_._2))
    val df = Seq(
      (1L, "https://spam.com/a", "x"),
      (2L, "https://spam.com/b", "yy"),
      (3L, "https://ok.com/a", "zzz")).toDF("doc_id", "url", "text")
    val stats = Web.domainStats(df, Seq("spam.com")).orderBy("domain").collect()
    assert(stats.map(_.getString(0)).sameElements(Array("ok.com", "spam.com")))
    assert(stats(1).getAs[Boolean]("blocked") && stats(1).getAs[Long]("n_kept") == 0L)
    assert(!stats(0).getAs[Boolean]("blocked") && stats(0).getAs[Long]("n_kept") == 1L)
    val kept = Web.filterBlockedDomains(df, Seq("spam.com")).select("doc_id").as[Long].collect()
    assert(kept.sameElements(Array(3L)))
  }

  test("curation funnel: domain blocklist stage runs first and gates the rest") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "https://good.com/1"),
      (2L, "the quick brown fox jumps over the lazy dog again", "https://bad.com/2"),
      (3L, "x", "https://good.com/3")) // fails the length stage
      .toDF("doc_id", "text", "url")
    val config = Curation.Config(blockDomains = Some(Seq("bad.com")), dedup = "none")
    val conds = Curation.stageConditions(config)
    assert(conds.head._1 == "domain" && conds.map(_._1).containsSlice(Seq("length", "quality")))
    val kept = Curation.curate(docs, config, urlCol = Some("url"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val rep = Curation.report(docs, config, urlCol = Some("url")).collect().head
    assert(rep.getAs[Long]("total") == 3L)
    assert(rep.getAs[Long]("after_domain") == 2L)
    assert(rep.getAs[Long]("after_length") == 1L)
  }

  // ---- Quantize: int8 scalar quantization ----

  private lazy val vecs = {
    // deterministic pseudo-random vectors, dim 8
    val rows = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 31 + d * 7).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("int8 codes are in range; dequantized error is within half a step") {
    val rg = Quantize.trainRanges(vecs)
    assert(rg.dim == 8)
    val codes = Quantize.encode(vecs, rg).select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= 0 && c <= 255)))
    val par = Quantize.parity(vecs, rg).collect()
    val maxStep = (0 until 8).map(d => (rg.vmax(d) - rg.vmin(d)) / 255.0 / 2.0).max
    par.foreach { r =>
      assert(r.getAs[Double]("max_abs_err") <= maxStep + 1e-6)
      assert(r.getAs[Double]("cosine_parity") > 0.999)
    }
  }

  test("degenerate dimension codes to 0 and reconstructs exactly") {
    val df = Seq((1L, Array(1.0f, 5.0f)), (2L, Array(2.0f, 5.0f))).toDF("vec_id", "embedding")
    val rg = Quantize.trainRanges(df)
    val codes = Quantize.encode(df, rg).select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.apply(1) == 0))
    val deq = Quantize.dequantize(Quantize.encode(df, rg), rg)
      .select("dequant").as[Seq[Double]].collect()
    assert(deq.forall(v => math.abs(v(1) - 5.0) < 1e-12))
  }

  test("int8 top-k recall vs float brute force is high") {
    val rg = Quantize.trainRanges(vecs)
    val queries = vecs.filter(col("vec_id") < 5)
    val dvecs = vecs.withColumn("embedding", col("embedding").cast("array<double>"))
    val exact = Similarity.bruteForceTopK(
        dvecs.filter(col("vec_id") < 5), dvecs, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val int8 = Quantize.int8TopK(queries, vecs, rg, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = exact.map { case (q, e) =>
      val got = int8.getOrElse(q, Array.empty).map(_._2).toSet
      e.count(p => got.contains(p._2)).toDouble / e.length
    }
    assert(recalls.sum / recalls.size >= 0.9, s"mean recall ${recalls.sum / recalls.size}")
  }

  // ---- Classifier: NB quality ----

  test("NB classifier separates disjoint vocabularies and handles OOV") {
    // 6 words per doc in BOTH classes → equal token totals → the OOV
    // log-odds is exactly 0, which the all-OOV doc below relies on
    val good = (0 until 10).map(i => (i.toLong, true, "excellent prose with careful thoughtful editing"))
    val bad = (10 until 20).map(i => (i.toLong, false, "spam click buy cheap now offer"))
    val train = (good ++ bad).toDF("doc_id", "label", "text")
      .select(col("label"), col("text"))
    val model = Classifier.nbTrain(train)
    val test_ = Seq(
      (100L, "careful thoughtful prose"),
      (101L, "buy cheap spam offer"),
      (102L, "zzz qqq www")) // all OOV → prior (equal classes) + symmetric OOV = 0 → not > 0
      .toDF("doc_id", "text")
    val out = Classifier.nbScore(test_, model).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("pred_quality"))
    assert(!out(1).getAs[Boolean]("pred_quality"))
    assert(math.abs(out(2).getAs[Double]("nb_score")) < 1e-6) // symmetric counts → 0
  }

  test("nbScoreColumn (row-local kernel) equals nbScore (join form)") {
    val labeled = ((0 until 8).map(i => (true, s"alpha beta gamma delta run $i")) ++
      (0 until 8).map(i => (false, s"omega psi chi phi stop $i"))).toDF("label", "text")
    val model = Classifier.nbTrain(labeled)
    val docs = Seq((1L, "alpha beta unknown"), (2L, "omega psi chi"), (3L, "  padded  "))
      .toDF("doc_id", "text")
    val joinForm = Classifier.nbScore(docs, model).orderBy("doc_id")
      .select("doc_id", "nb_score").as[(Long, Double)].collect()
    val kernelForm = docs
      .withColumn("nb_score", Classifier.nbScoreColumn(model, col("text")))
      .orderBy("doc_id").select("doc_id", "nb_score").as[(Long, Double)].collect()
    assert(joinForm.sameElements(kernelForm),
      s"join=${joinForm.mkString(",")} kernel=${kernelForm.mkString(",")}")
  }

  test("curation funnel: classifier stage filters on the NB score") {
    val labeled = ((0 until 8).map(i => (true, s"careful thorough writing with clear structure $i")) ++
      (0 until 8).map(i => (false, s"buy cheap spam now click this offer $i"))).toDF("label", "text")
    val model = Classifier.nbTrain(labeled)
    val docs = Seq(
      (1L, "careful thorough writing with clear structure indeed"),
      (2L, "buy cheap spam now click this offer today")).toDF("doc_id", "text")
    val config = Curation.Config(minNbScore = Some(0.0), dedup = "none")
    assert(Curation.stageConditions(config).map(_._1).contains("classifier"))
    val kept = Curation.curate(docs, config, nbModel = Some(model))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept $kept")
  }

  // ---- DSIR ----

  // ---- Weighted sampling (A-ES) ----

  test("weighted sampling favors heavy rows, bounds ranks, reproduces exactly") {
    import graft.llm.Sampling
    val rows = (0 until 100).map(i => (i.toLong, "s", if (i == 0) 10000L else 1L))
    val df = rows.toDF("doc_id", "stratum", "w")
    def sample(seed: String) =
      Sampling.weightedSamplePerStratum(df, n = 10, "w", "stratum", seed)
        .select("doc_id").as[Long].collect()
    // doc 0's key ln(u)/10000 sits ~4 orders of magnitude above the rest —
    // it wins under any of these (fixed, deterministic) seeds
    Seq("a", "b", "c").foreach { seed =>
      assert(sample(seed).contains(0L), s"heavy row missing under seed $seed")
    }
    assert(sample("a").sameElements(sample("a")))
    val ranked = Sampling.weightedSamplePerStratum(df, n = 10, "w", "stratum", "a")
      .select("rank").as[Int].collect().sorted
    assert(ranked.sameElements(1 to 10))
    // per-stratum: two strata each keep their own n
    val two = df.withColumn("stratum", when(col("doc_id") % 2 === 0, "e").otherwise("o"))
    val counts = Sampling.weightedSamplePerStratum(two, n = 7, "w", "stratum", "a")
      .groupBy("stratum").count().orderBy("stratum").select("count").as[Long].collect()
    assert(counts.sameElements(Array(7L, 7L)))
  }

  test("featureBuckets emits one unigram per word + one bigram per pair, in range") {
    val out = Seq("alpha beta gamma", "", "solo").toDF("text")
      .select(Dsir.featureBuckets(col("text"), 1024)).as[Seq[Int]].collect()
    assert(out(0).length == 5) // 3 unigrams + 2 bigrams
    assert(out(1).isEmpty && out(2).length == 1)
    assert(out.flatten.forall(b => b >= 0 && b < 1024))
    // deterministic
    val again = Seq("alpha beta gamma").toDF("text")
      .select(Dsir.featureBuckets(col("text"), 1024)).as[Seq[Int]].collect()
    assert(again.head == out(0))
  }

  test("DSIR upweights target-like documents and resamples deterministically") {
    val target = (0 until 20).map(i => s"science physics research experiment method $i").toDF("text")
    val raw = ((0 until 20).map(i => (i.toLong, s"science physics research experiment method $i")) ++
      (100 until 120).map(i => (i.toLong, s"celebrity gossip fashion scandal rumor $i"))).toDF("doc_id", "text")
    val w = Dsir.logImportanceWeights(raw, target, buckets = 1024)
    val byId = w.collect().map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    val sciMean = (0 until 20).map(i => byId(i.toLong)).sum / 20
    val gossipMean = (100 until 120).map(i => byId(i.toLong)).sum / 20
    assert(sciMean > gossipMean + 1.0, s"sci $sciMean vs gossip $gossipMean")
    val s1 = Dsir.resampleTopN(w, n = 10, seed = "s").collect()
    val s2 = Dsir.resampleTopN(w, n = 10, seed = "s").collect()
    assert(s1.map(_.getLong(0)).sameElements(s2.map(_.getLong(0))))
    assert(s1.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10))
    // the importance weights dominate the Gumbel noise at this separation:
    // the resample should mostly pick target-like docs
    assert(s1.count(_.getLong(0) < 100) >= 8)
  }

  // ---- per-domain quota capping ----

  test("domainCap keeps at most cap docs per domain, deterministically") {
    val df = (1L to 20L).map { i =>
      (i, s"https://${if (i <= 12) "big" else "small"}.com/p$i")
    }.toDF("doc_id", "url")
    val out = Web.domainCap(df, cap = 3, seed = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("domain_rank")))
    assert(out.count(_._2 == "big.com") == 3)
    assert(out.count(_._2 == "small.com") == 3)
    assert(out.filter(_._2 == "big.com").map(_._3).sorted.sameElements(Array(1, 2, 3)))
    // reproducible: identical selection on a rerun
    val again = Web.domainCap(df, cap = 3, seed = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("domain_rank")))
    assert(out.toSet == again.toSet)
    // a different seed picks a different (still capped) subset in general
    val other = Web.domainCap(df, cap = 3, seed = "u").collect().map(_.getLong(0)).toSet
    assert(other.size == 6)
  }

  test("domainCap survivors are stable when OTHER domains grow") {
    val base = (1L to 10L).map(i => (i, s"https://a.com/p$i")).toDF("doc_id", "url")
    val grown = ((1L to 10L).map(i => (i, s"https://a.com/p$i")) ++
      (100L to 110L).map(i => (i, s"https://b.com/p$i"))).toDF("doc_id", "url")
    val keptBase = Web.domainCap(base, cap = 4, seed = "g")
      .filter(col("domain") === "a.com").collect().map(_.getLong(0)).toSet
    val keptGrown = Web.domainCap(grown, cap = 4, seed = "g")
      .filter(col("domain") === "a.com").collect().map(_.getLong(0)).toSet
    assert(keptBase == keptGrown)
  }

  // ---- PMI collocations ----

  test("pmiCollocations: hand-computed PMI on a tiny corpus") {
    import graft.llm.CorpusStats
    // unigrams x:3 y:3 (n=6); bigrams (x,y):3 (y,x):1 (n=4)
    val docs = Seq("x y x y", "x y").toDF("text")
    val out = CorpusStats.pmiCollocations(docs, minCount = 1, k = 10).collect()
    assert(out.length == 2)
    val top = out.head
    assert((top.getString(0), top.getString(1), top.getLong(2)) == ("x", "y", 3L))
    // pmi(x,y) = ln((3/4) / ((3/6)(3/6))) = ln 3
    assert(math.abs(top.getAs[Double]("pmi") - math.log(3.0)) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("pmi")) < 1e-5) // pmi(y,x) = ln 1 = 0
  }

  test("pmiCollocations: minCount prunes reported pairs but not the distribution") {
    import graft.llm.CorpusStats
    val docs = Seq("a b a b a b", "c d").toDF("text")
    val out = CorpusStats.pmiCollocations(docs, minCount = 2, k = 10).collect()
    // only (a,b) reported (count 3); (b,a)=2 also passes; (c,d)=1 pruned
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b"), ("b", "a")))
    // but n_bi still counts the pruned (c,d) pair: (a,b) pmi uses n_bi=6
    // unigrams: a:3 b:3 c:1 d:1 (n=8); pmi(a,b) = ln((3/6)/((3/8)(3/8)))
    val ab = out.find(r => r.getString(0) == "a").get
    assert(math.abs(ab.getAs[Double]("pmi") - math.log((3.0 / 6.0) / ((3.0 / 8.0) * (3.0 / 8.0)))) < 1e-5)
  }

  // ---- BPE tokenizer induction ----

  test("BPE trains the textbook merge sequence with pinned tie-breaks") {
    import graft.llm.Bpe
    // word freqs: aa:3, ab:2 → merge 1 = (a,a,3); then (a,b,2); then dry
    val docs = Seq("aa ab aa", "ab aa").toDF("text")
    val (merges, vocab) = Bpe.trainMerges(Bpe.wordFrequencies(docs), numMerges = 5)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "a", 3L), (2, "a", "b", 2L)))
    // final segmentation: both words are single symbols
    val segs = vocab.select("word", "s").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(segs("aa") == "aa" && segs("ab") == "ab")
  }

  test("BPE merge application is greedy left-to-right non-overlapping") {
    import graft.llm.Bpe
    // aaa: pairs (a,a)x2 → merge (a,a,2); greedy apply → [aa, a]; then
    // (aa,a,1) merges to [aaa]
    val docs = Seq("aaa").toDF("text")
    val (merges, _) = Bpe.trainMerges(Bpe.wordFrequencies(docs), numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("a", "a", 2L), ("aa", "a", 1L)))
  }

  test("incremental BPE trainer equals the full-recompute path merge-for-merge (r11)") {
    import graft.llm.Bpe
    // a corpus exercising every delta case: overlapping runs (greedy
    // left-to-right), ties on count (lexicographic tie-break), pairs whose
    // count DECAYS to zero mid-training (must leave the stats table),
    // words untouched by most merges, and early exhaustion
    val docs = Seq(
      "aaa aab abab banana banana apple",
      "aa ab ba nan apple apple",
      "xyz xyz q").toDF("text")
    for (n <- Seq(1, 3, 12)) {
      val (mFull, vFull) = Bpe.trainMerges(Bpe.wordFrequencies(docs), numMerges = n)
      val (mInc, vInc) = Bpe.trainMergesIncremental(Bpe.wordFrequencies(docs), numMerges = n)
      assert(mInc == mFull, s"merge sequences diverge at numMerges=$n")
      val fullSet = vFull.select("word", "freq", "s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val incSet = vInc.select("word", "freq", "s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(incSet == fullSet, s"final vocab state diverges at numMerges=$n")
    }
    // exhaustion parity: both stop after the same number of merges when
    // every word is a single symbol
    val tiny = Seq("ab ab").toDF("text")
    val (mf, _) = Bpe.trainMerges(Bpe.wordFrequencies(tiny), numMerges = 10)
    val (mi, _) = Bpe.trainMergesIncremental(Bpe.wordFrequencies(tiny), numMerges = 10)
    assert(mi == mf && mi.size == 1)
  }

  // ---- temperature mixture ----

  test("temperatureMixture keeps the scarcest stratum whole and flattens the head") {
    import graft.llm.Sampling
    val df = ((1L to 100L).map(i => (i, "en")) ++ (200L to 224L).map(i => (i, "zh")))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureMixture(df, alpha = 0.5, strataCol = "lang", seed = "t")
      .collect().map(r => (r.getLong(1), r.getString(0)))
    // n_min = 25: zh kept whole (thr = 1e6); en keeps floor(sqrt(25*100)) = 50
    // in expectation (hash draw — binomial(100, 0.5), allow 4 sigma)
    assert(out.count(_._2 == "zh") == 25)
    val en = out.count(_._2 == "en")
    assert(en >= 30 && en <= 70, s"en kept $en")
    // alpha = 1 is the identity mixture
    val all = Sampling.temperatureMixture(df, alpha = 1.0, strataCol = "lang", seed = "t")
    assert(all.count() == 125)
  }

  // ---- FIM split construction ----

  test("fimSplit partitions every document; non-FIM rows are degenerate splits") {
    import graft.llm.Examples
    val docs = (1L to 50L).map(i => (i, s"doc $i body " + ("x" * (i % 7).toInt))).toDF("doc_id", "text")
    val out = Examples.fimSplit(docs, fimRate = 0.5, seed = "f").collect()
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, fim) = (r.getLong(0), r.getBoolean(1))
      val (c1, c2) = (r.getInt(2), r.getInt(3))
      val (p, m, sfx) = (r.getString(4), r.getString(5), r.getString(6))
      val text = byId(id)
      assert(p + m + sfx == text, s"doc $id parts don't reassemble")
      assert(c1 >= 0 && c1 <= c2 && c2 <= text.length)
      if (!fim) assert(p.isEmpty && sfx.isEmpty && m == text)
    }
    assert(out.exists(_.getBoolean(1)) && out.exists(!_.getBoolean(1)))
    // rate 1.0 marks everything; rate 0.0 nothing; same seed reproduces
    assert(Examples.fimSplit(docs, 1.0, "f").collect().forall(_.getBoolean(1)))
    assert(Examples.fimSplit(docs, 0.0, "f").collect().forall(!_.getBoolean(1)))
    val again = Examples.fimSplit(docs, fimRate = 0.5, seed = "f").collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  // ---- shingle containment ----

  test("containmentVerify flags excerpts that Jaccard misses") {
    import graft.llm.Dedup
    val docs = Seq(
      (1L, "a b c d e f g h"), // source
      (2L, "a b c"), //           excerpt: containment_b = 1, jaccard = 3/8
      (3L, "x y z")) //           unrelated
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.containmentVerify(cands, docs, k = 1, threshold = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(math.abs(r.getAs[Double]("containment_b") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("containment_a") - 3.0 / 8.0) < 1e-9)
    // the same pair FAILS a 0.7 Jaccard verify — the excerpt blind spot
    assert(Dedup.jaccardVerify(cands, docs, k = 1, threshold = 0.7).count() == 0)
  }

  // ---- bigram Kneser-Ney LM ----

  test("bigramScore: hand-computed interpolated-KN probabilities") {
    import graft.llm.CorpusStats
    // refs: pairs (a,b):2, (a,c):1 → B=2, V=3, h1(a)=3, f1(a)=2,
    // pc(b)=pc(c)=(1+1)/5=0.4, floor=0.2
    val refs = Seq("a b", "a b", "a c").toDF("text")
    val lm = CorpusStats.bigramLm(refs)
    assert(math.abs(lm.contFloor - 0.2) < 1e-12)
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a a"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramScore(docs, lm).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("bits_per_bigram")))
    val ln2 = math.log(2.0)
    def bits(p: Double) = -math.log(p) / ln2
    // p(b|a) = (2-0.75 + 0.75*2*0.4)/3; p(c|unseen-history b) = pc(c);
    // p(a|a) = (0 + 0.75*2*0.2)/3 — and the three p(·|a) sum to 1
    assert(out.map(_._1).sameElements(Array(1L, 2L, 3L))) // doc 4: no bigrams
    assert(math.abs(out(0)._3 - bits(1.85 / 3)) < 1e-5)
    assert(math.abs(out(1)._3 - bits(0.4)) < 1e-5)
    assert(math.abs(out(2)._3 - bits(0.1)) < 1e-5)
    assert(math.abs((1.85 / 3) + (0.85 / 3) + 0.1 - 1.0) < 1e-12) // normalization
  }

  // ---- perceptual-hash media dedup ----

  test("mediaNearDedup collapses single-edit payloads onto their source") {
    import graft.llm.Multimodal
    val base = (1L to 30L).map(i =>
      (i, (0 until 60).map(j => (i * 37 + j * 13) % 97).mkString(" "))).toDF("asset_id", "text")
    val planted = base.filter(col("asset_id") % 5 === 0)
      .select((col("asset_id") + 1000L).as("asset_id"),
        concat(lit("z"), expr("substring(text, 2, length(text) - 1)")).as("text"))
    val media = base.unionByName(planted)
      .select(col("asset_id"), col("text").cast("binary").as("payload"))
    val kept = Multimodal.mediaNearDedup(media, maxHamming = 2)
      .select("asset_id").as[Long].collect().toSet
    assert((1L to 30L).forall(kept.contains), "a source document was dropped")
    assert(!(1L to 30L).filter(_ % 5 == 0).map(_ + 1000L).exists(kept.contains),
      "a planted single-edit near-dup survived")
    // the hash property behind the guarantee: a same-length single-char
    // edit flips at most one range parity → hamming ≤ 1
    val bands = media.select(col("asset_id"), Multimodal.perceptualHashBands(col("payload")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (1L to 30L).filter(_ % 5 == 0).foreach { i =>
      val hd = bands(i).zip(bands(i + 1000L))
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      assert(hd <= 1, s"asset $i: hamming $hd")
    }
  }

  // ---- T5 span corruption ----

  test("spanCorrupt masks non-overlapping spans that reassemble the document") {
    import graft.llm.Examples
    // word counts 0..10 — exercises empty, sub-nSpans, and regular docs
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 11).toInt).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val out = Examples.spanCorrupt(docs, nSpans = 2, meanSpanLen = 3, seed = "s")
      .collect().map(r => r.getLong(0) -> r).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 40L).foreach { id =>
      val r = out(id)
      val (corrupted, input, target) = (r.getBoolean(1), r.getString(2), r.getString(3))
      if (!corrupted) {
        assert(orig(id).split("\\s+").count(_.nonEmpty) < 2)
        assert(target.isEmpty && input == orig(id))
      } else {
        assert(input.contains("<extra_id_0>") && input.contains("<extra_id_1>"))
        // splice the target spans back into the sentinels → original text
        val parts = target.split("<extra_id_1>")
        val span0 = parts(0).replace("<extra_id_0>", "").trim
        val span1 = parts(1).trim
        assert(span0.nonEmpty && span1.nonEmpty)
        val rebuilt = input.replace("<extra_id_0>", span0).replace("<extra_id_1>", span1)
          .replaceAll("\\s+", " ").trim
        assert(rebuilt == orig(id), s"doc $id: $rebuilt != ${orig(id)}")
      }
    }
    // deterministic
    val again = Examples.spanCorrupt(docs, nSpans = 2, meanSpanLen = 3, seed = "s").collect()
    assert(again.map(_.toString).sorted.sameElements(
      out.values.map(_.toString).toArray.sorted))
  }

  // ---- entropy profile ----

  test("entropyProfile: uniform vocab hits ln V, degenerate vocab hits 0") {
    import graft.llm.CorpusStats
    val docs = Seq(("u", "a b c d"), ("d", "a a a a")).toDF("source", "text")
    val out = CorpusStats.entropyProfile(docs, strataCol = "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("unigram_entropy"))).toMap
    assert(out("u")._1 == 4L && out("u")._2 == 4L)
    assert(math.abs(out("u")._3 - math.log(4.0)) < 1e-5)
    assert(out("d")._1 == 4L && out("d")._2 == 1L && math.abs(out("d")._3) < 1e-9)
  }

  test("BPE differential: engine merges equal an independent in-memory reference") {
    import graft.llm.Bpe
    // reference implementation: plain Scala lists, no strings-with-wrappers,
    // no Spark — an independent code path for the same pinned semantics
    def refApply(seq: List[String], l: String, r: String): List[String] = seq match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refApply(rest, l, r)
      case a :: rest => a :: refApply(rest, l, r)
      case Nil => Nil
    }
    def refBpe(words: Map[String, Long], k: Int): List[(String, String, Long)] = {
      var segs = words.toList.map { case (w, f) => (w.toList.map(_.toString), f) }
      var out = List.empty[(String, String, Long)]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        segs.foreach { case (s, f) =>
          s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toList.minBy { case ((l, r), c) => (-c, l, r) }
          out :+= ((l, r, c))
          segs = segs.map { case (s, f) => (refApply(s, l, r), f) }
        }
      }
      out
    }
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      val words = (1 to (5 + rnd.nextInt(15))).map { _ =>
        (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val docs = words.mkString(" ") :: Nil
      val expected = refBpe(
        words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }, k = 6)
      val (merges, _) = Bpe.trainMerges(Bpe.wordFrequencies(docs.toDF("text")), numMerges = 6)
      assert(merges.map(m => (m.left, m.right, m.pairCount)) == expected,
        s"trial $trial diverged: corpus=${docs.head}")
    }
  }

  test("BPE encodeCounts segments the corpus with the trained vocab") {
    import graft.llm.Bpe
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.trainMerges(Bpe.wordFrequencies(docs.select(col("text"))), numMerges = 5)
    val out = Bpe.encodeCounts(docs, vocab).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every word collapsed to one token after full training
    assert(out.sameElements(Array((1L, 3L, 3L), (2L, 2L, 2L))))
    // with zero merges each word costs its char count
    val (_, vocab0) = Bpe.trainMerges(Bpe.wordFrequencies(docs.select(col("text"))), numMerges = 1)
    val out1 = Bpe.encodeCounts(docs, vocab0).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one merge (a,a): aa → 1 token, ab → 2 tokens
    assert(out1.sameElements(Array((1L, 3L, 4L), (2L, 2L, 3L))))
  }

  test("BPE vocabIds + encodeIds: deterministic ids, ordered sequences, OOV -1") {
    import graft.llm.Bpe
    val train = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainMerges(Bpe.wordFrequencies(train.select(col("text"))), numMerges = 5)
    val ids = Bpe.vocabIds(spark, merges, vocab)
    val idMap = ids.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alphabet sorted first (a=0, b=1), then merge products in rank order:
    // (a,a)→aa cnt 3·2? — corpus freq: aa×3, ab×2 → merges aa then aab? No:
    // pairs (a,a)=3 from 'aa', (a,b)=2 from 'ab' → merge1 aa, then (a,b)=2
    // → merge2 ab; no adjacent pairs remain
    assert(idMap("a") == 0L && idMap("b") == 1L)
    assert(idMap("aa") == 2L && idMap("ab") == 3L)
    val out = Bpe.encodeIds(
        Seq((10L, "aa ab zb")).toDF("doc_id", "text"), vocab, ids)
      .orderBy("word_idx", "tok_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // 'zb' is OOV: char-wise → z (never trained, id -1), b (alphabet, id 1)
    assert(out.sameElements(Array(
      (0L, 0L, "aa", 2L), (1L, 0L, "ab", 3L), (2L, 0L, "z", -1L), (2L, 1L, "b", 1L))))
  }

  test("packByTokenCounts packs by the provided counts column") {
    import graft.llm.Curation
    val counts = Seq((1L, 300L), (2L, 300L), (3L, 100L)).toDF("doc_id", "n_bpe_tokens")
    val out = Curation.packByTokenCounts(counts, seqLen = 512L, tokensCol = "n_bpe_tokens")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.sameElements(Array(
      (1L, 300L, 0L, 0L, 0L, 0L),      // tokens [0,300) → seq 0
      (2L, 300L, 300L, 0L, 1L, 300L),  // [300,600) straddles the 512 boundary
      (3L, 100L, 600L, 1L, 1L, 88L)))) // [600,700) inside seq 1
  }

  test("epochAllocation: over-budget strata repeat and cap, absent strata zero out") {
    import graft.llm.Sampling
    val df = (1 to 10).map(i => (i.toLong, "big")).toDF("doc_id", "s")
      .union((11 to 12).map(i => (i.toLong, "small")).toDF("doc_id", "s"))
    val out = Sampling.epochAllocation(df,
        targetsPpm = Seq("big" -> 400000L, "small" -> 500000L, "absent" -> 100000L),
        budget = 20L, maxEpochs = 3, strataCol = "s")
      .orderBy("s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // absent: target 2, zero capacity → nothing allocated, capped
    assert(out(0) == ("absent", 0L, 2L, 0L, 0L, 0L, true))
    // big: target 8 of 10 docs → a single partial pass, no repetition
    assert(out(1) == ("big", 10L, 8L, 8L, 0L, 8L, false))
    // small: target 10 > 2 docs × 3 epochs = 6 → capped at 3 full passes
    assert(out(2) == ("small", 2L, 10L, 6L, 3L, 0L, true))
  }

  test("nbCalibration: bins clamp, counts add up, separable corpus is monotone") {
    import graft.llm.Classifier
    // clearly separable vocab: "good" docs vs "junk" docs
    val labeled = Seq(
      (true, "good clean prose text"), (true, "good clean writing text"),
      (false, "junk spam noise blob"), (false, "junk spam garbage blob"))
      .toDF("label", "text")
    val model = Classifier.nbTrain(labeled)
    val docs = Seq(
      (1L, "good clean prose text", true), (2L, "junk spam noise blob", false),
      (3L, "good clean writing text", true), (4L, "junk spam garbage blob", false))
      .toDF("doc_id", "text", "label")
    val scored = Classifier.nbScore(docs.select(col("doc_id"), col("text")), model)
    val out = Classifier.nbCalibration(scored, docs.select(col("doc_id"), col("label")))
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // every doc lands in exactly one bin, bins within the clamp range
    assert(out.map(_._2).sum == 4 && out.forall(b => b._1 >= -10 && b._1 <= 10))
    // separable corpus: positive rate is 0 in every negative bin, 1 in
    // every positive bin (monotone reliability)
    out.foreach { case (bin, _, nPos, nPred, rate) =>
      if (bin < 0) assert(nPos == 0 && nPred == 0 && rate == 0.0)
      else assert(rate == 1.0 && nPred == nPos)
    }
  }

  test("lshCalibration: duplicate pairs land in the top bin; theory column is the S-curve") {
    import graft.llm.Dedup
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      (1L, base), (2L, base),                    // exact dup pair → jaccard 1.0 → bin 9
      (3L, "completely different words here about boats sailing across the wide open sea"))
      .toDF("doc_id", "text")
    val out = Dedup.lshCalibration(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the dup pair must be a candidate, land in bin 9, and pass the verify
    val top = out.find(_._1 == 9L).get
    assert(top._2 >= 1 && top._3 == top._2 && top._4 == 1.0)
    // theory: repeated-multiplication S-curve, monotone in s, near 0/1 ends
    val p = (0 to 9).map(b => Dedup.bandCollideProb(b / 10.0 + 0.05, 4, 8))
    assert(p.zip(p.tail).forall { case (a, b) => a < b })
    assert(p.head < 0.001 && p.last > 0.95)
  }

  test("encodeIds and encodeCounts agree: per-doc row count equals n_bpe_tokens") {
    import graft.llm.Bpe
    val docs = Seq(
      (1L, "aa ab ba baba"), (2L, "ab aa zz aa"), (3L, "qqq")).toDF("doc_id", "text")
    val train = Seq((0L, "aa ab aa ba ab")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainMerges(Bpe.wordFrequencies(train.select(col("text"))), numMerges = 4)
    val ids = Bpe.vocabIds(spark, merges, vocab)
    val fromIds = Bpe.encodeIds(docs, vocab, ids)
      .groupBy("doc_id").count().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fromCounts = Bpe.encodeCounts(docs, vocab).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(fromIds.sameElements(fromCounts)) // incl. OOV docs (zz, qqq)
  }

  test("packEmit reassembly: global stream equals per-doc sequences concatenated in doc order") {
    import graft.llm.{Bpe, Curation}
    val docs = Seq((1L, "aa ab"), (2L, "ba aa aa"), (3L, "ab ab ba")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainMerges(
      Bpe.wordFrequencies(docs.select(col("text"))), numMerges = 3)
    val ids = Bpe.vocabIds(spark, merges, vocab)
    val tok = Bpe.encodeIds(docs, vocab, ids)
    val counts = Bpe.encodeCounts(docs, vocab)
    val pack = Curation.packByTokenCounts(
      counts.select(col("doc_id"), col("n_bpe_tokens")), seqLen = 3L, tokensCol = "n_bpe_tokens")
    val emitted = Curation.packEmit(tok, pack, seqLen = 3L)
      .orderBy("seq_id", "pos_in_seq").collect()
      .map(r => (r.getLong(0) * 3L + r.getLong(1), r.getLong(2)))
    // global positions are a gapless 0..N-1 enumeration
    assert(emitted.map(_._1).toSeq == emitted.indices.map(_.toLong))
    // and the stream is exactly the per-doc token streams in doc order
    val expected = tok.orderBy("doc_id", "word_idx", "tok_idx")
      .select("token_id").collect().map(_.getLong(0)).toSeq
    assert(emitted.map(_._2).toSeq == expected)
  }

  test("packShards rolls emitted positions into ordered per-sequence id lists") {
    import graft.llm.Curation
    val tok = Seq(
      (1L, 0L, 0L, 10L), (1L, 0L, 1L, 11L), (1L, 1L, 0L, 12L),
      (2L, 0L, 0L, 20L), (2L, 1L, 0L, 21L))
      .toDF("doc_id", "word_idx", "tok_idx", "token_id")
    val counts = Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "n")
    val pack = Curation.packByTokenCounts(counts, seqLen = 4L, tokensCol = "n")
    val out = Curation.packShards(tok, pack, seqLen = 4L)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // seq 0 full (doc-1 tokens + doc-2's first), seq 1 the partial tail
    assert(out.sameElements(Array((0L, 4L, "10,11,12,20"), (1L, 1L, "21"))))
  }

  test("alignmentScores: identical pair scores 1, shifted-histogram caption fails threshold") {
    import graft.llm.Multimodal
    val media = Seq(
      (1L, "abc def".getBytes("UTF-8"), "abc def"),   // identical → cosine 1
      (2L, "abc def".getBytes("UTF-8"), "ABC DEF"),   // upper shifts buckets
      (3L, Array.emptyByteArray, "xyz"))              // zero vector → 0.0
      .toDF("asset_id", "payload", "caption")
    val out = Multimodal.alignmentScores(media, threshold = 0.9)
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(math.abs(out(0)._2 - 1.0) < 1e-9 && out(0)._3)
    assert(out(1)._2 < 0.9 && !out(1)._3)
    assert(out(2)._2 == 0.0 && !out(2)._3)
    // cosine is normalization-invariant: doubled payload = same score
    val doubled = Seq((1L, "abc defabc def".getBytes("UTF-8"), "abc def"))
      .toDF("asset_id", "payload", "caption")
    val d = Multimodal.alignmentScores(doubled, 0.9).collect()(0).getDouble(1)
    assert(math.abs(d - 1.0) < 1e-9)
  }

  test("packEmit places every token id at its global position across sequence boundaries") {
    import graft.llm.Curation
    // doc 1: 3 tokens [10,11,12] at gpos 0-2; doc 2: 2 tokens [20,21] at
    // gpos 3-4 — with seqLen=4 token 20 ends seq 0 and token 21 opens seq 1
    val tok = Seq(
      (1L, 0L, 0L, 10L), (1L, 0L, 1L, 11L), (1L, 1L, 0L, 12L),
      (2L, 0L, 0L, 20L), (2L, 1L, 0L, 21L))
      .toDF("doc_id", "word_idx", "tok_idx", "token_id")
    val counts = Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "n")
    val pack = Curation.packByTokenCounts(counts, seqLen = 4L, tokensCol = "n")
    val out = Curation.packEmit(tok, pack, seqLen = 4L)
      .orderBy("seq_id", "pos_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sameElements(Array(
      (0L, 0L, 10L, 1L), (0L, 1L, 11L, 1L), (0L, 2L, 12L, 1L),
      (0L, 3L, 20L, 2L), (1L, 0L, 21L, 2L))))
  }

  test("BPE encodeCounts: OOV words fall back to character-wise segmentation") {
    import graft.llm.Bpe
    val train = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.trainMerges(Bpe.wordFrequencies(train.select(col("text"))), numMerges = 5)
    // 'xyz' and 'qq' never appeared in training: no merges apply, so each
    // costs its char count — and the word still COUNTS toward n_words
    // (ADVICE r9: the old inner join silently dropped OOV rows)
    val newCorpus = Seq((10L, "aa xyz"), (11L, "qq")).toDF("doc_id", "text")
    val out = Bpe.encodeCounts(newCorpus, vocab).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(Array((10L, 2L, 4L), (11L, 1L, 2L))))
  }

  test("frameEnergies: ceil frame coverage, byte sums, tail partial frame") {
    import graft.llm.Multimodal
    // 5 bytes at frameBytes=2 → frames [1,2], [3,4], [5]
    val media = Seq((1L, Array[Byte](1, 2, 3, 4, 5))).toDF("asset_id", "payload")
    val out = Multimodal.frameEnergies(media, frameBytes = 2)
      .orderBy("frame_idx")
      .select("frame_idx", "energy").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L), (1L, 7L), (2L, 5L)))
    // empty payload → no frames
    assert(Multimodal.frameEnergies(
      Seq((2L, Array.emptyByteArray)).toDF("asset_id", "payload"), 2).count() == 0)
  }

  test("vadSegments: mean threshold, hangover bridges one silent frame, gaps split") {
    import graft.llm.Multimodal
    // frameBytes=1 → per-byte frames. Energies: 9 9 0 9 0 0 9 (mean 36/7≈5.14)
    // active: 0,1,3,6 — frames 0,1,3 merge (gap 2 ≤ hangover+1), 6 splits
    val media = Seq((1L, Array[Byte](9, 9, 0, 9, 0, 0, 9))).toDF("asset_id", "payload")
    val segs = Multimodal.vadSegments(media, frameBytes = 1, maxSilenceFrames = 1)
      .orderBy("seg_idx")
      .select("seg_idx", "start_frame", "end_frame", "n_active_frames")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(segs == Seq((0L, 0L, 3L, 3L), (1L, 6L, 6L, 1L)))
    // zero hangover: every silent frame splits
    val strict = Multimodal.vadSegments(media, frameBytes = 1, maxSilenceFrames = 0)
      .orderBy("seg_idx")
      .select("seg_idx", "start_frame", "end_frame").as[(Long, Long, Long)].collect().toSeq
    assert(strict == Seq((0L, 0L, 1L), (1L, 3L, 3L), (2L, 6L, 6L)))
  }

  test("wordpiece trainer ranks by likelihood gain, not raw count") {
    import graft.llm.{Bpe, Wordpiece}
    // 'er' is the most FREQUENT pair (30×) but both symbols are common
    // elsewhere; 'qu' co-occurs exclusively (q appears only before u) —
    // likelihood scoring must pick qu first, raw-count BPE picks er
    val docs = (
      Seq.fill(30)("er") ++ Seq.fill(20)("e") ++ Seq.fill(20)("r") ++
        Seq.fill(8)("qu")).map(Tuple1(_)).toDF("text")
    val wf = Bpe.wordFrequencies(docs)
    val (wp, _) = Wordpiece.trainMerges(wf, numMerges = 1)
    assert(wp.head.left == "q" && wp.head.right == "u", s"got ${wp.head}")
    val (bp, _) = Bpe.trainMerges(wf, numMerges = 1)
    assert(bp.head.left == "e" && bp.head.right == "r", s"got ${bp.head}")
    // score components recorded: cnt=8, count(q)=8, count(u)=8 → 0.125
    assert(wp.head.pairCount == 8L && math.abs(wp.head.score - 0.125) < 1e-12)
  }

  test("wordpiece MaxMatch encoding is greedy longest-match with char fallback") {
    import graft.llm.Wordpiece
    val ids = Seq(("a", 0L), ("b", 1L), ("c", 2L), ("ab", 3L), ("abc", 4L), ("bc", 5L))
      .toDF("token", "token_id")
    val docs = Seq((1L, "abcbc zzab ABCabc")).toDF("doc_id", "text")
    val out = Wordpiece.encodeIds(docs, ids)
      .orderBy("word_idx", "tok_idx")
      .select("word_idx", "tok_idx", "token", "token_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      // abcbc → abc + bc (longest first, never a+b+c)
      (0L, 0L, "abc", 4L), (0L, 1L, "bc", 5L),
      // zzab → z, z (fallback, id -1) + ab
      (1L, 0L, "z", -1L), (1L, 1L, "z", -1L), (1L, 2L, "ab", 3L),
      // lowercased: abcabc → abc + abc
      (2L, 0L, "abc", 4L), (2L, 1L, "abc", 4L)))
  }

  test("unigram viterbiSegment: exact DP semantics and tie-breaks") {
    import graft.llm.Unigram
    // concatenation invariant on any vocab covering all chars
    val probs = Map("a" -> 0.1, "b" -> 0.1, "c" -> 0.1, "ab" -> 0.2, "abc" -> 0.05, "bc" -> 0.3)
    for (w <- Seq("abc", "abcabc", "aabbcc", "cab"))
      assert(Unigram.viterbiSegment(w, probs).mkString == w)
    // argmax picks the higher-probability segmentation:
    // ab+c = 0.2*0.1 = 0.02, a+bc = 0.1*0.3 = 0.03, abc = 0.05 → abc wins
    assert(Unigram.viterbiSegment("abc", probs) == Seq("abc"))
    // without the whole-word token, a+bc (0.03) beats ab+c (0.02)
    assert(Unigram.viterbiSegment("abc", probs - "abc") == Seq("a", "bc"))
    // exact-tie: x+yz vs xy+z with equal products — longer LAST token wins
    // (the oracle's ORDER BY score DESC, l DESC)
    val tie = Map("x" -> 0.2, "y" -> 0.1, "z" -> 0.2, "xy" -> 0.2, "yz" -> 0.2)
    // x*yz = 0.04, xy*z = 0.04 → last token yz (l=2) preferred
    assert(Unigram.viterbiSegment("xyz", tie) == Seq("x", "yz"))
    // unreachable character → empty (the seed contract makes this
    // impossible in the gates; the kernel still fails closed)
    assert(Unigram.viterbiSegment("aqa", probs).isEmpty)
  }

  test("unigram train: single chars always survive; used multi tokens keep Laplace probs") {
    import graft.llm.Unigram
    val docs = Seq(
      (1L, "aba aba aba cc"),
      (2L, "aba cc cc")).toDF("doc_id", "text")
    val m = Unigram.train(spark, docs)
    val toks = m.vocab.map(_._1).toSet
    // every single char of kept words survives even if Viterbi never used it
    assert(Set("a", "b", "c").subsetOf(toks))
    // the dominant whole words are selected as multi-char tokens
    assert(toks.contains("aba") && toks.contains("cc"))
    // encode probs are Laplace over used counts: all positive, sum <= 1
    assert(m.encodeProbs.values.forall(_ > 0))
    // ids are dense 0..n-1 ordered by (used desc, token asc)
    assert(m.vocab.map(_._4).sorted == m.vocab.indices.map(_.toLong))
    // encoding reproduces the corpus words
    val enc = Unigram.encode(spark, docs, m)
      .groupBy("doc_id", "word_idx")
      .agg(concat_ws("", collect_list(col("token"))).as("w"))
      .select("w").as[String].collect().toSet
    assert(enc == Set("aba", "cc"))
  }
}
