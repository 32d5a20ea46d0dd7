package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token and subword counts") {
    val row = Seq("the quick brown fox!").toDF("text")
      .select(
        TextAnalysis.tokenCount($"text"),
        TextAnalysis.subwordCount($"text"))
      .as[(Long, Long)].head()
    // tokens: the, quick, brown, fox!  subwords: the|quic|k|brow|n|fox|!
    assert(row == ((4L, 7L)))
  }

  test("PII scrub: all three classes replaced, counted, idempotent, clean text untouched") {
    val dirty = "mail a@b.com or x.y_z+1@sub.domain.org call +1-555-0199 " +
      "from 10.0.255.3 and 192.168.1.200 done"
    val clean = "no pii here, just words and numbers like 1234 or 1.5"
    val got = Seq(dirty, clean).toDF("text").select(
      TextAnalysis.piiCount($"text", "email"),
      TextAnalysis.piiCount($"text", "phone"),
      TextAnalysis.piiCount($"text", "ip"),
      TextAnalysis.scrubPii($"text")).as[(Long, Long, Long, String)].collect()
    assert(got(0)._1 == 2 && got(0)._2 == 1 && got(0)._3 == 2)
    assert(got(0)._4 ==
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP> and <IP> done")
    assert(got(1) == ((0L, 0L, 0L, clean)), "clean text must pass unchanged")
    // idempotence: replacement tokens contain no digits/@, so a second
    // pass is a no-op
    val twice = Seq(dirty).toDF("text")
      .select(TextAnalysis.scrubPii(TextAnalysis.scrubPii($"text")))
      .as[String].head()
    assert(twice == got(0)._4)
    intercept[IllegalArgumentException] {
      TextAnalysis.piiCount($"text", "ssn")
    }
  }

  test("normalizedTokens case-folds and splits on punctuation") {
    val got = Seq("Word, word; WORD-2 done").toDF("text")
      .select(TextAnalysis.normalizedTokens($"text"))
      .as[Seq[String]].head()
    assert(got == Seq("word", "word", "word", "2", "done"))
  }

  test("wordNgrams keeps repeats; duplicateNgramFrac measures them") {
    val got = Seq(
      "a b a b a",    // bigrams: ab,ba,ab,ba → 4 total, 2 distinct → 0.5
      "a b c d",      // all distinct → 0.0
      "x x x x x",    // bigrams all 'x x' → 1 - 1/4 = 0.75
      "one"           // under n tokens → 0.0, empty ngrams
    ).toDF("text").select(
      TextAnalysis.wordNgrams($"text", 2),
      TextAnalysis.duplicateNgramFrac($"text", 2))
      .as[(Seq[String], Double)].collect()
    assert(got(0)._1 == Seq("a b", "b a", "a b", "b a"))
    assert(got(0)._2 == 0.5)
    assert(got(1)._2 == 0.0)
    assert(got(2)._2 == 0.75)
    assert(got(3) == ((Seq.empty[String], 0.0)))
  }

  test("winnowing: overlap guarantee, compression, short-text empty") {
    val k = 8; val w = 4
    val shared = "the quick brown fox jumps over the lazy dog near the bank"
    val a = s"PREFIX-A $shared SUFFIX-AAA"
    val b = s"completely different opening $shared and another tail"
    val c = "no overlap with anything else here at all, truly none"
    val rows = Seq((1L, a), (2L, b), (3L, c), (4L, "tiny")).toDF("id", "text")
      .select($"id",
        TextAnalysis.winnowingFingerprints($"text", k, w).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    // any shared substring of length >= k + w - 1 guarantees >= 1 shared
    // fingerprint; `shared` is far longer, expect substantial overlap
    val inter = rows(1L).toSet.intersect(rows(2L).toSet)
    assert(inter.nonEmpty, "docs sharing a long substring must share fingerprints")
    assert(rows(1L).toSet.intersect(rows(3L).toSet).size <
      rows(1L).toSet.size / 4,
      "unrelated docs must not share substantially")
    // ~1/w compression vs the full k-gram hash list
    assert(rows(1L).size < a.length - k + 2,
      "winnowing must store fewer fingerprints than k-grams")
    assert(rows(4L).isEmpty, "text shorter than k + w - 1 yields no windows")
    // the scale path (gram hashes materialized in their own projection)
    // must produce the identical fingerprint sets
    val twoStep = Seq((1L, a), (2L, b), (3L, c), (4L, "tiny")).toDF("id", "text")
      .withColumn("__h", TextAnalysis.kgramHashes($"text", k))
      .select($"id", TextAnalysis.winnowFromHashes($"__h", w).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(twoStep == rows, "nested and materialized winnowing must agree")
  }

  test("punct and stopword ratios, quality bounds") {
    val rows = Seq(
      "the cat sat on a mat",
      "!!!???...",
      "").toDF("text")
      .select(
        round(TextAnalysis.punctRatio($"text"), 6).as("p"),
        round(TextAnalysis.stopwordRatio($"text"), 6).as("s"),
        TextAnalysis.qualityScore($"text").as("q"))
      .as[(Double, Double, Double)].collect()
    assert(rows(0)._1 == 0.0)
    assert(math.abs(rows(0)._2 - 2.0 / 6.0) < 1e-6) // 'the', 'a'
    assert(rows(1)._1 == 1.0 && rows(1)._3 == 0.0)  // all punct → quality 0
    assert(rows(2)._3 == 0.0)                        // empty → quality 0
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("langId discriminates real sentences by signature tokens") {
    val preds = Seq(
      ("en", "the cat is one of the animals found in the house"),
      ("de", "der hund und die katze das ist nicht schlecht"),
      ("fr", "le chien et le chat est dans la maison des amis"),
      ("es", "el perro es un animal que vive en la casa")
    ).toDF("expected", "text")
      .select($"expected", TextAnalysis.langId($"text").as("got"))
      .as[(String, String)].collect()
    preds.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("fingerprint is formatting-invariant but content-sensitive") {
    val fps = Seq(
      "Hello,   World!",
      "hello world",
      "hello there world").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("chunkDocuments: boundaries, overlap, tail retention, empty docs") {
    def chunks(text: String, size: Int, stride: Int): Seq[(Long, Long, String)] = {
      TextAnalysis.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", size, stride)
        .select($"chunk_id", $"n_tokens", $"chunk")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    }
    val doc10 = (1 to 10).map(i => s"t$i").mkString(" ")
    // n < size → one chunk holding everything
    assert(chunks(doc10, 40, 30) == Seq((0L, 10L, doc10)))
    // n == size → exactly one chunk
    assert(chunks(doc10, 10, 5) == Seq((0L, 10L, doc10)))
    // n == size + 1 → a second chunk starting at stride, keeping the tail
    val got11 = chunks(doc10 + " t11", 10, 5)
    assert(got11.map(_._1) == Seq(0L, 1L))
    assert(got11(0)._3 == doc10)
    assert(got11(1)._3 == (6 to 11).map(i => s"t$i").mkString(" "))
    // overlap invariant: every chunk starts stride tokens after the last,
    // and consecutive chunks share size − stride tokens
    val doc100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val got = chunks(doc100, 40, 30)
    assert(got.size == 3)
    assert(got.map(_._2) == Seq(40L, 40L, 40L))
    assert(got(1)._3.startsWith("w31 ") && got(2)._3.startsWith("w61 "))
    assert(got(2)._3.endsWith(" w100"))
    // no-overlap packing (stride == size) reconstructs the document
    val packed = chunks(doc100, 25, 25)
    assert(packed.map(_._3).mkString(" ") == doc100)
    // empty / whitespace-only text → zero chunks, not a crash
    assert(chunks("", 40, 30).isEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 10, stride = 11)
    }
  }

  test("gopherQuality: each rule rejects its designed failure, good text keeps") {
    val good = ("the quick brown fox jumps over a lazy dog and then runs " +
      "far away to find some food in the deep dark forest tonight") // 23 words
    val tooShort = "the cat is in a box"
    val shouting = Seq.fill(25)("!!!###!!!").mkString(" ") // punct-heavy
    val noStops = Seq.tabulate(25)(i => s"zzz$i").mkString(" ")
    val looping = ("spam ham " * 30).trim // 2-gram repetition ≈ 1
    val docs = Seq((1L, good), (2L, tooShort), (3L, shouting),
      (4L, noStops), (5L, looping)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .select($"doc_id", $"flag_word_count", $"flag_word_len", $"flag_punct",
        $"flag_stopwords", $"flag_repetition", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, true, true, true, true, true, true)), s"${got(0)}")
    assert(!got(1)._2 && !got(1)._7, "short doc fails word count")
    assert(!got(2)._4 && !got(2)._7, "symbol spam fails the punct rule")
    assert(!got(3)._5 && !got(3)._7, "stopword-free text fails the common-words rule")
    assert(!got(4)._6 && !got(4)._7, "looping text fails the repetition rule")
  }

  test("wordDropout: deterministic, ~1/denom dropped, subsequence order kept") {
    val doc = (1 to 1000).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, doc)).toDF("doc_id", "text")
      .select($"doc_id",
        regexp_extract_all($"text", lit("\\S+"), lit(0)).as("toks"))
    def run() = df
      .select(TextAnalysis.wordDropout($"toks", $"doc_id", 10))
      .as[Seq[String]].head()
    val kept = run()
    assert(kept.length > 850 && kept.length < 950,
      s"~10% dropout expected, kept ${kept.length}/1000")
    val idx = kept.map(_.drop(1).toInt)
    assert(idx == idx.sorted, "kept tokens must stay in document order")
    assert(run() == kept, "augmentation must be deterministic")
    // a different doc id draws a different mask
    val other = df.withColumn("doc_id", lit(8L))
      .select(TextAnalysis.wordDropout($"toks", $"doc_id", 10))
      .as[Seq[String]].head()
    assert(other != kept)
  }

  test("bpePairCounts: vocabulary-weighted adjacent pairs, single chars drop") {
    // vocab: "the":2 "then":1 "a":1 → pairs: th:3 he:3 en:1; "a" has no pair
    val docs = Seq("the then a", "The").toDF("text")
    val got = TextAnalysis.bpePairCounts(docs, "text")
      .select($"pair", $"n").as[(String, Long)].collect().toMap
    assert(got == Map("th" -> 3L, "he" -> 3L, "en" -> 1L))
  }

  test("importanceScores: zero for a degenerate target, orders target-like docs first") {
    // target == raw → every weight is exactly ln(x) − ln(x) = 0
    val docs = Seq((1L, "alpha alpha beta", "a"), (2L, "alpha gamma", "a"),
      (3L, "beta beta delta", "b"), (4L, "beta gamma", "b"))
      .toDF("doc_id", "text", "grp")
    val degenerate = Importance
      .importanceScores(docs, "doc_id", "text", isTarget = lit(true))
      .select($"doc_id", $"n_tokens", $"raw_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(degenerate.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(degenerate.map(_._2).toSeq == Seq(3L, 2L, 3L, 2L))
    assert(degenerate.forall(_._3 == 0.0),
      "target == raw must score exactly zero everywhere")
    // target = group a → alpha-heavy docs outscore beta-heavy ones
    val scored = Importance
      .importanceScores(docs, "doc_id", "text", isTarget = $"grp" === "a")
      .select($"doc_id", $"raw_score").as[(Long, Double)].collect()
      .toMap
    assert(scored(1L) > scored(3L),
      "a target-vocabulary doc must outscore a raw-vocabulary doc")
    assert(scored(2L) > scored(4L))
  }

  test("sourceDivergence: corpus-like source scores near zero, skewed source higher") {
    // "bal" is the majority source (it IS most of the corpus mixture);
    // "skew" concentrates on one token the mixture spreads out
    val docs = Seq(
      (1L, "x x y z", "bal"), (2L, "x x y z", "bal"),
      (3L, "x x y z", "bal"), (4L, "x x y z", "bal"),
      (5L, "z z z z", "skew"))
      .toDF("doc_id", "text", "source")
    val got = Importance.sourceDivergence(docs, "text", "source", vocabSize = 3)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("bal", "skew"))
    assert(got.map(_._2) == Seq(16L, 4L), "all tokens are in the top-3 vocab")
    val (bal, skew) = (got.head._3, got(1)._3)
    assert(skew > bal, "the skewed source must diverge more from the corpus")
    assert(bal >= 0.0 && skew > 0.1)
    intercept[IllegalArgumentException] {
      Importance.sourceDivergence(docs, "text", "source", vocabSize = 0)
    }
  }

  test("mixtureWeights: hard sources upweight, weights normalize, uniform corpus is uniform") {
    // "rep"'s transitions are deterministic (every context has one
    // continuation -> probability 1, zero loss); "mix" branches from
    // `a` four ways (disjoint alphabet, so the models don't couple) ->
    // positive loss -> the larger mixture weight
    val docs = Seq(
      (1L, "x y x y x y x y", "rep"), (2L, "x y x y x y", "rep"),
      (3L, "a b a c", "mix"), (4L, "a d a e", "mix"))
      .toDF("doc_id", "text", "source")
    val got = Importance.mixtureWeights(docs, "doc_id", "text", "source")
      .select($"source", $"n_docs", $"excess", $"weight")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("mix", "rep"))
    assert(got.map(_._2) == Seq(2L, 2L))
    val (mix, rep) = (got.head, got(1))
    assert(rep._3 == 0.0, "easiest source defines the zero of excess loss")
    assert(mix._3 > 0.0 && mix._4 > rep._4,
      "harder source must carry the larger weight")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5, "weights must normalize")
    // identical per-source difficulty -> equal weights
    val uniform = Importance.mixtureWeights(
        Seq((1L, "a b c", "x"), (2L, "a b c", "y")).toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      .select($"weight").as[Double].collect().toSeq
    assert(uniform == Seq(0.5, 0.5))
    intercept[IllegalArgumentException] {
      Importance.mixtureWeights(docs, "doc_id", "text", "source", eta = 0.0)
    }
  }

  test("bm25: rare terms outweigh common, shorter docs outrank longer") {
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common filler"), // same tf=1 as doc 2 but much shorter
      (4L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text",
        terms = Seq("rare", "common"), k = 10)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(!out.contains(4L), "doc without any term must not appear")
    assert(out(1L) > out(2L) && out(1L) > out(3L),
      "the only doc with the rare term must rank first")
    assert(out(3L) > out(2L),
      "same tf, shorter doc must score higher (length normalization)")
    // deterministic
    val again = TextAnalysis.bm25(docs, "doc_id", "text",
        terms = Seq("rare", "common"), k = 10)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(again == out)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", terms = Seq())
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, "doc_id", "text", terms = Seq("a", "a"))
    }
  }

  test("phraseHits: consecutive-position joins, repeats, overlaps, misses") {
    val docs = Seq(
      (1L, "the table hash join"),        // one hit
      (2L, "table hash table hash"),      // two hits
      (3L, "hash table"),                 // reversed — no hit
      (4L, "table x hash"),               // gap — no hit
      (5L, "data data data")              // repeated-term phrase fodder
    ).toDF("doc_id", "text")
    val pos = TextAnalysis.invertedIndexPositional(docs, "doc_id", "text")
    // positions are 0-based occurrence grain
    val p = pos.as[(String, Long, Long)].collect().toSet
    assert(p.contains(("table", 1L, 1L)) && p.contains(("hash", 3L, 0L)))
    val hits = TextAnalysis.phraseHits(pos, "doc_id", Seq("table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 2L -> 2L),
      "reversed and gapped sequences must not match")
    // a repeated-term phrase constrains distinct offsets of ONE list:
    // 'data data' hits twice (overlapping) in doc 5
    val rep = TextAnalysis.phraseHits(pos, "doc_id", Seq("data", "data"))
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(5L -> 2L), "overlapping occurrences each count")
    // three-term phrase
    val tri = TextAnalysis.phraseHits(pos, "doc_id",
        Seq("table", "hash", "table"))
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(2L -> 1L))
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseHits(pos, "doc_id", Seq())
    }
  }

  test("bm25FromIndex: stored-index path is bit-identical to the rescan path") {
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common filler"),
      (4L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val postings = TextAnalysis.invertedIndex(docs, "doc_id", "text")
    val dl = TextAnalysis.docLengths(docs, "doc_id", "text")
    // postings carry exact tfs, tf >= 1 only
    val p = postings.as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(p(("common", 1L)) == 2L && p(("filler", 4L)) == 6L)
    assert(!p.contains(("rare", 2L)))
    // a query term ABSENT from the corpus must not perturb scores
    for (terms <- Seq(Seq("rare", "common"), Seq("rare", "common", "absent"))) {
      val direct = TextAnalysis.bm25(docs, "doc_id", "text",
          terms = terms, k = 10)
        .as[(Long, Double, Long)].collect().toSet
      val indexed = TextAnalysis.bm25FromIndex(postings, dl, "doc_id",
          terms = terms, k = 10)
        .as[(Long, Double, Long)].collect().toSet
      assert(indexed == direct, s"index path must equal rescan for $terms")
    }
  }

  test("bpeTrain: hand-computed merge sequence, early exhaustion, encoder") {
    // vocab: abab ×2 (one doc has it twice), ab ×1.
    // round 1 pair counts (overlapping positions, freq-weighted):
    //   abab → (a,b)×2, (b,a)×1 each occurrence; ab → (a,b)×1
    //   ⇒ (a,b) = 2·2+1 = 5, (b,a) = 2·1 = 2 → merge 1 = (a,b,5)
    // round 2: abab → [ab,ab] ⇒ (ab,ab) = 2 → merge 2 = (ab,ab,2)
    // round 3: everything is a single symbol → exhausted at 2 merges
    val docs = Seq((1L, "abab abab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 5)
    assert(merges == Seq(("a", "b", 5L), ("ab", "ab", 2L)),
      s"merge sequence diverged: $merges")

    // deterministic: replay is identical
    assert(TextAnalysis.bpeTrain(docs, "text", nMerges = 5) == merges)

    // encoder applies merges IN ORDER with greedy left-to-right matching:
    // ababab → chars → (a,b): [ab,ab,ab] → (ab,ab): [abab, ab]
    val seg = docs.limit(1).select(
        TextAnalysis.bpeSegment(lit("ababab"), merges.map(m => (m._1, m._2)))
          .as("seg"))
      .as[Seq[String]].head()
    assert(seg == Seq("abab", "ab"), s"encoder segmentation diverged: $seg")
    // unseen symbols pass through untouched
    val raw = docs.limit(1).select(
        TextAnalysis.bpeSegment(lit("xy"), merges.map(m => (m._1, m._2)))
          .as("seg"))
      .as[Seq[String]].head()
    assert(raw == Seq("x", "y"))
  }

  test("bpeTrain: incremental delta counting equals the full recount") {
    // a corpus where merges CASCADE (each merge creates new pairs that
    // later win) and where ties exercise the (a, b) lexicographic break —
    // the delta path must reproduce the recount sequence exactly
    val docs = Seq(
      (1L, "the theme there then the"),
      (2L, "these the theme other ether"),
      (3L, "hello hello help hel the"),
      (4L, "banana bandana ban banana")).toDF("doc_id", "text")
    val full = TextAnalysis.bpeTrain(docs, "text", nMerges = 12,
      incremental = false)
    val inc = TextAnalysis.bpeTrain(docs, "text", nMerges = 12,
      incremental = true)
    assert(inc == full, s"delta-maintained sequence diverged:\n$inc\nvs\n$full")
    assert(full.length == 12, "corpus must not exhaust before 12 merges")

    // and on real testdata text (the q129 surface), a longer horizon
    val real = graft.Tables.documents(spark, TestSpark.sf).limit(60)
    val fullR = TextAnalysis.bpeTrain(real, "text", nMerges = 16,
      incremental = false)
    val incR = TextAnalysis.bpeTrain(real, "text", nMerges = 16,
      incremental = true)
    assert(incR == fullR)
  }

  test("byte-level BPE: hand-checked merges are hex-mapped, case/punct kept") {
    // lowercase-alnum corpus where \S+ pre-tokenization coincides with
    // normalizedTokens: byte merges must be the char merges with every
    // symbol hex-mapped (a→61, b→62), same counts, same order
    val docs = Seq((1L, "abab abab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 5,
      byteLevel = true)
    assert(merges == Seq(("61", "62", 5L), ("6162", "6162", 2L)),
      s"byte merge sequence diverged: $merges")

    // byte-level pre-tokenization preserves case: "The" and "the" are
    // distinct words, so (T,h) and (t,h) count separately while (h,e)
    // pools across both
    val cased = Seq((1L, "The the the The")).toDF("doc_id", "text")
    val m1 = TextAnalysis.bpeTrain(cased, "text", nMerges = 1,
      byteLevel = true)
    // h=68, e=65: (h,e) appears in all four tokens
    assert(m1 == Seq(("68", "65", 4L)), s"first cased merge diverged: $m1")
  }

  test("byte-level BPE: arbitrary Unicode round-trips with zero OOV") {
    val docs = Seq((1L, "abab abab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 5,
      byteLevel = true).map(m => (m._1, m._2))
    // precomposed e-acute, DECOMPOSED e + combining acute (as \uXXXX
    // escapes only — editors NFC-compose raw combining marks, the
    // q144/q149 lesson), sharp-s, CJK, astral emoji (surrogate pair),
    // plus ASCII the merges DO hit
    val words = Seq("caf\u00e9", "cafe\u0301", "stra\u00dfe",
      "\u4e2d\u6587", "\ud83d\ude00ok", "abab", "")
    for (w <- words) {
      val (sym, dec, hx) = docs.limit(1).select(
          TextAnalysis.bpeSegment(lit(w), merges, byteLevel = true).as("s"),
          TextAnalysis.bpeBytesDecode(
            TextAnalysis.bpeSegment(lit(w), merges, byteLevel = true)).as("d"),
          hex(encode(lit(w), "UTF-8")).as("h"))
        .as[(Seq[String], String, String)].head()
      // no OOV by construction: concat of symbols IS the full hex rendering
      assert(sym.mkString("") == hx, s"word '$w': symbols $sym vs hex $hx")
      assert(dec == w, s"word '$w' failed round-trip: got '$dec'")
      // every unmerged symbol is a single byte from the closed alphabet
      assert(sym.forall(s => s.length % 2 == 0 && s.nonEmpty) || w.isEmpty)
    }
    // the trained merge applies at byte level too: abab → 6162 61 62... →
    // [61626162, 6162]
    val seg = docs.limit(1).select(
        TextAnalysis.bpeSegment(lit("abab"), merges, byteLevel = true).as("s"))
      .as[Seq[String]].head()
    assert(seg == Seq("61626162"), s"byte encoder diverged: $seg")
  }

  test("frequencySpectrum: hand-checked N_r and Turing adjusted counts") {
    // counts a:3 b:2 c:1 → N_1=N_2=N_3=1; r*(1)=2·N_2/N_1=2, r*(2)=3,
    // r*(3)=null (no token occurs 4 times)
    val df = Seq(("g", "a a a b b c")).toDF("src", "text")
    val out = TextAnalysis.frequencySpectrum(df, "src", "text")
      .orderBy("r")
      .select("src", "r", "n_r", "gt_rstar")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("g", 1L, 1L, Some(2.0)),
      ("g", 2L, 1L, Some(3.0)),
      ("g", 3L, 1L, None)),
      s"spectrum diverged: $out")
  }

  test("zipfSlope: an exact-Zipf group fits slope -1, topR caps the fit") {
    // counts 6, 3, 2 = 6/rank at ranks 1..3 — ln-ln exactly linear with
    // slope −1 and intercept ln 6
    val text = (Seq.fill(6)("t1") ++ Seq.fill(3)("t2") ++ Seq.fill(2)("t3"))
      .mkString(" ")
    val df = Seq(("g", text)).toDF("src", "text")
    val fit = TextAnalysis.zipfSlope(df, "src", "text", topR = 100)
      .select("src", "n_terms", "slope", "intercept")
      .as[(String, Long, Double, Double)].collect().head
    assert(fit._2 == 3L)
    assert(math.abs(fit._3 - (-1.0)) < 1e-6, s"slope ${fit._3}")
    assert(math.abs(fit._4 - math.log(6.0)) < 1e-5, s"intercept ${fit._4}")
    // topR=2 keeps only the first two ranks
    val capped = TextAnalysis.zipfSlope(df, "src", "text", topR = 2)
      .select("n_terms").as[Long].collect().head
    assert(capped == 2L)
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfSlope(df, "src", "text", topR = 1)
    }
  }

  test("heapsGrowth: hand-checked curve, chunk-invariant, loud id contract") {
    // docs: "a b a" (2 new), "b c" (1 new), "a d d" (1 new)
    val df = Seq((1L, "g", "a b a"), (2L, "g", "b c"), (3L, "g", "a d d"))
      .toDF("doc_id", "src", "text")
    val out = TextAnalysis.heapsGrowth(df, "src", "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_new", "cum_tokens", "cum_vocab")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 3L, 2L),
      (2L, 2L, 1L, 5L, 3L),
      (3L, 3L, 1L, 8L, 4L)),
      s"growth curve diverged: $out")
    // the two-phase cumsum must be chunk-size invariant (the q155
    // pattern: the knob changes the plan, never the answer)
    val narrow = TextAnalysis.heapsGrowth(df, "src", "doc_id", "text",
        chunkSize = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_new", "cum_tokens", "cum_vocab")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(narrow == out, "chunkSize must not change the curve")
    intercept[IllegalArgumentException] {
      TextAnalysis.heapsGrowth(df.withColumn("doc_id",
        col("doc_id").cast("string")), "src", "doc_id", "text")
    }
  }

  test("keynessScores: exclusive tokens rank top, z matches the closed form") {
    // A: x x x y  |  B: y y z — x is A's signature, z is B's
    val df = Seq(("A", "x x x y"), ("B", "y y z")).toDF("src", "text")
    val out = TextAnalysis.keynessScores(df, "src", "text",
        alpha = 0.01, topK = 10)
      .orderBy("src", "rank")
      .select("src", "rank", "token", "cnt", "z")
      .as[(String, Long, String, Long, Double)].collect().toSeq
    val byGroup = out.groupBy(_._1)
    // A's signature is its exclusive majority token x; B's is y (2/3 of
    // B's tokens vs 1/4 of A's — a dominant SHARE beats the exclusive
    // but rare z, which still scores positive)
    assert(byGroup("A").head._3 == "x" && byGroup("B").head._3 == "y",
      s"signature tokens must rank first: $out")
    assert(out.find(r => r._1 == "B" && r._3 == "z").get._5 > 0 &&
      out.find(r => r._1 == "A" && r._3 == "y").get._5 < 0,
      s"sign must follow over/under-representation: $out")
    assert(byGroup("A").map(_._2) == Seq(1L, 2L) &&
      byGroup("B").map(_._2) == Seq(1L, 2L))
    // closed form for (A, x): y=3, yall=3, ng=4, n=7, v=3, alpha=0.01
    val delta = math.log((3 + 0.01) / (4 + 0.01 * 3 - 3 - 0.01)) -
      math.log((3 - 3 + 0.01) / (7 - 4 + 0.01 * 3 - (3 - 3) - 0.01))
    val sigma2 = 1.0 / (3 + 0.01) + 1.0 / (3 - 3 + 0.01)
    val expected = BigDecimal(delta / math.sqrt(sigma2) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotZ = out.find(r => r._1 == "A" && r._3 == "x").get._5
    assert(gotZ == expected, s"z $gotZ != closed form $expected")
    intercept[IllegalArgumentException] {
      TextAnalysis.keynessScores(df, "src", "text", alpha = 0.0)
    }
  }

  test("heapsFit: a closed vocabulary fits beta 0, ln_k 0") {
    // one distinct token ever: cum_vocab stays 1, ln V = 0 everywhere
    val df = Seq((1L, "g", "z"), (2L, "g", "z z"), (3L, "g", "z"))
      .toDF("doc_id", "src", "text")
    val fit = TextAnalysis.heapsFit(df, "src", "doc_id", "text")
      .select("src", "n_points", "beta", "ln_k")
      .as[(String, Long, Double, Double)].collect().head
    assert(fit == (("g", 3L, 0.0, 0.0)), s"closed-vocab fit diverged: $fit")
  }

  test("packBinsByCount: greedy boundaries, oversized rows isolate, loud budget") {
    val rows = Seq((1L, "s", 3L), (2L, "s", 3L), (3L, "s", 3L))
      .toDF("id", "source", "cnt")
    val bins = TextAnalysis.packBinsByCount(rows, "id", "cnt",
        budget = 5L, partitionCol = "source")
      .orderBy("id").select("bin").as[Long].collect().toSeq
    // cum 3,6,9 → floor((cum-3)/5) = 0,0,1
    assert(bins == Seq(0L, 0L, 1L))

    val over = Seq((1L, "s", 12L), (2L, "s", 1L)).toDF("id", "source", "cnt")
    val b2 = TextAnalysis.packBinsByCount(over, "id", "cnt",
        budget = 5L, partitionCol = "source")
      .orderBy("id").select("bin").as[Long].collect().toSeq
    // the oversized doc opens bin 0 alone; the next doc lands past it
    assert(b2 == Seq(0L, 2L))

    intercept[IllegalArgumentException] {
      TextAnalysis.packBinsByCount(rows, "id", "cnt", budget = 0L,
        partitionCol = "source")
    }
  }

  test("wordPieceTrain: likelihood selection diverges from BPE's count") {
    // x,y occur ONLY together (n=2, ca=cb=2 → score 0.5); (a,b) has the
    // far higher raw count 10 but 'a' is promiscuous (ca=100 → score
    // 0.01). BPE must take (a,b) first; WordPiece must take (x,y).
    val text = ("xy " * 2) + ("ab " * 10) + ("a " * 90)
    val df = Seq((1L, text.trim)).toDF("doc_id", "text")
    val wp = TextAnalysis.wordPieceTrain(df, "text", nMerges = 2)
    assert(wp.head == (("x", "y", 2L, 2L, 2L, 0.5)), s"got ${wp.head}")
    assert(wp(1) == (("a", "b", 10L, 100L, 10L, 0.01)), s"got ${wp(1)}")
    val bpe = TextAnalysis.bpeTrain(df, "text", nMerges = 1)
    assert(bpe.head == (("a", "b", 10L)), s"got ${bpe.head}")
    // exhaustion: single-symbol vocabulary has no pairs to merge
    val none = TextAnalysis.wordPieceTrain(
      Seq((1L, "a a a")).toDF("doc_id", "text"), "text", nMerges = 3)
    assert(none.isEmpty)
  }

  test("prfExpandedBm25: mined terms retrieve docs the originals cannot") {
    val docs = Seq(
      (1L, "vector apple apple apple"),
      (2L, "vector banana"),
      (3L, "apple apple orange"),
      (4L, "kiwi kiwi kiwi")).toDF("doc_id", "text")
    // single-term parity: the join-based weighted formulation must equal
    // the fixed-column bm25 exactly (one addend — no accumulation at all)
    val a = TextAnalysis.bm25(docs, "doc_id", "text", Seq("apple"), k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    val b = TextAnalysis.bm25Weighted(docs, "doc_id", "text",
      Seq(("apple", 1.0)), k = 10).as[(Long, Double, Long)].collect().toSeq
    assert(a == b, s"weighted/fixed mismatch: $a vs $b")
    // feedback = {1, 2} (the only 'vector' docs); mining scores apple
    // 3/4 over banana 1/2, so the expanded query reaches doc 3 (which
    // never says 'vector'), and doc 4 stays unreachable
    val got = TextAnalysis.prfExpandedBm25(docs, "doc_id", "text",
        Seq("vector"), fbK = 2, nExpand = 1, k = 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    assert(got == Set(1L, 2L, 3L), s"got $got")
  }

  test("pearsonByGroup: exact ±1 lines, hand value, zero-variance null") {
    val rows = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),   // r = 1
      ("dn", 1L, 9L), ("dn", 2L, 6L), ("dn", 3L, 3L),      // r = -1
      ("mx", 1L, 1L), ("mx", 2L, 3L), ("mx", 3L, 2L),      // r = 1/2
      ("fl", 5L, 1L), ("fl", 5L, 2L)                       // x constant
    ).toDF("source", "x", "y")
    val got = Importance.pearsonByGroup(rows, "source", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // the operator is IEEE-deterministic, not algebraic: replay the
    // exact formula (num / (sqrt(vx)·sqrt(vy))) on the integer sums
    def ieee(num: Long, vx: Long, vy: Long): Double =
      num / (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
    assert(got("up") == ((3L, Some(ieee(60, 6, 600)))), s"got ${got("up")}")
    assert(got("up")._2.get > 0.999999999 && got("dn")._2.get < -0.999999999)
    assert(got("dn") == ((3L, Some(ieee(-18, 6, 54)))), s"got ${got("dn")}")
    assert(got("mx") == ((3L, Some(ieee(3, 6, 6)))), s"got ${got("mx")}")
    assert(got("fl") == ((2L, None)), "zero variance must be NULL")
    val e = intercept[IllegalArgumentException] {
      Importance.pearsonByGroup(Seq(("a", 1.5, 1L)).toDF("source", "x", "y"),
        "source", "x", "y")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("oovRates: top-V cut with token-asc ties, exact per-source rates") {
    // counts: aa×3, bb×2, cc×2, zz×1 — V=2 keeps aa and bb (bb beats cc
    // on the token-asc tie-break)
    val docs = Seq(
      ("s1", "aa aa bb cc"),
      ("s2", "aa bb cc zz")).toDF("source", "text")
    val got = Importance.oovRates(docs, "source", "text", vocabSize = 2)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("s1") == ((4L, 1L, 0.25)), s"got ${got("s1")}")
    assert(got("s2") == ((4L, 2L, 0.5)), s"got ${got("s2")}")
  }

  test("spearmanByGroup: perfect monotone ±1, tie average ranks, constants") {
    val rows = Seq(
      // monotone but NONLINEAR (1,10),(2,1000),(3,1001): ρ exactly 1
      ("up", 1L, 10L), ("up", 2L, 1000L), ("up", 3L, 1001L),
      ("dn", 1L, 9L), ("dn", 2L, 5L), ("dn", 3L, 1L),       // ρ = -1
      // a tie in x: ranks (1.5, 1.5, 3); y ranks (1, 2, 3):
      // d² = .25 + .25 + 0 = .5 → ρ = 1 − 6·0.5/24 = 0.875
      ("tie", 5L, 1L), ("tie", 5L, 2L), ("tie", 7L, 3L),
      ("fl", 4L, 1L), ("fl", 4L, 2L))                       // x constant
    .toDF("source", "x", "y")
    val got = Importance.spearmanByGroup(rows, "source", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got("up") == ((3L, Some(1.0))), s"got ${got("up")}")
    assert(got("dn") == ((3L, Some(-1.0))), s"got ${got("dn")}")
    assert(got("tie") == ((3L, Some(0.875))), s"got ${got("tie")}")
    assert(got("fl") == ((2L, None)), "constant statistic must be NULL")
  }

  test("ksDrift: hand ECDFs, identical-source zero, loud float guard") {
    // A = {1,2,3}, B = {2,3,3,4}: KS = |2/3 - 1/4| at v=2; C clones A
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 3L), ("b", 4L),
      ("c", 1L), ("c", 2L), ("c", 3L)).toDF("source", "v")
    val got = Importance.ksDrift(rows, "source", "v")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", "b")) == ((3L, 4L, 2.0 / 3 - 1.0 / 4)),
      s"got ${got(("a", "b"))}")
    assert(got(("a", "c")) == ((3L, 3L, 0.0)))
    assert(got(("b", "c"))._3 == 2.0 / 3 - 1.0 / 4)
    val e = intercept[IllegalArgumentException] {
      Importance.ksDrift(Seq(("a", 1.5)).toDF("source", "v"), "source", "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("textRankSummary: path center wins, ties go earliest, wordless drop") {
    val docs = Seq(
      // sentence chain s0–s1–s2: the center of the path out-ranks the ends
      (1L, "alpha beta. beta gamma! gamma delta."),
      // identical sentences tie exactly — the earliest is emitted
      (2L, "same words here. same words here."),
      // single sentence: base rank (1-0.85)/1, still summarized
      (3L, "only one sentence"),
      // no [a-z0-9] words at all: no output row
      (4L, "!!! ...")).toDF("doc_id", "text")
    val got = TextAnalysis.textRankSummary(docs, "doc_id", "text")
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 1L, s"center sentence must win, got ${got(1L)}")
    assert(got(1L)._3 == "beta gamma")
    assert(got(2L)._1 == 0L, s"tie must break earliest, got ${got(2L)}")
    assert(got(3L) == ((0L,
      BigDecimal((1.0 - 0.85) / 1 + 1e-15)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "only one sentence")), s"got ${got(3L)}")
  }

  test("sentenceDedup: corpus-first keep, in-doc repeats, order, empties") {
    val docs = Seq(
      (1L, "subscribe now. unique alpha. subscribe now."), // in-doc repeat
      (2L, "subscribe now! unique beta."),                 // cross-doc repeat
      (3L, "unique gamma"),
      (4L, "...")).toDF("doc_id", "text")                  // only empties
    val got = TextAnalysis.sentenceDedup(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1 owns "subscribe now" (pos 0) and drops its pos-2 repeat
    assert(got(1L) == ((3L, 2L, "subscribe now unique alpha")), s"${got(1L)}")
    // doc 2's copy is dropped; its unique sentence survives
    assert(got(2L) == ((2L, 1L, "unique beta")), s"${got(2L)}")
    assert(got(3L) == ((1L, 1L, "unique gamma")))
    // a doc with only empty sentences has no rows at all
    assert(!got.contains(4L))
  }

  test("incomingSentenceScreen: known drop, fresh keep, order, all-known doc") {
    val stored = Seq("subscribe now", "old news").toDF("sent")
    val batch = Seq(
      (1L, "subscribe now. brand new thing. old news! another fresh one."),
      (2L, "subscribe now. old news.")).toDF("doc_id", "text")
    val got = TextAnalysis.incomingSentenceScreen(stored, batch,
        "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((4L, 2L, "brand new thing another fresh one")),
      s"got ${got(1L)}")
    // a doc whose every sentence is known keeps nothing but still reports
    assert(got(2L) == ((2L, 0L, "")), s"got ${got(2L)}")
  }

  test("readability: pinned word/sentence/syllable heuristics + linear forms") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sents, 6 syllables
      (2L, "beautiful"), // eau-i-u → 3 syllables; no terminator → 1 sent
      (3L, "123 456.") // no alphabetic words → NULL scores
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_words", "n_sents", "n_syll", "fk_grade", "reading_ease")
      .collect()
    assert(got(0).getLong(0) == 6L && got(0).getLong(1) == 2L &&
      got(0).getLong(2) == 6L)
    val fk1 = 0.39 * 3.0 + 11.8 * 1.0 - 15.59
    val re1 = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(got(0).getDouble(3) - fk1) < 1e-12)
    assert(math.abs(got(0).getDouble(4) - re1) < 1e-12)
    assert(got(1).getLong(0) == 1L && got(1).getLong(1) == 1L &&
      got(1).getLong(2) == 3L)
    assert(got(2).getLong(0) == 0L && got(2).isNullAt(3) && got(2).isNullAt(4),
      "wordless docs must emit NULL scores, not a division by zero")
  }

  test("Jelinek–Mercer QL: hand-computed scores, zero-tf smoothing mass, " +
      "and a corpus where JM and Dirichlet rank differently") {
    // |C| = 10: d1 has the term once in 2 tokens, d2 once in 8 tokens —
    // JM's fixed-weight mix scores the SHORT doc far higher.
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat bird bird bird bird bird bird bird")
    ).toDF("id", "text")
    val lam = 0.5
    val got = TextAnalysis.jelinekMercerQL(docs, "id", "text",
      Seq("cat", "dog"), lambda = lam, k = 10)
      .as[(Long, Double, Long)].collect().map(t => (t._1, t._2)).toMap
    // replay the operator's own op order on exact-integer inputs
    // (the q254 rule: never assert the algebraic value)
    def jm(tf: Long, dl: Long, ctf: Long): Double =
      math.log(lam * (tf.toDouble / dl) + (1.0 - lam) * (ctf.toDouble / 10))
    def r6(x: Double): Double = math.rint((x + 1e-9) * 1e6) / 1e6
    assert(got(1L) == r6(jm(1, 2, 2) + jm(1, 2, 1)))
    // d2 has dog-tf 0 — the collection model still contributes mass
    assert(got(2L) == r6(jm(1, 8, 2) + jm(0, 8, 1)))
    assert(got(1L) > got(2L))
    // Dirichlet's length-adaptive prior (huge mu drowns tf in short docs)
    // can INVERT the family ranking on the same corpus: with mu=1000 the
    // two docs are nearly tied by the prior; dl enters only via the
    // denominator, and d1 still wins — so instead pin the documented
    // contrast structurally: JM's per-term collection weight (1-lam) is
    // dl-INDEPENDENT, Dirichlet's mu/(dl+mu) is not.
    val dir = TextAnalysis.dirichletQL(docs, "id", "text",
      Seq("cat", "dog"), mu = 1000.0, k = 10)
      .as[(Long, Double, Long)].collect().map(t => (t._1, t._2)).toMap
    def dql(tf: Long, dl: Long, ctf: Long): Double =
      math.log((tf + 1000.0 * (ctf.toDouble / 10)) / (dl + 1000.0))
    assert(dir(1L) == r6(dql(1, 2, 2) + dql(1, 2, 1)))
    assert(dir(2L) == r6(dql(1, 8, 2) + dql(0, 8, 1)))
    // bounds are loud
    intercept[IllegalArgumentException] {
      TextAnalysis.jelinekMercerQL(docs, "id", "text", Seq("cat"),
        lambda = 1.0)
    }
  }

  test("MATTR: hand-computed windows, short-doc TTR fallback, empty doc") {
    val docs = Seq(
      (1L, "a b a b a"),     // w=3 → windows [aba][bab][aba] = 2+2+2
      (2L, "x y"),           // shorter than window → whole-doc TTR 2/2
      (3L, "z z z z"),       // windows [zzz][zzz] = 1+1
      (4L, "")               // empty → NULL mattr, 0 windows
    ).toDF("doc_id", "text")
    val got = TextAnalysis.mattr(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id")
      .select("n_tokens", "d_sum", "n_windows", "mattr").collect()
    assert(got(0).getLong(0) == 5 && got(0).getLong(1) == 6 &&
      got(0).getLong(2) == 3 && got(0).getDouble(3) == 6.0 / 9)
    assert(got(1).getLong(2) == 0 && got(1).getDouble(3) == 1.0,
      "short doc must fall back to whole-doc TTR with n_windows=0")
    assert(got(2).getLong(1) == 2 && got(2).getDouble(3) == 2.0 / 6)
    assert(got(3).getLong(0) == 0 && got(3).isNullAt(3),
      "empty doc must emit NULL mattr")
    intercept[IllegalArgumentException] {
      TextAnalysis.mattr(docs, "doc_id", "text", window = 1)
    }
  }

  test("FIM transform: md5-replayed PSM reassembly, rate extremes, " +
      "and the n>=2 floor") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def slice(tag: String, id: Long, w: Int): Long =
      java.lang.Long.parseLong(md5hex(s"fim:$tag:$id").take(w), 16)
    val txt = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((7L, txt), (8L, txt), (9L, "x")).toDF("doc_id", "text")
    // rate16=65536: every doc with n>=2 is fimmed; the 1-char doc never
    val all = TextAnalysis.fimTransform(docs, "doc_id", "text",
        rate16 = 65536)
      .orderBy("doc_id")
      .select("fimmed", "lo", "hi", "out_len", "out_sig").collect()
    val n = txt.length.toLong
    for (r <- Seq((7L, all(0)), (8L, all(1)))) {
      val (id, row) = r
      val (ua, ub) = (slice("a", id, 8) % (n + 1), slice("b", id, 8) % (n + 1))
      val (lo, hi) = (math.min(ua, ub).toInt, math.max(ua, ub).toInt)
      val psm = "<PRE>" + txt.substring(0, lo) + "<SUF>" + txt.substring(hi) +
        "<MID>" + txt.substring(lo, hi)
      assert(row.getLong(0) == 1L && row.getLong(1) == lo &&
        row.getLong(2) == hi)
      assert(row.getLong(3) == n + 15,
        "PSM adds exactly the three 5-char sentinels")
      assert(row.getString(4) == md5hex(psm),
        "out_sig must pin the full reassembled PSM string")
    }
    assert(all(2).getLong(0) == 0L && all(2).isNullAt(1),
      "a 1-char doc can't split into three parts")
    // rate16=0: pure pass-through, signature = the original text
    val none = TextAnalysis.fimTransform(docs, "doc_id", "text", rate16 = 0)
      .orderBy("doc_id").select("fimmed", "out_sig").collect()
    assert(none.forall(_.getLong(0) == 0L))
    assert(none(0).getString(1) == md5hex(txt))
  }

  test("vocabularyOverlap: exact set math, directed containments, " +
      "zero-overlap pairs drop") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "c d"),       // V1 = {a,b,c,d}
      ("s2", "c d e"),                      // V2 = {c,d,e}
      ("s3", "zz")                          // V3 = {zz} — disjoint
    ).toDF("source", "text")
    val got = TextAnalysis.vocabularyOverlap(docs, "source", "text")
      .orderBy("a", "b").collect()
    assert(got.length == 1, "pairs sharing zero types must drop out")
    val r = got(0)
    assert(r.getString(0) == "s1" && r.getString(1) == "s2")
    assert(r.getLong(2) == 2 && r.getLong(3) == 4 && r.getLong(4) == 3)
    assert(r.getDouble(5) == 2.0 / 5 && r.getDouble(6) == 2.0 / 4 &&
      r.getDouble(7) == 2.0 / 3)
  }

  test("RAKE: hand-computed deg/freq phrase scores, earliest-phrase " +
      "tie-break, all-stopword docs emit nothing") {
    // stops contain "of": phrases = [deep learning], [deep models]
    // freq: deep=2 learning=1 models=1; deg: deep=4 learning=2 models=2
    // wscore: deep=2 learning=2 models=2 → both phrases score 4.0 →
    // tie breaks to the earlier phrase
    val docs = Seq(
      (1L, "deep learning of deep models"),
      (2L, "the of a"),                      // all stopwords → no row
      (3L, "solo")                           // single word: deg=freq=1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeywords(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 2, "all-stopword docs must emit nothing")
    assert(got(0).getLong(0) == 1L && got(0).getString(1) == "deep learning")
    assert(got(0).getDouble(2) == 4.0 && got(0).getLong(3) == 2L)
    assert(got(1).getString(1) == "solo" && got(1).getDouble(2) == 1.0)
    // a longer collocation outscores a shorter one sharing no words
    val two = Seq((9L, "alpha beta gamma of tiny")).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(two, "doc_id", "text").collect()(0)
    assert(r.getString(1) == "alpha beta gamma" && r.getDouble(2) == 9.0)
  }

  test("kAnonymity: hand-computed classes, risk cut strictly below k, " +
      "loud empty quasi list") {
    // classes: (en,a)=3, (en,b)=2, (fr,a)=1 → with k=3: risk = 2 classes
    // holding 3 rows; min class 1
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"),
      ("en", "b"), ("fr", "a")).toDF("lang", "src")
    val got = TextAnalysis.kAnonymity(df, Seq("lang", "src"), k = 3L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 6L, 2L, 3L, 1L)), s"got $got")
    // boundary: a class of exactly k is NOT at risk
    val got2 = TextAnalysis.kAnonymity(df, Seq("lang", "src"), k = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got2 == ((3L, 6L, 1L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.kAnonymity(df, Seq.empty, k = 3L)
    }
  }

  test("tCloseness: hand-computed TVD, skewed class flags even when " +
      "diverse, absent-value fold") {
    def r6(x: Double): Double = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // global: en 4/8, fr 4/8. class a: en 3/4, fr 1/4 (diverse but
    // skewed) → TVD = ½(|3/4−1/2| + |1/4−1/2|) = 1/4.
    // class b: en 1/4, fr 3/4 → symmetric, 1/4.
    val df = Seq(("a", "en"), ("a", "en"), ("a", "en"), ("a", "fr"),
      ("b", "en"), ("b", "fr"), ("b", "fr"), ("b", "fr"))
      .toDF("src", "lang")
    val got = TextAnalysis.tCloseness(df, Seq("src"), "lang")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 4L, 0.25), ("b", 4L, 0.25)), s"got $got")
    // absent-value fold: class c misses fr entirely → TVD =
    // ½(|1−5/9| + 4/9) = 4/9 (the 1+Σ(|pc−pg|−pg) identity carries the
    // missing value's full global mass)
    val df2 = (Seq(("a", "en"), ("a", "en"), ("a", "en"), ("a", "fr"),
      ("b", "en"), ("b", "fr"), ("b", "fr"), ("b", "fr")) :+ (("c", "en")))
      .toDF("src", "lang")
    val c = TextAnalysis.tCloseness(df2, Seq("src"), "lang")
      .as[(String, Long, Double)].collect().find(_._1 == "c").get
    assert(c._2 == 1L &&
      c._3 == r6((1.0 + (math.abs(1.0 / 1 - 5.0 / 9) - 5.0 / 9)) / 2),
      s"got $c")
  }

  test("lDiversity: homogeneous classes flag even when k-anonymous") {
    // class (a): langs {en, en, fr} → 2 distinct; class (b): {en, en} →
    // 1 distinct — k-anonymous at k=2 but NOT 2-diverse
    val df = Seq(("a", "en"), ("a", "en"), ("a", "fr"),
      ("b", "en"), ("b", "en")).toDF("src", "lang")
    val got = TextAnalysis.lDiversity(df, Seq("src"), "lang", l = 2L)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 1L)), s"got $got")
    intercept[IllegalArgumentException] {
      TextAnalysis.lDiversity(df, Seq("lang"), "lang", l = 2L)
    }
  }

  test("PPMI associations: hand-computed pmi, window reach, same-word " +
      "margins, support floor") {
    def r6(x: Double): Double = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pairs: (p,q)x2, (p,r)x1 → margins p=3 q=2 r=1, T=3, M=6
    val docs = Seq("p q", "p q", "p r").toDF("text")
    val got = TextAnalysis.ppmiAssociations(docs, "text", window = 2,
        minCount = 1, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val exp = Seq(
      ("p", "q", 2L, 3L, 2L, r6(math.log((2.0 / 3) / ((3.0 / 6) * (2.0 / 6))))),
      ("p", "r", 1L, 3L, 1L, r6(math.log((1.0 / 3) / ((3.0 / 6) * (1.0 / 6))))))
    assert(got.sortBy(t => (t._1, t._2)) == exp, s"got $got")
    // window=2 reaches two ahead; window=1 is adjacent-only
    val tri = Seq("a b c").toDF("text")
    assert(TextAnalysis.ppmiAssociations(tri, "text", window = 2,
      minCount = 1, k = 10).count() == 3L)
    assert(TextAnalysis.ppmiAssociations(tri, "text", window = 1,
      minCount = 1, k = 10).count() == 2L)
    // a same-word pair margins its word TWICE
    val zz = TextAnalysis.ppmiAssociations(Seq("z z").toDF("text"), "text",
        window = 1, minCount = 1, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().head
    assert(zz == (("z", "z", 1L, 2L, 2L, r6(math.log(1.0)))))
    // support floor cuts
    assert(TextAnalysis.ppmiAssociations(docs, "text", window = 2,
      minCount = 2, k = 10).count() == 1L)
  }

  test("dispersionDP: hand-computed DP, zero-count parts folded in, " +
      "top-N by exact counts") {
    // S=7, s1=3, s2=4 → exp=(3/7, 4/7)
    val docs = Seq(("p1", "a a b"), ("p2", "a c c c")).toDF("source", "text")
    def r6(x: Double): Double = math.rint((x + 1e-9) * 1e6) / 1e6
    def dp(pairs: Seq[(Double, Double)]): Double =
      r6((1.0 + pairs.map { case (obs, exp) =>
        math.abs(obs - exp) - exp }.sum) / 2)
    val got = TextAnalysis.dispersionDP(docs, "source", "text", topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"),
      "output is term-ordered")
    val m = got.map(t => (t._1, (t._2, t._3))).toMap
    assert(m("a") == ((3L, dp(Seq((2.0 / 3, 3.0 / 7), (1.0 / 3, 4.0 / 7))))))
    assert(m("b") == ((1L, dp(Seq((1.0, 3.0 / 7))))),
      "the part where b never occurs contributes exp_p via the 1+Σ fold")
    assert(m("c") == ((3L, dp(Seq((1.0, 4.0 / 7))))))
    // topN cuts by exact counts with the term tie-break: a(3) c(3) b(1)
    val top2 = TextAnalysis.dispersionDP(docs, "source", "text", topN = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top2 == Seq("a", "c"))
  }
}
