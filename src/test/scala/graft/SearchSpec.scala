package graft

import org.apache.spark.sql.functions._
import graft.text.{Search, UrlOps}
import graft.operators.Sketches

/** Retrieval, collocations, URL canonicalization, and the fixed-grid
  * histogram quantile sketch — each against a driver-side brute-force
  * reference on small corpora (the oracle strategy at spec scale). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def ilog2(x: Long): Long = {
    require(x >= 1); 63 - java.lang.Long.numberOfLeadingZeros(x)
  }

  test("searchTopK matches a driver-side brute force with ties and scale") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta beta delta"),
      (3L, "alpha alpha alpha beta"),
      (4L, "delta epsilon zeta"),
      (5L, "no match here at all"),
      (6L, "ALPHA case insensitive Alpha")).toDF("doc_id", "text")
    val terms = Seq("alpha", "beta")
    val got = Search.searchTopK(docs, "doc_id", "text", terms, k = 4, idfScale = 8L)
      .as[(Long, Long)].collect().toSeq

    // brute force
    val corpus = Map(
      1L -> Seq("alpha", "beta", "gamma", "alpha"),
      2L -> Seq("beta", "beta", "delta"),
      3L -> Seq("alpha", "alpha", "alpha", "beta"),
      4L -> Seq("delta", "epsilon", "zeta"),
      5L -> Seq("no", "match", "here", "at", "all"),
      6L -> Seq("alpha", "case", "insensitive", "alpha"))
    val n = corpus.size.toLong
    val df_ = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    val scores = corpus.flatMap { case (id, toks) =>
      val s = terms.map(t => toks.count(_ == t).toLong * ilog2(n * 8L / df_(t))).sum
      if (terms.exists(toks.contains)) Some(id -> s) else None
    }
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(4)
    assert(got === want)
  }

  test("collocations: hand-checked scores, minCount pruning, tie-break order") {
    val docs = Seq(
      "new york new york city",
      "new york is big",
      "san francisco and new york",
      "single").toDF("text")
    val got = Search.collocations(docs, "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // unigrams: new=4 york=4 city=1 is=1 big=1 san=1 francisco=1 and=1 single=1 → T=15
    // bigrams >= 2: (new,york) c12=4 → score = 4*15/(4*4) = 3
    assert(got === Seq(("new", "york", 4L, 3L)))
  }

  test("collocations equals a driver-side reference on a fuzzed corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val texts = Seq.fill(60)(Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = Search.collocations(texts.toDF("text"), "text", minCount = 3L, k = 100)
      .as[(String, String, Long, Long)].collect().toSeq

    val tokss = texts.map(_.split("\\s+").toSeq)
    val uni = tokss.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val t = uni.values.sum
    val bi = tokss.flatMap(ts => ts.zip(ts.drop(1))).groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }.filter(_._2 >= 3L)
    val want = bi.toSeq.map { case ((w1, w2), c12) =>
      (w1, w2, c12, c12 * t / (uni(w1) * uni(w2)))
    }.sortBy { case (w1, w2, c12, s) => (-s, -c12, w1, w2) }.take(100)
    assert(got === want)
  }

  test("canonicalizeUrl: every messiness class") {
    val cases = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag" ->
        "http://example.com/a/b?a=2&z=1",
      "https://Example.com:443/" -> "https://example.com/",
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      "http://example.com" -> "http://example.com/",
      "http://example.com/a//" -> "http://example.com/a",
      "http://example.com/?fbclid=abc&gclid=x" -> "http://example.com/",
      "http://example.com/p?b=2&a=1&utm_medium=m" -> "http://example.com/p?a=1&b=2",
      "ftp://Host.com:80/f" -> "ftp://host.com:80/f", // non-http keeps :80
      "relative/Path#f" -> "relative/path") // schemeless: defrag + lowercase only
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), UrlOps.canonicalize(col("url")).as("c"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(got === cases.map(_._2))
  }

  test("canonicalize is a fixed point on fuzzed URLs (canonical form re-canonicalizes to itself)") {
    val rnd = new scala.util.Random(13)
    val schemes = Seq("http", "HTTPS", "ftp", "")
    val urls = Seq.tabulate(200) { i =>
      val s = schemes(rnd.nextInt(schemes.size))
      val host = s"${if (rnd.nextBoolean()) "WWW." else ""}Host${rnd.nextInt(10)}.com"
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/", "/A/b", "/A/b/", "/x//")(rnd.nextInt(5))
      val query = Seq("", "?a=1", "?b=2&a=1&utm_source=x", "?utm_a=1", "?z=&a=3")(rnd.nextInt(5))
      val frag = Seq("", "#f")(rnd.nextInt(2))
      (i.toLong, (if (s.isEmpty) "" else s + "://") + host + port + path + query + frag)
    }
    val once = urls.toDF("i", "url")
      .select(col("i"), UrlOps.canonicalize(col("url")).as("c"))
    val twice = once.select(col("i"), col("c"), UrlOps.canonicalize(col("c")).as("c2"))
      .as[(Long, String, String)].collect()
    twice.foreach { case (i, c, c2) =>
      assert(c === c2, s"url #$i: canonicalize not idempotent: '$c' -> '$c2'")
    }
  }

  test("extractLinks harvests single- and double-quoted hrefs in order; host reads canonical urls") {
    val html = """<a href="http://A.com/x">1</a> <img src="i.png"/> <a class=y href='HTTPS://b.org/'>2</a>"""
    val links = Seq(html).toDF("h")
      .select(UrlOps.extractLinks(col("h")).as("l"))
      .as[Seq[String]].head()
    assert(links === Seq("http://A.com/x", "HTTPS://b.org/"))
    val hosts = links.toDF("u")
      .select(UrlOps.host(UrlOps.canonicalize(col("u"))).as("h"))
      .as[String].collect().toSet
    assert(hosts === Set("a.com", "b.org"))
  }

  test("dedupByCanonicalUrl keeps the min id per canonical group") {
    val df = Seq(
      (10L, "http://A.com/x?utm_source=1"),
      (3L, "HTTP://a.com:80/x"),
      (7L, "http://a.com/x/"),
      (5L, "https://b.com/y")).toDF("id", "url")
    val kept = UrlOps.dedupByCanonicalUrl(df, "id", "url")
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(3L, 5L))
  }

  test("histogram sketch: merge equals union; quantiles match a sorted-grid reference") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(500)((if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(10000).toLong))
    val df = vals.toDF("g", "v")
    val (a, b) = (df.filter(col("v") % 2 === 0), df.filter(col("v") % 2 === 1))
    val merged = Sketches.histogramMerge(
      Sketches.histogramSketch(a, Seq("g"), "v", 100L),
      Sketches.histogramSketch(b, Seq("g"), "v", 100L), Seq("g"))
    val direct = Sketches.histogramSketch(df, Seq("g"), "v", 100L)
    assert(rows(merged.orderBy("g", "bucket")) === rows(direct.orderBy("g", "bucket")))

    val got = Sketches.histogramQuantiles(merged, Seq("g"), Seq(50, 99), 100L)
      .select("g", "n", "p50", "p99").as[(String, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    val want = vals.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, vs) =>
      val buckets = vs.map(_._2 / 100L).sorted
      def q(p: Int) = buckets((((buckets.size.toLong * p + 99) / 100) - 1).toInt) * 100L
      (g, vs.size.toLong, q(50), q(99))
    }
    assert(got === want)
  }

  test("rrfFuse: hand-checked fusion, one-sided entries, tie-break") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Search.rrfFuse(a, b, "id", kConst = 60, topK = 10)
      .select("id", "rrf").as[(Long, Double)].collect().toSeq
    val want = Seq(
      20L -> (1.0 / 62 + 1.0 / 61), // both rankings
      10L -> 1.0 / 61,
      40L -> 1.0 / 62,
      30L -> 1.0 / 63)
    assert(got === want)
  }

  test("fillTokenBudget: greedy prefix, exact-boundary row kept, next dropped") {
    val d = Seq((1L, 100L, 5L), (2L, 90L, 3L), (3L, 80L, 2L), (4L, 70L, 4L))
      .toDF("id", "quality", "toks")
    // order by quality desc → cum 5, 8, 10, 14; budget 10 keeps 1..3 exactly
    val kept = graft.text.Sampling.fillTokenBudget(d, "toks", 10L,
        Seq(col("quality").desc, col("id").asc))
      .select("id", "cum_tokens").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(kept === Seq((1L, 5L), (2L, 8L), (3L, 10L)))
  }

  test("stripHtml: blocks, tags, entity order (&amp; last), whitespace collapse") {
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      "<script>var x = 1 < 2;</script>after" -> "after",
      "<style media=\"all\">p{}</style>text" -> "text",
      "a&nbsp;b&nbsp;&nbsp;c" -> "a b c",
      "&amp;lt; stays literal" -> "&lt; stays literal", // NOT '<'
      "&quot;q&quot; &#39;s&#39; &lt;x&gt; &amp;" -> "\"q\" 's' <x> &",
      "  spaced\t\nout  " -> "spaced out",
      "<SCRIPT a=1>ignore</SCRIPT >kept" -> "kept") // case-insensitive, space before >
    val got = cases.map(_._1).zipWithIndex.map { case (h, i) => (i, h) }
      .toDF("i", "h")
      .select(col("i"), graft.text.TextFunctions.stripHtml(col("h")).as("c"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(got === cases.map(_._2))
  }

  test("searchTopK plan prunes postings before the stats join (broadcasts only)") {
    val docs = viaParquet(Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"))
    val plan = Search.searchTopK(docs, "doc_id", "text", Seq("alpha"), 5)
      .queryExecution.executedPlan.toString
    // top-k must be a TakeOrderedAndProject, not a global sort
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("proximityMinSpan: hand-computed spans, both-terms requirement, top-k order") {
    val docs = viaParquet(Seq(
      (1L, "hash join is fast"),             // adjacent: span 1
      (2L, "join the big hash table hash"),  // min(3-0, ...) = 3
      (3L, "hash hash hash only"),           // missing 'join' → excluded
      (4L, "a join b c hash d join"),        // occurrences j@1, h@4, j@6 → min 2
      (5L, "nothing relevant here")).toDF("doc_id", "text"))
    val got = Search.proximityMinSpan(docs, "doc_id", "text", "hash", "join", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L, 1L, 1L), (4L, 1L, 2L, 2L), (2L, 2L, 1L, 3L)))
  }

  test("proximityMinSpan adjacency shortcut equals the brute-force pair minimum") {
    val rnd = new scala.util.Random(5)
    val vocab = Seq("hash", "join", "scan", "sort", "x", "y")
    val docs = (1 to 60).map(i =>
      (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = viaParquet(docs.toDF("doc_id", "text"))
    val got = Search.proximityMinSpan(df, "doc_id", "text", "hash", "join", 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").zipWithIndex
      val as = toks.filter(_._1 == "hash").map(_._2)
      val bs = toks.filter(_._1 == "join").map(_._2)
      if (as.isEmpty || bs.isEmpty) None
      else Some(id -> (for { a <- as; b <- bs } yield math.abs(a - b).toLong).min)
    }.toMap
    assert(got == expected)
  }
}
