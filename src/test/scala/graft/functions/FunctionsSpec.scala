package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one = spark.range(1)

  test("tokens: empty and whitespace-only text tokenize to zero tokens") {
    val out = Seq("", "   ", "one", "two words").toDF("t")
      .select(TextFunctions.tokenCount($"t")).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 1L, 2L))
  }

  test("punctPerMille counts punctuation density") {
    val out = Seq(("....", 1000L), ("abcd", 0L), ("ab..", 500L), ("", 0L)).toDF("t", "want")
    assert(out.filter(TextFunctions.punctPerMille($"t") =!= $"want").count() == 0)
  }

  test("wordShingles yields n-grams and empty array for short docs") {
    val res = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3)).as[Seq[String]].collect()
    assert(res(0) == Seq("a b c", "b c d"))
    assert(res(1) == Seq.empty)
  }

  test("cleanText strips tags/control chars and collapses whitespace") {
    val out = Seq("<p>Hello</p>\t  world  <br/>ok", "  plain  ")
      .toDF("t").select(TextFunctions.cleanText($"t")).as[String].collect()
    assert(out(0) == "Hello world ok")
    assert(out(1) == "plain")
  }

  test("redactPii masks emails, IPs, and phone numbers") {
    val out = Seq(
      "mail me at jo.doe+x@sub.example.org today",
      "server 192.168.0.254 is up",
      "call +1 (555) 010-9999 now",
      "nothing sensitive here")
      .toDF("t").select(TextFunctions.redactPii($"t")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> is up")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "nothing sensitive here")
  }

  test("dupNgramPerMille measures repetition; caps/digit densities") {
    val rep = Seq("go go go go go").toDF("t")   // 4 bigrams, 1 distinct
      .select(TextFunctions.dupNgramPerMille($"t", 2)).as[Long].head()
    assert(rep == 750L)
    val uniq = Seq("a b c d e").toDF("t")
      .select(TextFunctions.dupNgramPerMille($"t", 2)).as[Long].head()
    assert(uniq == 0L)
    val caps = Seq("ABcd").toDF("t")
      .select(TextFunctions.capsPerMille($"t")).as[Long].head()
    assert(caps == 500L)
    val dig = Seq("a1b2").toDF("t")
      .select(TextFunctions.digitPerMille($"t")).as[Long].head()
    assert(dig == 500L)
  }

  test("dupLinePerMille / dupLineCharPerMille measure line repetition") {
    // 3 non-empty lines, 2 identical → (3-2)/3 = 333pm; duplicated lines
    // carry 8 of 11 line chars → 727pm
    val t = "same\nsame\nend"
    val out = Seq(t).toDF("t").select(
        TextFunctions.dupLinePerMille($"t").as("l"),
        TextFunctions.dupLineCharPerMille($"t").as("c"))
      .as[(Long, Long)].head()
    assert(out == ((333L, 727L)))
    // blank/whitespace lines are dropped before counting
    val out2 = Seq("a\n\n  \na").toDF("t")
      .select(TextFunctions.dupLinePerMille($"t")).as[Long].head()
    assert(out2 == 500L)
    assert(Seq("").toDF("t")
      .select(TextFunctions.dupLinePerMille($"t")).as[Long].head() == 0L)
    assert(Seq("one line only").toDF("t")
      .select(TextFunctions.dupLineCharPerMille($"t")).as[Long].head() == 0L)
  }

  test("topNgramCharPerMille covers chars of the most frequent n-gram") {
    // "go go" occurs 4x among the 5 bigrams; 4 × 5 chars / 14 chars = 1429
    // capped by reality: the windows overlap, but Gopher's rule counts
    // count × len(ngram) regardless — assert the exact formula
    val t = "go go go go go"  // length 14
    val v = Seq(t).toDF("t")
      .select(TextFunctions.topNgramCharPerMille($"t", 2)).as[Long].head()
    assert(v == math.floor(4.0 * 5 * 1000 / 14 + 0.5).toLong)
    // tie on count → lexicographically smallest n-gram wins (here "a b"
    // and "b c" both occur once; "a b" is chosen, 3 chars of 5)
    val v2 = Seq("a b c").toDF("t")
      .select(TextFunctions.topNgramCharPerMille($"t", 2)).as[Long].head()
    assert(v2 == 600L)
    assert(Seq("").toDF("t")
      .select(TextFunctions.topNgramCharPerMille($"t", 2)).as[Long].head() == 0L)
    assert(Seq("single").toDF("t")
      .select(TextFunctions.topNgramCharPerMille($"t", 2)).as[Long].head() == 0L)
  }

  test("langId picks the language with most stopword hits, und for none") {
    val out = Seq("the cat and dog", "der hund und die katze", "le chat et la mer", "xyzzy")
      .toDF("t").select(TextFunctions.langId($"t")).as[String].collect().toSeq
    assert(out == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint falls back to md5(text) for docs under 3 words") {
    val fp = Seq("tiny doc").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].head()
    val want = one.select(md5(lit("tiny doc"))).as[String].head()
    assert(fp == want)
  }

  test("simhash64 is identical for identical text, differs for different text") {
    val hs = Seq("a b c d e f", "a b c d e f", "completely different words here")
      .toDF("t").select(TextFunctions.simhash64($"t")).as[Long].collect()
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("hamming64 of x with itself is 0, of complements is 64") {
    val r = one.select(
      TextFunctions.hamming64(lit(5L), lit(5L)),
      TextFunctions.hamming64(lit(0L), lit(-1L))).as[(Int, Int)].head()
    assert(r == ((0, 64)))
  }

  test("dot/norm/cosine/l2 on known vectors") {
    val a = array(lit(1.0f), lit(2.0f), lit(2.0f))
    val b = array(lit(2.0f), lit(0.0f), lit(0.0f))
    val r = one.select(
      VectorFunctions.dot(VectorFunctions.toDouble(a), VectorFunctions.toDouble(b)),
      VectorFunctions.norm(VectorFunctions.toDouble(a)),
      VectorFunctions.cosine(a, b),
      VectorFunctions.l2Distance(a, b)).as[(Double, Double, Double, Double)].head()
    assert(r._1 == 2.0)
    assert(r._2 == 3.0)
    assert(math.abs(r._3 - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(math.abs(r._4 - 3.0) < 1e-12)
  }

  test("cosine of a zero-norm vector is 0.0, not NaN") {
    val z = array(lit(0.0f), lit(0.0f))
    val v = array(lit(1.0f), lit(1.0f))
    val r = one.select(VectorFunctions.cosine(z, v)).as[Double].head()
    assert(r == 0.0)
  }

  test("signLshBucket is deterministic and within [0, 2^bits)") {
    val v = array(lit(0.5f), lit(-1.0f), lit(2.0f))
    val r1 = one.select(VectorFunctions.signLshBucket(v, 8, 3)).as[Long].head()
    val r2 = one.select(VectorFunctions.signLshBucket(v, 8, 3)).as[Long].head()
    assert(r1 == r2 && r1 >= 0 && r1 < 256)
  }

  test("quantizeInt8 codes stay in [-127,127] and round-trip within scale/2") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))       // zero vector: no 0/0
      .toDF("id", "v")
    val out = df.select($"id",
        VectorFunctions.quantizeInt8($"v").as("qs"), $"v")
      .select($"id", $"qs.scale".as("scale"), $"qs.q".as("q"),
        VectorFunctions.dequantizeInt8($"qs").as("d"), $"v")
      .as[(Long, Double, Seq[Int], Seq[Double], Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    val (_, s1, q1, d1, v1) = out(1L)
    assert(s1 == 1.0 / 127)
    assert(q1.forall(q => q >= -127 && q <= 127))
    assert(q1.head == 127)                      // max element maps to ±127
    v1.zip(d1).foreach { case (orig, deq) =>
      assert(math.abs(deq - orig) <= s1 / 2 + 1e-12)
    }
    val (_, s2, q2, d2, _) = out(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0) && d2.forall(_ == 0.0))
  }

  test("randomProjection is deterministic, linear, salt-sensitive, ±1-valued") {
    val v = typedlit(Seq(1.0, 2.0, -3.0, 0.5))
    def proj(c: org.apache.spark.sql.Column, salt: String = "graft") =
      one.select(VectorFunctions.randomProjection(c, 4, 8, salt))
        .as[Seq[Double]].head()
    val p1 = proj(v)
    assert(p1.size == 8 && proj(v) == p1)                    // deterministic
    assert(proj(v, "other") != p1)                           // salt-sensitive
    // linearity: P(2v) = 2·P(v) exactly (±1 matrix, exact doubles)
    val p2 = proj(typedlit(Seq(2.0, 4.0, -6.0, 1.0)))
    assert(p2 == p1.map(_ * 2))
    // each output of a basis vector is exactly ±1
    val pb = proj(typedlit(Seq(0.0, 1.0, 0.0, 0.0)))
    assert(pb.forall(x => x == 1.0 || x == -1.0))
    // signs differ across output rows somewhere (the matrix isn't constant)
    assert(p1.distinct.size > 1)
  }

  test("gopher signals: symbol ratio, bullet/ellipsis lines, alpha words") {
    val t = "- first bullet\nthe plain line here\nnumbers 123 456\ntrailing off...\n### #"
    val row = Seq(t).toDF("t").select(
      TextFunctions.symbolWordRatioPerMille($"t").as("sym"),
      TextFunctions.bulletLinePerMille($"t").as("bul"),
      TextFunctions.ellipsisLinePerMille($"t").as("ell"),
      TextFunctions.alphaWordPerMille($"t").as("alpha"))
      .as[(Long, Long, Long, Long)].head()
    // 14 words; symbols: 4 '#' + 1 '...' = 5 → 5000/14 = 357
    assert(row._1 == 357L)
    // 5 lines, 1 bullet ('- first…'; '###' is not a bullet marker) → 200
    assert(row._2 == 200L)
    // 1 of 5 lines ends with '...' → 200
    assert(row._3 == 200L)
    // words with letters: 14 - (-, 123, 456, ###, #) = 9 → 643
    assert(row._4 == 643L)
  }

  test("ellipsisCount counts non-overlapping dot runs and the … char") {
    val out = Seq(("...", 1L), (".....", 1L), ("......", 2L), ("a…b…", 2L),
      ("..", 0L), ("…...", 2L)).toDF("t", "want")
    assert(out.filter(TextFunctions.ellipsisCount($"t") =!= $"want").count() == 0)
  }

  test("gopherKeep applies every rule conjunctively") {
    val good = (Seq.fill(30)("the quick brown fox jumps with energy") :+ "of it")
      .mkString(" ")  // 212 words, normal lengths, stopwords present
    val tooShort = "the cat sat with it"
    val symbols = (Seq.fill(60)("the word") :+ Seq.fill(20)("###").mkString(" ")).mkString(" ")
    val out = Seq(good, tooShort, symbols).toDF("t")
      .select(TextFunctions.gopherKeep($"t").as("k")).as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false))
  }

  test("sentencesOf splits after terminal punctuation, keeps it, skips blanks") {
    val out = Seq("One two. Three!  Four? no-end").toDF("t")
      .select(TextFunctions.sentencesOf($"t")).as[Seq[String]].head()
    assert(out == Seq("One two.", "Three!", "Four?", "no-end"))
    assert(Seq("").toDF("t").select(TextFunctions.sentenceCount($"t"))
      .as[Long].head() == 0L)
    // ellipsis-style runs split once, not per dot
    val ell = Seq("Wait... go").toDF("t")
      .select(TextFunctions.sentencesOf($"t")).as[Seq[String]].head()
    assert(ell == Seq("Wait...", "go"))
  }

  test("avgSentenceLenMilli averages sentence characters") {
    // "ab." (3 chars) + "c!" (2 chars) → 2500 milli-chars
    assert(Seq("ab. c!").toDF("t")
      .select(TextFunctions.avgSentenceLenMilli($"t")).as[Long].head() == 2500L)
  }

  test("script densities and dominant-script label") {
    val out = Seq(
      ("hello world", "latin"),
      ("привет мир", "cyrillic"),
      ("你好世界", "cjk"),
      ("hello world привет", "latin"),   // mixed, Latin-dominant
      ("12345 !!!", "und")).toDF("t", "want")
    assert(out.filter(TextFunctions.dominantScript($"t") =!= $"want").count() == 0)
    val pm = Seq("ab:гд").toDF("t").select(
      TextFunctions.latinPerMille($"t"), TextFunctions.cyrillicPerMille($"t"))
      .as[(Long, Long)].head()
    assert(pm == ((400L, 400L)))
  }

  test("luhnValid accepts checksum-correct cards only, within 13-19 digits") {
    val out = Seq(
      ("4111111111111111", true),
      ("4111111111111112", false),
      ("5500000000000004", true),
      ("1234567890123", false),
      ("41111111", false) // too short even if checksum passed
    ).toDF("d", "want")
    assert(out.filter(TextFunctions.luhnValid($"d") =!= $"want").count() == 0)
  }

  test("redactCreditCards masks validated numbers, keeps lookalikes") {
    val t = "pay 4111 1111 1111 1111 not 4111 1111 1111 1112 id 5500-0000-0000-0004."
    val got = Seq(t).toDF("t")
      .select(TextFunctions.redactCreditCards($"t")).as[String].head()
    assert(got == "pay <CC> not 4111 1111 1111 1112 id <CC>.")
  }

  test("htmlToText strips script/style/comments/tags and decodes entities last") {
    val html = "<html><head><style>p{x:1}</style><script>if(a<b){run()}</script>" +
      "</head><body><h1>Title</h1><!-- c1\nc2 --><p>body &amp;lt; text &lt;tag&gt;" +
      " &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"
    val got = Seq(html).toDF("h")
      .select(TextFunctions.htmlToText($"h")).as[String].head()
    // &amp;lt; decodes to the literal '&lt;' (amp decoded LAST), real
    // entities decode, tags/script/style/comments vanish
    assert(got == "Title body &lt; text <tag> \"q\" 's' end")
  }

  test("c4CleanLines keeps only terminal-punct ≥5-word non-JS lines") {
    val t = Seq(
      "This line has five words.",       // keep
      "no terminal punctuation here",    // drop: no terminal punct
      "Short line ends.",                // drop: 3 words
      "Did this question line survive?", // keep (ends ?)
      "Please enable JavaScript to view content.", // drop: javascript
      "He said the quote ends \"here.\"" // keep (ends ")
    ).mkString("\n")
    val got = Seq(t).toDF("t")
      .select(TextFunctions.c4CleanLines($"t")).as[String].head()
    assert(got == Seq("This line has five words.",
      "Did this question line survive?",
      "He said the quote ends \"here.\"").mkString("\n"))
  }

  test("c4Keep gates on sentences, lorem ipsum, braces, and bad words") {
    val ok = "One real sentence here now. Two more words follow here. " +
      "Third sentence closes the page."
    val cases = Seq(
      (ok, true),
      ("Only two sentences here now. Second one ends the page.", false),
      (ok + " Lorem Ipsum dolor sit amet.", false),
      (ok + " Code block { nested } marker.", false),
      (ok + " Buy cheap viagra pills now.", false))
    val out = cases.toDF("t", "want")
    assert(out.filter(TextFunctions.c4Keep($"t") =!= $"want").count() == 0)
  }

  test("c4Keep with an empty bad-word list gates on the other three rules") {
    // regression: badWords.map(...).reduce threw empty.reduce on
    // badWords = Nil (reachable from YAML c4Filter with badWords: [])
    val ok = "One real sentence here now. Two more words follow here. " +
      "Third sentence closes the page."
    val out = Seq(
      (ok + " Buy cheap viagra pills now.", true), // no bad-word rule at all
      (ok + " Code block { nested } marker.", false), // brace rule still live
      ("Only two sentences here now. Second one ends the page.", false))
      .toDF("t", "want")
    assert(out.filter(
      TextFunctions.c4Keep($"t", badWords = Nil) =!= $"want").count() == 0)
  }

  test("c4Keep bad-word match is whole-token, not substring") {
    // 'casinos' must NOT trip the 'casino' marker; bare 'casino' must
    val base = "First sentence is here now. Second sentence is here too. " +
      "Third sentence ends the doc."
    val out = Seq(
      (base + " The casinos word is plural.", true),
      (base + " The casino word is exact.", false)).toDF("t", "want")
    assert(out.filter(TextFunctions.c4Keep($"t") =!= $"want").count() == 0)
  }
}
