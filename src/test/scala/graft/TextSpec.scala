package graft

import org.apache.spark.sql.functions._
import graft.text.Text

/** Goldens for the corpus-cleaning text operators (the gate's fixture is
  * ASCII prose with no PII, so the interesting inputs live here). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails, SSNs, IPs and phones with exact counts") {
    val doc = "mail a@b.co or x.y+z@sub.example.org, ssn 123-45-6789, " +
      "host 10.0.255.1, call 555-867-5309 or 555.867.5309; keep 1.2 and v1.2.3"
    val out = Text.redactPii(Seq((1L, doc)).toDF("doc_id", "text"), "text")
      .select("redacted", "n_email", "n_ssn", "n_ipv4", "n_phone").head()
    assert(out.getInt(1) == 2, s"emails: $out")
    assert(out.getInt(2) == 1)
    assert(out.getInt(3) == 1)
    assert(out.getInt(4) == 2)
    val red = out.getString(0)
    assert(red.contains("<EMAIL>") && red.contains("<SSN>") &&
      red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("@") && !red.contains("123-45-6789") &&
      !red.contains("10.0.255.1"))
    // non-PII dotted fragments survive
    assert(red.contains("keep 1.2 and v1.2.3"))
  }

  test("termSalienceTopK ranks document-specific terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "alpha alpha shared shared shared"),
      (2L, "beta shared shared"),
      (3L, "gamma gamma gamma shared")).toDF("doc_id", "text")
    val top1 = Text.termSalienceTopK(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'shared' appears in every doc (df=3) so each doc's unique term wins
    assert(top1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    val all = Text.termSalienceTopK(docs, "doc_id", "text", k = 5)
    // salience = tf * N / df exactly
    val row = all.where(col("doc_id") === 1 && col("term") === "alpha").head()
    assert(row.getAs[Double]("salience") == 2.0 * 3 / 1)
  }

  test("lmScore ranks a garbled document far below corpus-typical text") {
    import graft.text.Text
    // a small corpus with repeated natural phrasing; doc 9 is symbol soup
    // whose transitions never recur — add-one smoothing must leave it at
    // the unseen-bigram floor while typical docs ride the trained counts
    val natural = "the quick brown fox jumps over the lazy dog near the river"
    val docs = ((1L to 8L).map(i => (i, s"$natural variant $i")) :+
      (9L, "zq xv wk jj qq vx kz pp ww xx yy zz")).toDF("doc_id", "text")
    val scores = Text.lmScore(docs, "doc_id", "text")
      .select("id", "avg_logprob").as[(Long, Double)].collect().toMap
    val garbled = scores(9L)
    val typical = (1L to 8L).map(scores)
    assert(typical.forall(_ > garbled + 1.0),
      s"garbled=$garbled typical=${typical.mkString(",")}")
    // n_bigrams is exact: tokens - 1 per doc
    val nb = Text.lmScore(docs, "doc_id", "text")
      .select("id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(nb(9L) == 11L && nb(1L) == 13L)
  }

  test("stripMarkup drops script content, comments, tags and entities " +
       "but keeps the text") {
    val docs = Seq(
      (1L, "<html><HEAD><style>body { color: red }</style></HEAD>" +
        "<body id=\"m\">Hello <b>world</b><!-- hidden note -->" +
        "<script>if (1 < 2) alert('x');</script> bye&nbsp;now</body></html>"),
      (2L, "plain text, no markup at all")
    ).toDF("doc_id", "text")
    val out = Text.stripMarkup(docs, "text")
      .select("doc_id", "n_tags", "clean_text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2)))
      .toMap
    // script/style CONTENT and the comment are gone; entities dropped;
    // tag count = html HEAD /HEAD body b /b /body /html = 8
    assert(out(1L) == (8, "Hello world bye now"),
      s"got ${out(1L)}")
    assert(out(2L) == (0, "plain text, no markup at all"))
  }

  test("qualityStats kernel is bit-identical to the declarative " +
       "higher-order-function pipeline on adversarial strings") {
    import org.apache.spark.sql.functions._
    val sw = Text.DefaultStopwords
    val rng = new scala.util.Random(41)
    val alphabet =
      "ab the of THE Of… ! #tag 3.14 \t\n  ñé 𝄞clef x-y a,b ... züA"
        .split(' ').toIndexedSeq
    val crafted = Seq("", " ", "\t\n", "the THE tHe", "…", "𝄞 𝄞 𝄞",
      "a  bc", "one", "-", "ñ é ü")
    val random = (1 to 200).map { _ =>
      (0 until rng.nextInt(40))
        .map(_ => alphabet(rng.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val df = (crafted ++ random).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    // the pre-kernel declarative pipeline, verbatim
    val t = col("text")
    val toks = Text.tokens(t)
    val swl = lit(sw.toArray)
    val declarative = df
      .withColumn("n_chars", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_punct",
        size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0))))
      .withColumn("punct_ratio",
        when(col("n_chars") > 0, col("n_punct").cast("double") / col("n_chars"))
          .otherwise(0.0))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
            col("n_tokens")).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          size(filter(toks, x => array_contains(swl, lower(x)))).cast("double") /
            col("n_tokens")).otherwise(0.0))
      .withColumn("uniq_token_ratio",
        when(col("n_tokens") > 0,
          size(array_distinct(toks)).cast("double") / col("n_tokens"))
          .otherwise(0.0))
    val cols = Seq("id", "n_chars", "n_tokens", "n_punct", "punct_ratio",
      "avg_token_len", "stopword_ratio", "uniq_token_ratio")
    val want = declarative.select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    val got = Text.qualityFeatures(df, "text", sw)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("gopherStats kernel is bit-identical to the declarative " +
       "higher-order-function pipeline on adversarial strings") {
    import org.apache.spark.sql.functions._
    val sw = Seq("the", "a", "and", "of", "value", "table")
    val rng = new scala.util.Random(43)
    val words = "the a - * • #x and… ... x... THE of \t ñ 𝄞 -lead value"
      .split(' ').toIndexedSeq
    val crafted = Seq("", "\n", " \n ", "- bullet\n* b2\n• b3", "end...",
      "end…\n...", "\tindент\nline", "only  spaces   here")
    val random = (1 to 200).map { _ =>
      (0 until rng.nextInt(30)).map { _ =>
        val w = words(rng.nextInt(words.size))
        if (rng.nextInt(6) == 0) w + "\n" else w + " "
      }.mkString
    }
    val df = (crafted ++ random).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val t = col("text")
    val toks = Text.tokens(t)
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val want = df.select(col("id"),
        size(toks).as("n_words"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("chars"),
        size(filter(toks, x => x.rlike("[A-Za-z]"))).as("alpha"),
        size(filter(toks, x =>
          x.startsWith("#") || x.contains("…") || x.contains("...")))
          .as("symbol"),
        size(lines).as("n_lines"),
        size(filter(lines, l => trim(l).rlike("^[-*•]"))).as("bullet"),
        size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
          .as("ellipsis"),
        size(array_intersect(array_distinct(transform(toks, lower _)),
          lit(sw.toArray))).as("stopword_hits"))
      .collect().map(_.toSeq).toSet
    val got = df.select(col("id"),
        graft.catalyst.TextFunctions.gopherStats(t, sw).as("g"))
      .select(col("id"), col("g.n_words"), col("g.chars"), col("g.alpha"),
        col("g.symbol"), col("g.n_lines"), col("g.bullet"),
        col("g.ellipsis"), col("g.stopword_hits"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
