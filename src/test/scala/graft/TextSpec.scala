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
}
