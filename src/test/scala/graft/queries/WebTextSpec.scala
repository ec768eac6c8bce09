package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.LinkRank

/** Row-level semantics of the web-text operators (the gates compare
  * whole results against DuckDB; these pin the per-row rules on
  * hostile hand literals). */
class WebTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(page: String): String =
    Seq(page).toDF("page")
      .select(expr(WebText.htmlTextSql("page", WebText.sparkD)).as("t"))
      .head().getString(0)

  test("html extraction strips blocks/tags, decodes entities, normalizes whitespace") {
    val page = "<html><head><script a=\"b\">if (x<3) && y > 2 { <fake> }</script>" +
      "<style>a{color:red}</style></head><body>\tHello <b>World</b>\n" +
      "<!-- no <i>really</i> -->&amp;lt; &lt;tag&gt; &quot;q&quot; &#39;s &amp; done</body></html>"
    assert(extract(page) === "Hello World &lt; <tag> \"q\" 's & done")
  }

  test("html extraction: double-escaped entities decode exactly one level") {
    assert(extract("<p>&amp;amp; &amp;#39;</p>") === "&amp; &#39;")
  }

  test("html extraction: unterminated script degrades to text (pinned)") {
    // the block rule needs a closing tag; without one the open tag is
    // stripped by the generic tag pass and the script BODY survives as
    // text — pinned so a future "fix" is a conscious semantic change
    assert(extract("<p>keep</p><script>var leak = 1;") === "keep var leak = 1;")
  }

  private def canon(u: String): String =
    Seq(u).toDF("url_raw")
      .select(expr(WebText.urlCanonSql(WebText.sparkD)).as("c"))
      .head().getString(0)

  test("url canonicalization: case, default port, fragment, param order") {
    assert(canon("HTTP://Example.COM:80/p/5?b=2&a=1#frag") ===
      "http://example.com/p/5?a=1&b=2")
    assert(canon("https://Other.ORG:8080/x/9?z=9&y=8#top") ===
      "https://other.org:8080/x/9?y=8&z=9")
    assert(canon("https://other.org/x/7") === "https://other.org/x/7")
    assert(canon("https://EX.org:443") === "https://ex.org/")
    assert(canon("http://ex.org:8080/") === "http://ex.org:8080/")
  }

  private def tf(text: String, term: String): Long =
    Seq(text).toDF("text")
      .select(expr(WebText.tfSql(term, WebText.sparkD)).cast("long").as("n"))
      .head().getLong(0)

  test("bm25 tf: padded non-overlapping token count") {
    assert(tf("spark a spark", "spark") === 2L)
    assert(tf("sparkle spark", "spark") === 1L)
    assert(tf("no match here", "spark") === 0L)
    // documented non-overlap: adjacent duplicates share the pad space
    assert(tf("spark spark hash", "spark") === 1L)
  }

  test("link rank: a 1-regular permutation graph is an exact fixed point") {
    val nodes = (0L until 8L).toDF("id")
    val edges = nodes.select(col("id").as("src"),
      pmod(col("id") + 1, lit(8L)).as("dst"))
    val r = LinkRank.run(spark, nodes, edges, iters = 3)
      .select("r").distinct().collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(LinkRank.Scale))
  }

  test("link rank: hand-computed 3-node graph, 2 iterations") {
    // 0→1, 1→0, 2→0 (all outdeg 1)
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val got = LinkRank.run(spark, nodes, edges, iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // iter1: r(0)=150000+850·2e6/1000=1850000, r(1)=1000000, r(2)=150000
    // iter2: r(0)=150000+850·1150000/1000=1127500,
    //        r(1)=150000+850·1850000/1000=1722500, r(2)=150000
    assert(got === Seq((0L, 1127500L), (1L, 1722500L), (2L, 150000L)))
  }

  private val sf = "/root/testdata/sf0.001"

  test("q_url_canon collapses the planted variant pairs") {
    val rows = graft.SparkEntry.queries("q_url_canon")(spark, sf)
      .filter(col("n_variants") === 2).count()
    assert(rows > 0)
  }

  test("q_bm25_topk: 20 rows, non-increasing scores, positive") {
    val got = graft.SparkEntry.queries("q_bm25_topk")(spark, sf)
      .collect().map(_.getLong(1)).toSeq
    assert(got.length === 20)
    assert(got === got.sorted.reverse)
    assert(got.last > 0)
  }

  test("q_pagerank: every rank at or above the damping floor") {
    val r = graft.SparkEntry.queries("q_pagerank")(spark, sf)
    assert(r.filter(col("rank_fp") < 150000L).count() === 0)
    assert(r.filter(col("rank_fp") > LinkRank.Scale).count() > 0)
  }

  test("q_anchor_text: link mass conserved, top anchor bounded by total") {
    val r = graft.SparkEntry.queries("q_anchor_text")(spark, sf)
      .localCheckpoint()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val sums = r.agg(sum("n_links")).head().getLong(0)
    assert(sums === 3L * docs, "every synthesized link lands on some dst")
    assert(r.filter(col("top_cnt") > col("n_links")).count() === 0)
    assert(r.filter(col("n_anchors") < 1).count() === 0)
    // generic anchors genuinely dominate somewhere (the skew premise)
    assert(r.filter(col("top_anchor").isin(
      "click here", "read more", "homepage")).count() > 0)
  }

  test("q_pii_redact: no email or dashed phone survives redaction") {
    val r = graft.SparkEntry.queries("q_pii_redact")(
      spark, "/root/testdata/sf0.001").localCheckpoint()
    assert(r.filter(col("redacted").contains("@")).count() === 0)
    assert(r.filter(col("redacted")
      .rlike("[0-9]{3}-[0-9]{3}-[0-9]{4}")).count() === 0)
    assert(r.filter(!col("redacted").contains("<EMAIL>")).count() === 0)
    assert(r.filter(!col("redacted").contains("<PHONE>")).count() === 0)
    // synthesized email counts are exact: 2 on doc_id % 3 == 0, else 1
    assert(r.filter(col("n_emails") =!=
      when(pmod(col("doc_id"), lit(3L)) === 0, 2L).otherwise(1L))
      .count() === 0)
  }

  test("q_grouping_sets: grand-total row equals table count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val total = graft.SparkEntry.queries("q_grouping_sets")(spark, sf)
      .filter(col("g_lang") === 1 && col("g_source") === 1)
      .select("n").head().getLong(0)
    assert(total === docs)
  }
}
