package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.CorpusPipeline

/** Resumability of the crawl→training-set pipeline (the J9 contract on
  * the webtext side): stages commit once, resume with zero recompute,
  * a deleted stage recomputes alone, a changed parameter recomputes
  * only from the first affected stage. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmrf))
    p.delete()
  }

  private def run(root: String, budget: Long = 2048L,
      nearJaccMilli: Long = 500L) = {
    val gz = WebText.stagedPipeWarc(spark, sf)
    CorpusPipeline.run(spark, gz, root,
      WebText.htmlTextSql("page", WebText.sparkD),
      TextOps.PplVocab, TextOps.PplOov, TextOps.PplKeepBelow,
      budget = budget, nearJaccMilli = nearJaccMilli)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("shard", "bin").collect().map(_.toSeq.toList).toList

  test("stages commit once, resume fully, and a deleted stage recomputes alone") {
    val root = Files.createTempDirectory("corpuspipe").toString
    val (p1, s1) = run(root)
    val r1 = rows(p1)
    assert(r1.nonEmpty)
    assert(s1.values.forall(!_.resumed), "first run computes every stage")
    // dedup genuinely removed the planted exact dups (same text → same
    // filter verdict, so every surviving dup pair loses its copy)
    assert(s1("corpus_dedup").rows < s1("corpus_filter").rows)
    // the fuzzy stage genuinely removed the planted NEAR-dups (the
    // " near duplicate suffix" variants survive exact dedup but share
    // nearly all word-3-grams with their source docs)
    assert(s1("corpus_neardup").rows < s1("corpus_dedup").rows)

    val (p2, s2) = run(root)
    assert(s2.values.forall(_.resumed), "second run recomputes nothing")
    assert(rows(p2) === r1)

    // kill the LAST stage (data + manifest): only it recomputes
    val pk = s1("corpus_pack")
    rmrf(new java.io.File(pk.path))
    assert(new java.io.File(s"$root/_manifests/${pk.key}.json").delete())
    val (p3, s3) = run(root)
    assert(!s3("corpus_pack").resumed)
    assert(Seq("corpus_extract", "corpus_filter", "corpus_dedup",
      "corpus_neardup").forall(s3(_).resumed))
    assert(rows(p3) === r1, "recomputed stage reproduces the same report")
  }

  test("a changed parameter recomputes only from the first affected stage") {
    val root = Files.createTempDirectory("corpuspipe2").toString
    val (_, s1) = run(root)
    assert(s1.values.forall(!_.resumed))
    // budget only enters the pack stage's lineage: upstream resumes
    val (p2, s2) = run(root, budget = 1024L)
    assert(Seq("corpus_extract", "corpus_filter", "corpus_dedup",
      "corpus_neardup").forall(s2(_).resumed))
    assert(!s2("corpus_pack").resumed)
    // halved budget can only create MORE bins
    assert(p2.count() >= s1("corpus_pack").rows)
  }

  test("a jaccard-threshold change recomputes the fuzzy stage ALONE (plus pack)") {
    val root = Files.createTempDirectory("corpuspipe3").toString
    val (_, s1) = run(root)
    // jacc=1001/1000 is unreachable: the fuzzy stage keeps everything
    val (_, s2) = run(root, nearJaccMilli = 1001L)
    assert(Seq("corpus_extract", "corpus_filter", "corpus_dedup")
      .forall(s2(_).resumed),
      "stages upstream of the threshold resume untouched")
    assert(!s2("corpus_neardup").resumed && !s2("corpus_pack").resumed)
    assert(s2("corpus_neardup").rows === s1("corpus_dedup").rows,
      "unreachable threshold keeps every deduped doc")
    assert(s1("corpus_neardup").rows < s2("corpus_neardup").rows,
      "the default threshold genuinely removed near-dups")
    // back to the default: every stage (incl. fuzzy + pack) resumes
    val (_, s3) = run(root)
    assert(s3.values.forall(_.resumed))
    assert(s3("corpus_neardup").rows === s1("corpus_neardup").rows)
  }
}
