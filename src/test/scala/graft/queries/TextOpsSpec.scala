package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Row-level semantics of the corpus-filtering operators added in r7
  * (the gates value-check whole results against DuckDB; these pin the
  * semantic rules on the sf0.001 fixture). */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_para_dedup: boilerplate survives in exactly one document") {
    val r = graft.SparkEntry.queries("q_para_dedup")(spark, sf)
      .localCheckpoint()
    val boiler = "copyright boilerplate all rights reserved"
    val carriers = r.filter(col("text_dedup").contains(boiler)).collect()
    assert(carriers.length === 1, "first occurrence only")
    assert(carriers.head.getLong(0) === 0L, "kept in the min doc_id")
    // every doc accounts for all its paragraphs: 3 when doc_id%5=0
    // (promo line planted), else 2
    val bad = r.filter(
      col("n_kept") + col("n_dropped") =!=
        when(pmod(col("doc_id"), lit(5)) === 0, 3L).otherwise(2L)).count()
    assert(bad === 0)
    // every doc keeps its own (unique) content paragraph
    assert(r.filter(col("n_kept") === 0).count() === 0)
  }

  test("q_ppl_filter: keep flag is exactly the threshold rule, OOV raises the score") {
    val r = graft.SparkEntry.queries("q_ppl_filter")(spark, sf)
      .localCheckpoint()
    val bad = r.filter(
      col("kept") =!= (col("nll_micro") < TextOps.PplKeepBelow).cast("int"))
      .count()
    assert(bad === 0)
    // scores live between the best vocab word and the OOV penalty
    val mn = TextOps.PplVocab.map(_._2).min
    assert(r.filter(col("nll_micro") < mn).count() === 0)
    assert(r.filter(col("nll_micro") > TextOps.PplOov).count() === 0)
    // the corpus genuinely splits (both classes present)
    assert(r.filter(col("kept") === 1).count() > 0)
    assert(r.filter(col("kept") === 0).count() > 0)
  }

  test("substr dedup: planted exact dups fully covered; trim empties them") {
    val rep = graft.SparkEntry.queries("q_substr_dedup")(spark, sf)
      .localCheckpoint()
    // corpus plants doc_id+2000000 as byte-exact copies: every 5-gram
    // occurrence there is non-first, so coverage is total
    val dupDocs = rep.filter(col("doc_id") >= 2000000L)
    assert(dupDocs.count() > 0)
    assert(dupDocs.filter(col("dup_milli") =!= 1000L).count() === 0)
    val trim = graft.SparkEntry.queries("q_substr_trim")(spark, sf)
      .localCheckpoint()
    assert(trim.filter(col("doc_id") >= 2000000L)
      .filter(col("text_trim") =!= "" || col("kept_tokens") =!= 0L)
      .count() === 0, "exact dups are removed from the trimmed corpus")
    // kept + covered = total everywhere (trim drops exactly the cover)
    val joined = rep.select("doc_id", "n_tokens", "covered_tokens")
      .join(trim.select("doc_id", "kept_tokens"), "doc_id")
    assert(joined.filter(
      col("kept_tokens") + col("covered_tokens") =!= col("n_tokens"))
      .count() === 0)
  }

  test("pack materialization agrees with the packing report bin-for-bin") {
    val rep = graft.SparkEntry.queries("q_pack_sequences")(spark, sf)
      .select("shard", "bin", "n_docs", "fill_toks")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val mat = graft.SparkEntry.queries("q_pack_materialize")(spark, sf)
      .collect()
    assert(mat.nonEmpty)
    for (r <- mat) {
      val key = (r.getLong(0), r.getLong(1))
      assert(rep(key) === ((r.getLong(2), r.getLong(3))),
        s"bin $key docs/tokens must match the q_pack_sequences report")
      // the materialized stream really carries bin_tokens ids
      val ids = r.getString(4).split(" ").filter(_.nonEmpty)
      assert(ids.length.toLong === r.getLong(3))
      assert(ids.forall(_.forall(_.isDigit)))
    }
  }

  test("q_dsir_sample: keep rule exact, rate monotone in the importance weight") {
    val r = graft.SparkEntry.queries("q_dsir_sample")(spark, sf)
      .localCheckpoint()
    val bad = r.filter(col("kept") =!=
      (pmod(col("doc_id") * 2654435761L, lit(1000L)) < col("keep_milli"))
        .cast("int")).count()
    assert(bad === 0, "selection must be exactly the deterministic hash rule")
    // monotone: sort by weight, rates must be non-decreasing
    val pairs = r.select("wt_micro", "keep_milli")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    assert(pairs.sliding(2).forall {
      case Array((_, k1), (_, k2)) => k1 <= k2
      case _ => true
    })
    // the fixture genuinely spreads across the rate range
    assert(pairs.head._2 === 0L && pairs.last._2 > 900L)
  }

  test("q_gopher_rules: pass is exactly the conjunction, rules discriminate") {
    val r = graft.SparkEntry.queries("q_gopher_rules")(spark, sf)
      .localCheckpoint()
    val bad = r.filter(col("pass") =!=
      (col("ok_count") === 1 && col("ok_meanlen") === 1 &&
        col("ok_alpha") === 1 && col("ok_stop") === 1).cast("int")).count()
    assert(bad === 0)
    assert(r.filter(col("pass") === 1).count() > 0)
    assert(r.filter(col("pass") === 0).count() > 0, "rules must discriminate")
    // sanity on the algebra: all-alphabetic corpus → alpha_milli = 1000
    assert(r.filter(col("alpha_milli") < 900).count() === 0)
  }

  test("q_decontaminate: eval-set copies die at 1000‰, short docs are kept") {
    val r = graft.SparkEntry.queries("q_decontaminate")(spark, sf)
      .localCheckpoint()
    // the eval set is documents % 37 == 0, and those docs are in the
    // corpus verbatim → every 8-gram contaminated → dropped
    val evalCopies = r.filter(pmod(col("doc_id"), lit(37L)) === 0 &&
      col("doc_id") < 1000000L && col("total8") > 0)
    assert(evalCopies.count() > 0)
    assert(evalCopies.filter(col("contam_milli") =!= 1000L ||
      col("kept") =!= 0).count() === 0,
      "verbatim eval docs must be fully contaminated and dropped")
    // docs under 8 words have no 8-grams: total8 = 0 and kept = 1
    assert(r.filter(col("total8") === 0 && col("kept") =!= 1).count() === 0)
    // contamination discriminates: most non-eval docs are clean
    val clean = r.filter(col("kept") === 1).count()
    assert(clean > r.count() / 2, s"only $clean/${r.count()} kept")
  }

  test("q_bpe_pair_stats: weighted pair counts under the reduced vocab") {
    val rows = graft.SparkEntry.queries("q_bpe_pair_stats")(spark, sf)
      .collect()
    assert(rows.length === 20, "full top-20 under the mid-training vocab")
    val ns = rows.map(_.getLong(2))
    assert(ns.sameElements(ns.sorted.reverse), "ordered by count desc")
    assert(ns.forall(_ >= 1L))
    // pair ids live in the reduced vocab's id space (≤3-char entries)
    // or the single-char fallback band
    val fb = graft.expr.SubwordVocab.FallbackBase
    val vocabSize = graft.expr.SubwordVocab.default.entries
      .count(_.length <= 3)
    for (r <- rows; c <- Seq(r.getLong(0), r.getLong(1)))
      assert(c < vocabSize || c >= fb, s"token id $c outside both bands")
  }

  test("ppl scoring: hand-checked doc against the fixed model") {
    // "a the join zzz" → 1200000 + 1500000 + 2500000 + 9000000 = 14200000
    // over 4 words → 3550000 (< threshold → kept)
    val vocab = broadcast(TextOps.PplVocab.toDF("w", "nlp"))
    val got = Seq((1L, "a the join zzz")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .join(vocab, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("nlp"), lit(TextOps.PplOov))).as("s"))
      .select(expr("s DIV n")).head().getLong(0)
    assert(got === 3550000L)
  }
}
