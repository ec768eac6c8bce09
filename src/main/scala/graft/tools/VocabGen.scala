package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: regenerate `src/main/resources/graft/subword_vocab.txt`,
  * the default [[graft.expr.SubwordVocab]].
  *
  * The vocab is deterministic and fully derivable from the repo +
  * testdata: (1) BPE merges trained to saturation on the sf0.1
  * `documents` table (the corpus has ~30 distinct words, so merges
  * saturate after a few hundred — these contribute the REAL multi-length
  * entries, up to whole words, that actually fire on the corpus), then
  * padded past the 1k mark with (2) every two-letter combination
  * aa..zz and (3) every three-letter combination of the corpus' 8 most
  * frequent letters — deterministic bulk that stresses vocab size and
  * the longest-match rule without changing which long entries win.
  *
  * Usage: runMain graft.tools.VocabGen [sfDir] — prints the file body
  * to stdout; redirect into the resource file.
  */
object VocabGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // word -> frequency (driver-side: the tool trains on a fixed small
    // SF; the RESULT is frozen in-repo, production never runs this)
    val wordFreq: Map[String, Long] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .selectExpr("explode(split(lower(text), ' ')) AS w")
      .filter("length(w) > 1")
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap

    // ---- classic BPE to saturation ----
    // symbol sequences start as single characters; each round merges
    // the globally most frequent adjacent pair (ties: lexicographic)
    var words: Map[Vector[String], Long] =
      // seed symbols from CODE POINTS, not UTF-16 chars: supplementary-
      // plane corpus text must never seed lone-surrogate symbols (they
      // would emit unmatchable, invalid-UTF-8 vocab entries and break
      // the code-point convention SubwordVocab enforces)
      wordFreq.map { case (w, f) =>
        (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))), f) }
    val merged = scala.collection.mutable.LinkedHashSet.empty[String]
    var more = true
    while (more) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (pairs.isEmpty) more = false
      else {
        val ((a, b), _) = pairs.toSeq
          .sortBy { case ((x, y), f) => (-f, x, y) }.head
        merged += (a + b)
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }

    // ---- deterministic padding ----
    val letters = 'a' to 'z'
    val freqLetters = wordFreq.toSeq
      .flatMap { case (w, f) => w.map(c => (c, f)) }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy { case (c, f) => (-f, c) }
      .take(8).map(_._1).sorted
    val bigrams = for (a <- letters; b <- letters) yield s"$a$b"
    val trigrams =
      for (a <- freqLetters; b <- freqLetters; c <- freqLetters)
        yield s"$a$b$c"

    val out = (merged.toSeq ++ bigrams ++ trigrams).distinct
    System.err.println(s"${merged.size} BPE merges + padding -> " +
      s"${out.length} entries, maxLen ${out.map(_.length).max}")
    out.foreach(println)
    spark.stop()
  }
}
