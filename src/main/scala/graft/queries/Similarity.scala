package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.{QueryDef, Tables}

/** Embedding similarity search (training-data ops): brute-force cosine
  * top-k as the correctness baseline, and an LSH-bucketed (random
  * hyperplane signs, integer weights) variant as the scale path — at
  * 10^12 rows the bucket join replaces the quadratic cross join.
  * Float outputs are not DuckDB-hashable, so these are rows-only in the
  * driver gate and oracled exactly in SimilaritySpec. */
object Similarity {

  val defs: Seq[QueryDef] = Seq(

    // brute-force cosine top-3 neighbours per vector
    QueryDef(
      "q_embed_cosine_topk",
      (s, d) => {
        // brute force done the way a 10^12-row engine would: unit-
        // normalize once, broadcast the (small) candidate matrix, and
        // scan it per query row inside mapPartitions — a dense numeric
        // kernel with no per-pair row materialization (the cross-join
        // formulation shuffled two 64-double arrays per candidate pair
        // and was ~10x slower)
        import s.implicits._
        val emb = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), transform(col("embedding"),
            x => x.cast("double")).as("v"))
          .withColumn("n", sqrt(aggregate(transform(col("v"), x => x * x),
            lit(0.0), (acc, v) => acc + v)))
          .select(col("vec_id"),
            transform(col("v"), x => x / col("n")).as("u"))
          .as[(Long, Seq[Double])]
        val all = s.sparkContext.broadcast(
          emb.collect().map { case (id, u) => (id, u.toArray) }.sortBy(_._1))
        emb.mapPartitions { it =>
          val cand = all.value
          it.flatMap { case (id, uSeq) =>
            val u = uSeq.toArray
            // top-3 by (cos desc, id asc): tiny insertion buffer
            val bestId = new Array[Long](3)
            val bestCos = Array.fill(3)(-2.0)
            var ci = 0
            while (ci < cand.length) {
              val (oid, ov) = cand(ci)
              if (oid != id) {
                var dot = 0.0
                var k = 0
                while (k < u.length) { dot += u(k) * ov(k); k += 1 }
                var slot = -1
                var j = 2
                while (j >= 0 && (dot > bestCos(j) ||
                    (dot == bestCos(j) && oid < bestId(j)))) { slot = j; j -= 1 }
                if (slot >= 0) {
                  var m = 2
                  while (m > slot) {
                    bestCos(m) = bestCos(m - 1); bestId(m) = bestId(m - 1); m -= 1
                  }
                  bestCos(slot) = dot; bestId(slot) = oid
                }
              }
              ci += 1
            }
            (0 until 3).filter(bestCos(_) > -2.0)
              .map(r => (id, r + 1, bestId(r)))
          }
        }.toDF("vec_id", "rk", "nn_id")
          .orderBy("vec_id", "rk")
      },
      None),

    // LSH-bucketed ANN: 8 integer random-hyperplane sign bits -> bucket
    // equi-join -> exact cosine refine within bucket (the 10^12-scale
    // plan shape: no cross join, one shuffle on bucket id)
    QueryDef(
      "q_embed_ann_lsh",
      (s, d) => {
        val emb = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), transform(col("embedding"),
            x => x.cast("double")).as("v"))
        // deterministic integer weights w(k,i) = ((2654435761*(k*64+i+1))
        // mod 1000003) - 501001; sign bit k = [ sum_i v_i*w(k,i) > 0 ]
        val bucket = (0 until 8).map { k =>
          val proj = aggregate(
            zip_with(col("v"),
              transform(sequence(lit(0), size(col("v")) - 1),
                i => pmod(lit(2654435761L) * (lit(k * 64) + i + 1), lit(1000003L)) - 501001L),
              (x, wgt) => x * wgt.cast("double")),
            lit(0.0), (acc, p) => acc + p)
          when(proj > 0, lit(1 << k)).otherwise(lit(0))
        }.reduce(_ + _)
        val keyed = emb.withColumn("bucket", bucket)
        val a = keyed.select(col("vec_id").as("a_id"), col("v").as("va"), col("bucket"))
        val b = keyed.select(col("vec_id").as("b_id"), col("v").as("vb"), col("bucket"))
        val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
        a.join(b, Seq("bucket")).filter(col("a_id") =!= col("b_id"))
          .withColumn("dot", aggregate(zip_with(col("va"), col("vb"),
            (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
          .withColumn("na", sqrt(aggregate(transform(col("va"), x => x * x),
            lit(0.0), (acc, v) => acc + v)))
          .withColumn("nb", sqrt(aggregate(transform(col("vb"), x => x * x),
            lit(0.0), (acc, v) => acc + v)))
          .withColumn("cos", col("dot") / (col("na") * col("nb")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("a_id").as("vec_id"), col("b_id").as("ann_id"))
          .orderBy("vec_id")
      },
      None)
  )
}
