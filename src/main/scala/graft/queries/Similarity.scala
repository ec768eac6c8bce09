package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expr.EmbedFunctions
import graft.util.{QueryDef, Tables}

/** Embedding similarity search (training-data ops).
  *
  * Exactness strategy (so BOTH queries carry full DuckDB oracles —
  * round 1 left them rows-only): vectors are quantized once to int64
  * (round(x*1000), the q_embed_knn_l2q recipe that already matched) and
  * every comparison key is integer-derived: the ranking key is
  * sign(dot)·dot²/(|a|²·|b|²), whose numerator and denominator are
  * exact integers < 2^53, so the single double division is bit-identical
  * across engines.
  *
  * - q_embed_cosine_topk: brute-force top-3 — the CORRECTNESS BASELINE,
  *   deliberately quadratic. The candidate matrix is broadcast and
  *   scanned per row in a dense kernel (the same memory contract as any
  *   broadcast join: one side fits per executor). The 10^12-row path is
  *   q_embed_ann_lsh.
  * - q_embed_ann_lsh: the SCALE path — 4 LSH tables × 16 random-
  *   hyperplane bits (codegen kernel; 65,536 buckets per table, vs 256
  *   total in round 1), deterministic per-bucket caps bounding the
  *   within-bucket join at any scale, exact quantized-cosine refine,
  *   top-1 per vector. The corpus plants a jittered twin per vector
  *   (+1e6 id, integer jitter on the quantized values) so recall is a
  *   meaningful, oracle-checked property: twins land in the same bucket
  *   with probability ≈ (1-θ/π)^16 per table, θ ≈ 0.005 rad.
  */
object Similarity {

  private val quantize =
    (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * 1000, 0).cast("long"))

  val defs: Seq[QueryDef] = Seq(

    // brute-force quantized-cosine top-3 neighbours per vector
    QueryDef(
      "q_embed_cosine_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), quantize(col("embedding")).as("q"))
          .withColumn("qq", aggregate(transform(col("q"), x => x * x),
            lit(0L), (a, v) => a + v))
          .filter(col("qq") > 0)
          .as[(Long, Seq[Long], Long)]
        val all = s.sparkContext.broadcast(
          emb.collect().map { case (id, q, qq) => (id, q.toArray, qq) }.sortBy(_._1))
        emb.mapPartitions { it =>
          val cand = all.value
          it.flatMap { case (id, qSeq, qq) =>
            val qa = qSeq.toArray
            val bestId = new Array[Long](3)
            val bestKey = Array.fill(3)(Double.NegativeInfinity)
            var ci = 0
            while (ci < cand.length) {
              val (oid, qb, oqq) = cand(ci)
              if (oid != id) {
                var dot = 0L
                var k = 0
                while (k < qa.length) { dot += qa(k) * qb(k); k += 1 }
                val dd = dot.toDouble
                val r = (dd * dd) / (qq.toDouble * oqq.toDouble)
                val key = if (dot < 0) -r else r
                var slot = -1
                var j = 2
                while (j >= 0 && (key > bestKey(j) ||
                    (key == bestKey(j) && oid < bestId(j)))) { slot = j; j -= 1 }
                if (slot >= 0) {
                  var m = 2
                  while (m > slot) {
                    bestKey(m) = bestKey(m - 1); bestId(m) = bestId(m - 1); m -= 1
                  }
                  bestKey(slot) = key; bestId(slot) = oid
                }
              }
              ci += 1
            }
            (0 until 3).filter(bestKey(_) > Double.NegativeInfinity)
              .map(r2 => (id, r2 + 1, bestId(r2)))
          }
        }.toDF("vec_id", "rk", "nn_id")
          .orderBy("vec_id", "rk")
      },
      Some("""WITH q AS (SELECT vec_id,
             |    list_transform(embedding, x -> round(x*1000)) AS q,
             |    list_sum(list_transform(embedding,
             |      x -> round(x*1000) * round(x*1000))) AS qq
             |  FROM embeddings)
             |SELECT vec_id, rk, nn_id FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |      (CASE WHEN list_inner_product(a.q, b.q) < 0 THEN -1 ELSE 1 END) *
             |      (list_inner_product(a.q, b.q) * list_inner_product(a.q, b.q))
             |        / (a.qq * b.qq) DESC,
             |      b.vec_id) AS rk
             |  FROM q a, q b
             |  WHERE a.vec_id <> b.vec_id AND a.qq > 0 AND b.qq > 0)
             |WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin)),

    // LSH-bucketed ANN over the twin-planted corpus: bucket equi-join,
    // per-bucket caps, exact quantized-cosine refine, top-1
    QueryDef(
      "q_embed_ann_lsh",
      (s, d) => {
        val base = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), quantize(col("embedding")).as("q"))
        // NOTE: jitter must key on the ORIGINAL id. Both Spark (lateral
        // column alias) and DuckDB resolve a same-named alias in the
        // same select list, so the original id gets its own name first.
        val twins = base.withColumnRenamed("vec_id", "ovid")
          .select((col("ovid") + 1000000L).as("vec_id"),
            transform(col("q"),
              (x, i) => x + pmod(col("ovid") * 31 + i, lit(7)) - 3).as("q"))
        val corpus = base.union(twins)
          .withColumn("qq", aggregate(transform(col("q"), x => x * x),
            lit(0L), (a, v) => a + v))
          .filter(col("qq") > 0)
        val keyed = corpus
          .select(col("vec_id"), posexplode(EmbedFunctions.lsh_buckets(col("q"))))
          .select(col("vec_id"), col("pos").as("t"), col("col").as("bucket"))
        // deterministic per-bucket cap: bounds the within-bucket join at
        // ANY scale (inert at test scale — buckets are tiny)
        val wCap = Window.partitionBy("t", "bucket")
          .orderBy(pmod(col("vec_id") * 2654435761L, lit(1000000007L)), col("vec_id"))
        val capped = keyed.withColumn("rn", row_number().over(wCap))
          .filter(col("rn") <= 1024).drop("rn")
        val pairs = capped.select(col("t"), col("bucket"), col("vec_id").as("a_id"))
          .join(capped.select(col("t"), col("bucket"), col("vec_id").as("b_id")),
            Seq("t", "bucket"))
          .filter(col("a_id") =!= col("b_id"))
          .select("a_id", "b_id").distinct()
        val qtab = corpus.select(col("vec_id"), col("q"), col("qq"))
        val den = col("qqa").cast("double") * col("qqb").cast("double")
        val num = col("dot").cast("double") * col("dot").cast("double")
        val scored = pairs
          .join(qtab.select(col("vec_id").as("a_id"), col("q").as("qa"),
            col("qq").as("qqa")), "a_id")
          .join(qtab.select(col("vec_id").as("b_id"), col("q").as("qb"),
            col("qq").as("qqb")), "b_id")
          .withColumn("dot", aggregate(zip_with(col("qa"), col("qb"),
            (x, y) => x * y), lit(0L), (a, v) => a + v))
          .withColumn("key", when(col("dot") < 0, -(num / den)).otherwise(num / den))
        val w = Window.partitionBy("a_id").orderBy(col("key").desc, col("b_id"))
        scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("a_id").as("vec_id"), col("b_id").as("ann_id"))
          .orderBy("vec_id")
      },
      Some("""WITH base AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS q
             |  FROM embeddings),
             |tw AS (SELECT vec_id + 1000000 AS tvid,
             |    list_transform(range(1, len(q)+1),
             |      i -> q[i] + (vec_id*31 + (i-1)) % 7 - 3) AS q
             |  FROM base),
             |c0 AS (SELECT * FROM base
             |  UNION ALL SELECT tvid AS vec_id, q FROM tw),
             |c AS (SELECT vec_id, q,
             |    list_transform(q, x -> CAST(x AS DOUBLE)) AS qd,
             |    list_sum(list_transform(q, x -> CAST(x*x AS DOUBLE))) AS qq
             |  FROM c0),
             |cc AS (SELECT * FROM c WHERE qq > 0),
             |hp AS (SELECT t, k,
             |    list_transform(range(0, 64), i ->
             |      CAST((2654435761 * ((t*16+k)*64 + i + 1)) % 1000003 - 501001 AS DOUBLE)) AS w
             |  FROM (SELECT unnest(range(0, 4)) AS t), (SELECT unnest(range(0, 16)) AS k)),
             |bk AS (SELECT cc.vec_id, hp.t,
             |    CAST(sum(CASE WHEN list_inner_product(cc.qd, hp.w) > 0
             |      THEN 1 << CAST(hp.k AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM cc, hp GROUP BY cc.vec_id, hp.t),
             |cap AS (SELECT vec_id, t, bucket FROM (
             |    SELECT vec_id, t, bucket, row_number() OVER (
             |      PARTITION BY t, bucket
             |      ORDER BY (vec_id*2654435761) % 1000000007, vec_id) AS rn FROM bk)
             |  WHERE rn <= 1024),
             |pr AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
             |  FROM cap a JOIN cap b ON a.t = b.t AND a.bucket = b.bucket
             |    AND a.vec_id <> b.vec_id),
             |sc AS (SELECT pr.a_id, pr.b_id,
             |    list_inner_product(ca.qd, cb.qd) AS dot, ca.qq*cb.qq AS den
             |  FROM pr JOIN cc ca ON ca.vec_id = pr.a_id
             |    JOIN cc cb ON cb.vec_id = pr.b_id)
             |SELECT a_id AS vec_id, b_id AS ann_id FROM (
             |  SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id ORDER BY
             |    (CASE WHEN dot < 0 THEN -1 ELSE 1 END) * (dot*dot) / den DESC,
             |    b_id) AS rk FROM sc)
             |WHERE rk = 1 ORDER BY vec_id""".stripMargin))
  )
}
