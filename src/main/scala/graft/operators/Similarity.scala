package graft.operators

import graft.functions.VectorKernels
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>` 64-dim).
  *
  * Scale design (100 TB): brute-force kNN is ONE pass over the corpus
  * per query batch — queries are broadcast, the corpus is never
  * shuffled, and the per-row cosine is a codegen'd higher-order-function
  * fold (no UDF). The ANN variant prunes candidates with random-
  * hyperplane LSH sign buckets (scan-filter on bucket hamming distance,
  * still shuffle-free) before the exact re-rank. Centroids are a single
  * posexplode + hash agg (64 rows per input row, partial-aggregated
  * map-side).
  *
  * FP parity with the DuckDB oracles: element values are cast to double
  * BEFORE multiplication and summed strictly left-to-right in both
  * engines (Spark `aggregate` fold ≡ explicit left-assoc `+` chain in
  * SQL), so cosines are bit-identical — ordering/limits are safe on the
  * unrounded value.
  */
object Similarity {

  private val DIM = 64

  /** Deterministic query vector (tenths, reproducible as SQL literals). */
  val queryVec: Seq[Double] = (0 until DIM).map(i => ((i * 37 % 19) - 9) / 10.0)
  private val qNorm2: Double = queryVec.map(x => x * x).sum

  private def f(d: Double): String = "%.17g".format(d)

  /** SQL: left-assoc dot product of `e`'s elements against queryVec. */
  private def dotConstSql(e: String): String =
    (0 until DIM).map(i =>
      s"CAST($e[${i + 1}] AS DOUBLE) * ${f(queryVec(i))}").mkString(" + ")

  /** SQL: left-assoc dot product of two embedding columns. */
  private def dotSql(a: String, b: String): String =
    (0 until DIM).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)")
      .mkString(" + ")

  val defs: Seq[QueryDef] = Seq(

    // ── Q50: brute-force cosine top-10 against a constant query vector.
    QueryDef("q50_knn_query",
      (s, dir) => {
        val cos = VectorKernels.dotConst(col("embedding"), queryVec) /
          (VectorKernels.norm(col("embedding")) * lit(math.sqrt(qNorm2)))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), cos.as("cos_raw"))
          .orderBy(col("cos_raw").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("cos_raw").as("cosine"))
      },
      Some(s"""WITH scored AS (
              |  SELECT vec_id,
              |    (${dotConstSql("embedding")})
              |      / (sqrt(${dotSql("embedding", "embedding")})
              |         * sqrt(${f(qNorm2)})) AS cos_raw
              |  FROM embeddings)
              |SELECT vec_id, cos_raw AS cosine
              |FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin)),

    // ── Q51: batch kNN — top-3 cosine neighbors for the first 20
    // vectors; queries broadcast, corpus scanned once.
    QueryDef("q51_knn_pairs",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
        val cos = VectorKernels.dot(col("qe"), col("ce")) /
          (VectorKernels.norm(col("qe")) * VectorKernels.norm(col("ce")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_raw").desc, col("cand_id"))
        broadcast(q).join(c, col("query_id") =!= col("cand_id"))
          .select(col("query_id"), col("cand_id"), cos.as("cos_raw"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("query_id"), col("rn"), col("cand_id"),
            col("cos_raw").as("cosine"))
          .orderBy(col("query_id"), col("rn"))
      },
      Some(s"""WITH scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
              |    (${dotSql("a.embedding", "b.embedding")})
              |      / (sqrt(${dotSql("a.embedding", "a.embedding")})
              |         * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cos_raw
              |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              |  WHERE a.vec_id < 20),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |    ORDER BY cos_raw DESC, cand_id) AS rn
              |  FROM scored)
              |SELECT query_id, rn, cand_id, cos_raw AS cosine
              |FROM ranked WHERE rn <= 3
              |ORDER BY query_id, rn""".stripMargin)),

    // ── Q52: per-label centroids — posexplode + hash agg (the IVF
    // coarse-quantizer training step).
    QueryDef("q52_label_centroids",
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("v").cast("double")), 4).as("centroid_v"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("dim")),
      Some("""SELECT label, dim, round(avg(v), 4) AS centroid_v, count(*) AS n
             |FROM (
             |  SELECT label,
             |    generate_subscripts(embedding, 1) - 1 AS dim,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings)
             |GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // ── Q53: LSH-pruned ANN — random-hyperplane sign bucket, keep
    // candidates within hamming ≤ 28 of the query's 64-bit bucket,
    // exact re-rank. Rows-only check; recall vs q50 is unit-tested.
    // (Calibrated for this near-orthogonal corpus: neighbors at cosine
    // ≈ 0.4 ⇒ expected sign disagreement 64·θ/π ≈ 23.6 bits (σ≈3.9) vs
    // 32 (σ=4) for the isotropic bulk ⇒ radius 28 keeps ~90% of true
    // top-10 while pruning ~84% of the corpus; more planes concentrate
    // both distributions, and clustered real corpora separate far
    // better. At scale the bucket is an ingest-time stored column —
    // computed once per row, not per query — so query cost is the
    // bit_count filter plus exact re-rank of survivors.)
    QueryDef("q53_ann_lsh",
      (s, dir) => {
        val nPlanes = 64
        val bucket = VectorKernels.lshBucket(col("embedding"), DIM, nPlanes)
        // query bucket, computed with the same plane formula driver-side
        val qBucket = (0 until nPlanes).map { p =>
          val d = VectorKernels.plane(p, DIM).zip(queryVec)
            .map { case (a, b) => a * b }.foldLeft(0.0)(_ + _)
          if (d >= 0.0) 1L << p else 0L
        }.sum
        val cos = VectorKernels.dotConst(col("embedding"), queryVec) /
          (VectorKernels.norm(col("embedding")) * lit(math.sqrt(qNorm2)))
        Tables.embeddings(s, dir)
          .withColumn("bucket", bucket)
          .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= 28)
          .select(col("vec_id"), cos.as("cos_raw"))
          .orderBy(col("cos_raw").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("cos_raw"), 6).as("cosine"))
      },
      None),

    // ── Q54: embedding near-duplicate pairs — multiprobe LSH: slice the
    // 16-plane sign bucket into 4×4-bit bands and equi-join on
    // (band_idx, band_val); pigeonhole guarantees any pair within
    // hamming ≤ 3 of sign bits shares a band. Exact cosine re-rank
    // keeps pairs ≥ 0.45 (this corpus is near-orthogonal — max pairwise
    // cosine ≈ 0.51 — so the threshold is "most-similar", not 0.95+).
    // Scale: candidate generation is an equi-join on the band key, not
    // an all-pairs cross join.
    QueryDef("q54_embed_neardup",
      (s, dir) => {
        val bucket = VectorKernels.lshBucket(col("embedding"), DIM, 16)
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"), bucket.as("bucket"))
        val sliced = e.select(col("vec_id"), col("embedding"),
          posexplode(array((0 until 4).map(i =>
            shiftrightunsigned(col("bucket"), 4 * i).bitwiseAND(lit(15L))): _*))
            .as(Seq("band_idx", "band_val")))
        val a = sliced.select(col("band_idx"), col("band_val"),
          col("vec_id").as("vec_a"), col("embedding").as("ea"))
        val b = sliced.select(col("band_idx").as("bi"),
          col("band_val").as("bv"), col("vec_id").as("vec_b"),
          col("embedding").as("eb"))
        val cos = VectorKernels.dot(col("ea"), col("eb")) /
          (VectorKernels.norm(col("ea")) * VectorKernels.norm(col("eb")))
        a.join(b, col("band_idx") === col("bi") &&
            col("band_val") === col("bv") && col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b")).distinct()
          .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
          .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
          .select(col("vec_a"), col("vec_b"), cos.as("cosine"))
          .filter(col("cosine") >= 0.45)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      None))
}
