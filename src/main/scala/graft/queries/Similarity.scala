package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths:
  *  - brute-force cosine top-k for a small query set: broadcast the query
  *    vectors, one scan over candidates, per-partition top-k heap
  *    (row_number over a bounded group) — at 100 TB this is
  *    scan-bound and embarrassingly parallel;
  *  - random-hyperplane LSH bucketing: 8 md5-derived ±1 hyperplanes map each
  *    vector to a 8-bit bucket; search compares only within-bucket, so the
  *    pair space shrinks ~256× and the bucket groupBy is the only shuffle.
  *
  * All arithmetic is folded in double with the same association order as the
  * DuckDB oracle, and hyperplane signs are md5-derived, so both engines
  * compute identical buckets/scores.
  */
object Similarity extends QuerySet {

  private def embD(name: String): Column =
    transform(col(name), x => x.cast("double"))

  /** Native codegen'd dot product (graft.functions.ArrayDot) — same
    * left-fold as `aggregate(zip_with(...))`, ~3× faster on the pair paths.
    * Sessions are registered lazily by [[Similarity.withDot]].
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a, b)

  private def withDot(s: SparkSession): SparkSession = {
    graft.functions.GraftFunctions.register(s); s
  }

  /** Hyperplane sign vectors, precomputed once on the driver. Plane j's
    * i-th component is +1 when the first hex digit of md5("j-i") < '8' —
    * the same formula the DuckDB oracle evaluates in SQL, so buckets are
    * bit-identical. Materializing them as literal arrays keeps the per-row
    * work at 64 multiplies per plane; inlining the md5 into the expression
    * would recompute 8×64 digests per row (measured 10× slower at sf0.1).
    */
  private lazy val planeSigns: IndexedSeq[IndexedSeq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 8).map { j =>
      (1 to 64).map { i =>
        val hex = md.digest(s"$j-$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0) < '8') 1.0 else -1.0
      }
    }
  }

  /** Signed projection of `emb` onto plane j using the literal sign array. */
  private def planeDot(j: Int): Column =
    dot(col("emb"), array(planeSigns(j).map(lit): _*))

  private def bucketExpr: Column =
    (0 until 8)
      .map(j => when(planeDot(j) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Brute-force cosine top-k: queries = vec_id < 10, k = 5. */
  def sim36(s0: SparkSession, dir: String): DataFrame = {
    val s = withDot(s0)
    val e = Q.t(s, dir, "embeddings")
      .select(col("vec_id"), embD("embedding").as("emb"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("norm").as("q_norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_full").desc, col("vec_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_full",
        dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos_full"), 4).as("cos"))
  }

  /** Hyperplane-LSH bucketing: vec → 8-bit bucket + bucket population.
    * Plane j's i-th component is ±1 from md5("j-i") — reproducible in SQL.
    */
  def sim37(s0: SparkSession, dir: String): DataFrame = {
    val s = withDot(s0)
    val e = Q.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), embD("embedding").as("emb"))
      .withColumn("bucket", bucketExpr.cast("int"))
    val sizes = e.groupBy("bucket").agg(count(lit(1)).as("bucket_size"))
    e.join(broadcast(sizes), "bucket")
      .select("vec_id", "label", "bucket", "bucket_size")
  }

  /** LSH-accelerated near-neighbor pairs: within-bucket cosine >= 0.25.
    * The quadratic work is confined to each bucket.
    */
  def sim38(s0: SparkSession, dir: String): DataFrame = {
    val s = withDot(s0)
    val e = sim37Base(s, dir)
    val cosine = dot(col("x.emb"), col("y.emb")) / (col("x.norm") * col("y.norm"))
    e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", round(cosine, 4))
      .filter(col("cos") >= 0.25)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.bucket").as("bucket"), col("cos"))
  }

  private def sim37Base(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "embeddings")
      .select(col("vec_id"), embD("embedding").as("emb"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
      .withColumn("bucket", bucketExpr.cast("int"))

  /** Embeddings with norms, shared by the IVF queries. */
  private def normed(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "embeddings")
      .select(col("vec_id"), embD("embedding").as("emb"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))

  /** IVF coarse quantization: assign each vector to its nearest of 8 fixed
    * centroids (the vec_id<8 embeddings — deterministic and SQL-joinable;
    * production would train k-means offline). Centroids broadcast; the scan
    * is one pass with 8 codegen'd dot products per row; the argmax is a
    * per-vector window with a deterministic tiebreak. The centroid id is
    * the IVF partition key — at 100 TB the table is written partitioned/
    * bucketed by it, so probes touch one cell.
    */
  def sim39(s0: SparkSession, dir: String): DataFrame = {
    val s = withDot(s0)
    val e = normed(s, dir)
    val cents = e.filter(col("vec_id") < 8).select(
      col("vec_id").as("centroid_id"), col("emb").as("c_emb"), col("norm").as("c_norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos_full").desc, col("centroid_id").asc)
    e.crossJoin(broadcast(cents))
      .withColumn("cos_full",
        dot(col("emb"), col("c_emb")) / (col("norm") * col("c_norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("cos_full"), 4).as("cos"))
  }

  /** IVF probe (nprobe=1): each query (vec_id<5) searches ONLY its own
    * centroid cell — the inverted-list scan that replaces the full-table
    * brute force of sim36. Top-3 per query, deterministic tiebreak.
    */
  def sim40(s0: SparkSession, dir: String): DataFrame = {
    val s = withDot(s0)
    val e = normed(s, dir)
    val cents = e.filter(col("vec_id") < 8).select(
      col("vec_id").as("centroid_id"), col("emb").as("c_emb"), col("norm").as("c_norm"))
    val aw = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos_full").desc, col("centroid_id").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos_full",
        dot(col("emb"), col("c_emb")) / (col("norm") * col("c_norm")))
      .withColumn("rn", row_number().over(aw))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("emb"), col("norm"))
    val q = assigned.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"), col("centroid_id").as("q_cell"),
      col("emb").as("q_emb"), col("norm").as("q_norm"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cand_cos").desc, col("vec_id").asc)
    assigned.join(broadcast(q),
        col("centroid_id") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cand_cos",
        dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("rank", row_number().over(pw))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("centroid_id").as("cell"), round(col("cand_cos"), 4).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim36_cosine_topk" -> (sim36 _),
    "sim37_lsh_buckets" -> (sim37 _),
    "sim38_lsh_neardup_pairs" -> (sim38 _),
    "sim39_ivf_assign" -> (sim39 _),
    "sim40_ivf_probe" -> (sim40 _))

  private def planeDotSql(j: Int): String =
    s"""list_sum([emb[i] * (CASE WHEN substr(md5('$j-' || i), 1, 1) < '8'
       | THEN 1.0 ELSE -1.0 END) for i in range(1, 65)])""".stripMargin.replace("\n", " ")

  private val bucketSql = (0 until 8)
    .map(j => s"(CASE WHEN ${planeDotSql(j)} > 0 THEN ${1 << j} ELSE 0 END)")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "sim36_cosine_topk" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
        |w AS (SELECT vec_id, emb, sqrt(list_sum([v * v for v in emb])) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm FROM w WHERE vec_id < 10),
        |scored AS (SELECT q.query_id, w.vec_id,
        |  list_sum([w.emb[i] * q.q_emb[i] for i in range(1, 65)]) / (w.norm * q.q_norm) AS cos_full
        | FROM w, q WHERE w.vec_id <> q.query_id)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id,
        | round(cos_full, 4) AS cos
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos_full DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "sim37_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id, label,
         |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
         |b AS (SELECT vec_id, label, CAST($bucketSql AS INTEGER) AS bucket FROM e)
         |SELECT vec_id, label, bucket,
         | count(*) OVER (PARTITION BY bucket) AS bucket_size
         |FROM b""".stripMargin,
    "sim38_lsh_neardup_pairs" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
         |b AS (SELECT vec_id, emb, sqrt(list_sum([v * v for v in emb])) AS norm,
         |  CAST($bucketSql AS INTEGER) AS bucket FROM e)
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket AS bucket,
         | round(list_sum([x.emb[i] * y.emb[i] for i in range(1, 65)]) / (x.norm * y.norm), 4) AS cos
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE round(list_sum([x.emb[i] * y.emb[i] for i in range(1, 65)]) / (x.norm * y.norm), 4) >= 0.25""".stripMargin,
    "sim39_ivf_assign" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
        |w AS (SELECT vec_id, emb, sqrt(list_sum([v * v for v in emb])) AS norm FROM e),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb, norm AS c_norm FROM w WHERE vec_id < 8),
        |scored AS (SELECT w.vec_id, c.centroid_id,
        |  list_sum([w.emb[i] * c.c_emb[i] for i in range(1, 65)]) / (w.norm * c.c_norm) AS cos_full
        | FROM w, c),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY vec_id ORDER BY cos_full DESC, centroid_id ASC) AS rn FROM scored)
        |SELECT vec_id, centroid_id, round(cos_full, 4) AS cos FROM r WHERE rn = 1""".stripMargin,
    "sim40_ivf_probe" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
        |w AS (SELECT vec_id, emb, sqrt(list_sum([v * v for v in emb])) AS norm FROM e),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb, norm AS c_norm FROM w WHERE vec_id < 8),
        |scored AS (SELECT w.vec_id, c.centroid_id, w.emb, w.norm,
        |  list_sum([w.emb[i] * c.c_emb[i] for i in range(1, 65)]) / (w.norm * c.c_norm) AS cos_full
        | FROM w, c),
        |a AS (SELECT vec_id, centroid_id, emb, norm FROM (
        |  SELECT *, row_number() OVER
        |   (PARTITION BY vec_id ORDER BY cos_full DESC, centroid_id ASC) AS rn FROM scored)
        | WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, centroid_id AS q_cell, emb AS q_emb, norm AS q_norm
        | FROM a WHERE vec_id < 5),
        |cand AS (SELECT q.query_id, a.vec_id, a.centroid_id,
        |  list_sum([a.emb[i] * q.q_emb[i] for i in range(1, 65)]) / (a.norm * q.q_norm) AS cand_cos
        | FROM a JOIN q ON a.centroid_id = q.q_cell AND a.vec_id <> q.query_id)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id,
        | centroid_id AS cell, round(cand_cos, 4) AS cos
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cand_cos DESC, vec_id ASC) AS rank FROM cand)
        |WHERE rank <= 3""".stripMargin)
}
