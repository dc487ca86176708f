package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents` /
  * `embeddings`: exact (hash groupBy), n-gram Jaccard, MinHash signatures +
  * LSH banding, SimHash, and embedding-cosine near-dup.
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on a 32-byte digest, never on the
  *    document body;
  *  - candidate generation is always *blocked* (shingle match + source, LSH
  *    band buckets, embedding label) so the pair space is bounded — a naive
  *    all-pairs join is quadratic and does not survive 100 TB;
  *  - all hashes are md5-based so the DuckDB oracle computes bit-identical
  *    values.
  */
object Dedup extends QuerySet {

  private def toks: Column = split(col("text"), " ")

  /** Distinct bigram shingles per document (the MinHash/Jaccard unit). */
  private def bigrams: Column =
    array_distinct(zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => concat(x, lit(" "), y)))

  private val bigramsSql =
    "list_distinct([sp[i] || ' ' || sp[i+1] for i in range(1, len(sp))])"

  /** Exact dedup: content-hash groupBy; canonical row = min doc_id.
    * At scale this shuffles only (digest, doc_id), not the text.
    */
  def dd30(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("doc_id")).as("canonical_id"))

  /** N-gram Jaccard near-dup: distinct-bigram inverted index self-join,
    * blocked by `source`, then |A∩B| / |A∪B| >= 0.5.
    */
  def dd31(s: SparkSession, dir: String): DataFrame = {
    val sh = Q.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), explode(bigrams).as("shingle"))
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(n.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(n.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", round(
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")), 6))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** MinHash signature per document: k=4 permutations simulated by seeded
    * md5; signature element i = min over shingles of md5(i || shingle).
    */
  def dd32(s: SparkSession, dir: String): DataFrame = {
    def mh(i: Int): Column =
      array_min(transform(bigrams, x => md5(concat(lit(i.toString), x))))
        .as(s"mh$i")
    Q.t(s, dir, "documents")
      .select(col("doc_id"), mh(1), mh(2), mh(3), mh(4))
  }

  /** MinHash LSH candidate pairs: 2 bands × 2 rows; docs sharing either
    * band bucket become a candidate pair (dedup'd).
    *
    * Shape matters at scale: signatures are computed ONCE, exploded into
    * (band, bucket) rows, and pairs expand locally inside each bucket group
    * after a single shuffle. A self-join on the signature frame would
    * recompute the whole minhash subtree per join side (4× here — Catalyst
    * has no common-subtree reuse across self-joins) and shuffle the
    * signatures twice; bucket sizes are bounded by construction, so the
    * within-bucket quadratic expansion is local and cheap.
    */
  def dd33(s: SparkSession, dir: String): DataFrame = {
    val sigs = dd32(s, dir)
      .withColumn("b1", md5(concat(col("mh1"), col("mh2"))))
      .withColumn("b2", md5(concat(col("mh3"), col("mh4"))))
    val bands = sigs.select(col("doc_id"),
      explode(array(concat(lit("1:"), col("b1")), concat(lit("2:"), col("b2"))))
        .as("bucket"))
    val pairs = bands.groupBy("bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
    pairs.select(col("p.doc_a"), col("p.doc_b")).distinct()
  }

  /** SimHash (16-bit): per-token md5-derived 16-bit hash; each bit votes
    * ±1 weighted by token frequency; simhash bit j = sign of the vote sum.
    */
  def dd34(s: SparkSession, dir: String): DataFrame = {
    val tok = Q.t(s, dir, "documents")
      .select(col("doc_id"), explode(toks).as("t"))
      .withColumn("th", conv(substring(md5(col("t")), 1, 4), 16, 10).cast("int"))
    val sums = (0 until 16).map(j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"s$j"))
    val simhash = (0 until 16)
      .map(j => when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), simhash.cast("int").as("simhash"))
  }

  /** Embedding-cosine near-dup: label-blocked pairs above a cosine
    * threshold. Dot/norm use the native codegen'd graft_dot expression —
    * the same left fold in double as the oracle's list_sum, bit-identical.
    */
  def dd35(s0: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s0)
    val s = s0
    val e = Q.t(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    import graft.functions.GraftFunctions.{dot => gdot}
    val withNorm = e.withColumn("norm", sqrt(gdot(col("emb"), col("emb"))))
    val cosine = gdot(col("x.emb"), col("y.emb")) / (col("x.norm") * col("y.norm"))
    withNorm.as("x")
      .join(withNorm.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", round(cosine, 4))
      .filter(col("cos") >= 0.3)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.label").as("label"), col("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd30_exact_dedup" -> (dd30 _),
    "dd31_ngram_jaccard" -> (dd31 _),
    "dd32_minhash_signatures" -> (dd32 _),
    "dd33_minhash_lsh_pairs" -> (dd33 _),
    "dd34_simhash" -> (dd34 _),
    "dd35_embedding_neardup" -> (dd35 _))

  private val simhashSumsSql = (0 until 16)
    .map(j => s"SUM(CASE WHEN (th >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
    .mkString(", ")
  private val simhashBitsSql = (0 until 16)
    .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)")
    .mkString(" + ")

  private val cosSql =
    """list_sum([x.emb[i] * y.emb[i] for i in range(1, 65)]) / (x.norm * y.norm)"""

  val oracles: Map[String, String] = Map(
    "dd30_exact_dedup" ->
      """SELECT md5(text) AS fp, count(*) AS cnt, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "dd31_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS sp FROM documents),
         |sh AS (SELECT doc_id, source, unnest($bigramsSql) AS shingle FROM d),
         |n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source
         |       AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, common,
         | round(CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common), 6) AS jaccard
         |FROM p JOIN n na ON p.doc_a = na.doc_id JOIN n nb ON p.doc_b = nb.doc_id
         |WHERE round(CAST(common AS DOUBLE) / (na.n_sh + nb.n_sh - common), 6) >= 0.5""".stripMargin,
    "dd32_minhash_signatures" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
         |g AS (SELECT doc_id, $bigramsSql AS bg FROM d)
         |SELECT doc_id,
         | list_min(list_transform(bg, x -> md5('1' || x))) AS mh1,
         | list_min(list_transform(bg, x -> md5('2' || x))) AS mh2,
         | list_min(list_transform(bg, x -> md5('3' || x))) AS mh3,
         | list_min(list_transform(bg, x -> md5('4' || x))) AS mh4
         |FROM g""".stripMargin,
    "dd33_minhash_lsh_pairs" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
         |g AS (SELECT doc_id, $bigramsSql AS bg FROM d),
         |sigs AS (SELECT doc_id,
         |  md5(list_min(list_transform(bg, x -> md5('1' || x)))
         |   || list_min(list_transform(bg, x -> md5('2' || x)))) AS b1,
         |  md5(list_min(list_transform(bg, x -> md5('3' || x)))
         |   || list_min(list_transform(bg, x -> md5('4' || x)))) AS b2
         | FROM g)
         |SELECT DISTINCT doc_a, doc_b FROM (
         | SELECT x.doc_id AS doc_a, y.doc_id AS doc_b FROM sigs x JOIN sigs y
         |  ON x.b1 = y.b1 AND x.doc_id < y.doc_id
         | UNION ALL
         | SELECT x.doc_id, y.doc_id FROM sigs x JOIN sigs y
         |  ON x.b2 = y.b2 AND x.doc_id < y.doc_id)""".stripMargin,
    "dd34_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 4) AS INTEGER) AS th FROM tok),
         |s AS (SELECT doc_id, $simhashSumsSql FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashBitsSql AS INTEGER) AS simhash FROM s""".stripMargin,
    "dd35_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, label,
         |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
         |w AS (SELECT vec_id, label, emb,
         |  sqrt(list_sum([v * v for v in emb])) AS norm FROM e)
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.label AS label,
         | round($cosSql, 4) AS cos
         |FROM w x JOIN w y ON x.label = y.label AND x.vec_id < y.vec_id
         |WHERE round($cosSql, 4) >= 0.3""".stripMargin)
}
