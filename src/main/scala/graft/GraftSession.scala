package graft

import org.apache.spark.sql.SparkSession

/** Front door for library users: one call configures a SparkSession
  * builder with the engine's scale stance, so "switch to this library"
  * is a session-factory change rather than a conf scavenger hunt.
  *
  * What it encodes (and why — the 100 TB design defaults):
  *  - graft function extensions (graft_dot / graft_minhash /
  *    graft_minhash_u / graft_nfc / graft_shingles) injected into every
  *    session;
  *  - AQE on with skew-join splitting and partition coalescing — runtime
  *    re-planning is the first defense against skewed partners/keys;
  *  - 128 MB file partitions (one task ≈ one parquet row-group span);
  *  - zstd parquet writes (the silver body compresses ~2× better than
  *    snappy on text-heavy payloads, SURVEY §storage);
  *  - UTC session timezone (cross-engine timestamp determinism).
  *
  * `shufflePartitions` is the one knob a deployment MUST size: ~2-3× the
  * cluster's total cores, and large enough that a shuffle partition of the
  * biggest stage fits in executor memory. The default follows Spark's 200;
  * the local test/bench mains pass their core count instead.
  */
object GraftSession {

  def configure(builder: SparkSession.Builder,
      shufflePartitions: Int = 200): SparkSession.Builder =
    builder
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")

  /** Build (or join) the session AND guarantee the graft functions are
    * available: `spark.sql.extensions` is a STATIC conf that only applies
    * when the SparkContext itself is created, so a session built on an
    * already-running context (notebooks, shared test JVMs) would silently
    * miss the injection — the imperative registration is idempotent and
    * covers that path.
    */
  def getOrCreate(builder: SparkSession.Builder = SparkSession.builder(),
      shufflePartitions: Int = 200): SparkSession = {
    val s = configure(builder, shufflePartitions).getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
}
