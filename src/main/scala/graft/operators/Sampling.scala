package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random sampling (`df.sample`) is partition-order-dependent and not
  * reproducible across engines, retries or re-runs — poison for an
  * exactly-once curation pipeline and impossible to oracle-check. These
  * operators decide membership from a HASH of the row's identity instead:
  * keep a row iff the first 16 bits of md5(stratum|id) fall under the
  * stratum's threshold. Properties that matter at 100 TB:
  *  - stateless and embarrassingly parallel (no RNG state, no shuffle);
  *  - stable: the same row is kept in every re-run, on any engine;
  *  - mergeable: a sample of a union = union of the samples.
  */
object Sampling {

  /** 16-bit bucket of md5(stratum|id) — uniform over [0, 65536). */
  private def bucket(stratum: Column, id: Column): Column =
    conv(substring(md5(concat(stratum, lit("|"), id.cast("string"))), 1, 4),
      16, 10).cast("int")

  /** Per-stratum deterministic sample. `rates` maps stratum value → keep
    * rate in [0,1]; unlisted strata use `defaultRate`. Thresholds are
    * floor(rate * 65536), so rate=1.0 keeps everything and rate=0 nothing.
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates / $defaultRate")
    def threshold(rate: Double): Column = lit((rate * 65536).toInt)
    val thr = rates.foldLeft(threshold(defaultRate)) { case (acc, (value, rate)) =>
      when(col(strataCol) === value, threshold(rate)).otherwise(acc)
    }
    df.filter(bucket(col(strataCol), col(idCol)) < thr)
  }

  /** Flat deterministic sample at a single rate (stratum = the constant). */
  def deterministic(df: DataFrame, idCol: String, rate: Double): DataFrame =
    stratified(df.withColumn("__s", lit("all")), "__s", idCol,
      Map.empty, rate).drop("__s")
}
