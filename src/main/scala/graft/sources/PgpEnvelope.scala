package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11/S12 column-level landing contract. The SFTP/PGP transport itself is
  * out of engine scope (SURVEY non-goals; the reference decrypts in its
  * connector, src/sftp/connector.py:184-336, before files land) — but the
  * ENGINE must still model what a transport hands it: payload bytes that
  * may or may not be ciphertext. This operator classifies landed payloads
  * so an upstream misconfiguration (ciphertext landing undetected) becomes
  * a typed quarantine row instead of a garbage parse.
  *
  * Detection is pure public format knowledge (RFC 4880): ASCII-armored
  * messages begin with the `-----BEGIN PGP MESSAGE-----` armor line;
  * binary OpenPGP streams set the high bit of the first octet (packet-tag
  * framing), which no ASCII-leading EDI/text format does. Decryption is
  * STUBBED — no crypto libraries are installed here — so encrypted
  * payloads pass through with `decrypt_status = 'encrypted_unsupported'`
  * and a null plaintext; plaintext payloads are passed through unchanged.
  * All checks are native column expressions on the first bytes only (no
  * UDF, no full-payload scan).
  */
object PgpEnvelope {

  private val ArmorHeader = "-----BEGIN PGP MESSAGE-----"

  /** True iff the payload looks like OpenPGP material. `binary = true`
    * (binary-typed column) also checks RFC 4880 packet framing (high bit
    * of the first octet); a string-typed payload only gets the armor check
    * — character-level "first byte" inspection on multi-byte text is
    * meaningless.
    */
  def isPgp(payload: org.apache.spark.sql.Column,
      binary: Boolean): org.apache.spark.sql.Column = {
    val armored =
      substring(payload, 1, ArmorHeader.length).cast("string") === ArmorHeader
    if (!binary) armored
    else armored || (length(payload) > 0 &&
      conv(hex(substring(payload, 1, 1)), 16, 10).cast("int") >= 128)
  }

  /** Classify a landed frame: adds `is_pgp`, `decrypt_status`
    * ('plaintext' | 'encrypted_unsupported') and `plaintext` (the payload
    * for plaintext rows, typed like the payload column itself; null for
    * ciphertext — a real deployment plugs a decryptor in between detection
    * and parse). Works for both binary payloads and the engine's own
    * string-typed landing content.
    */
  def withEncryptionStatus(files: DataFrame, payloadCol: String): DataFrame = {
    val payloadType = files.schema(payloadCol).dataType
    val pgp = isPgp(col(payloadCol),
      binary = payloadType == org.apache.spark.sql.types.BinaryType)
    files
      .withColumn("is_pgp", pgp)
      .withColumn("decrypt_status",
        when(pgp, lit("encrypted_unsupported")).otherwise(lit("plaintext")))
      .withColumn("plaintext",
        when(!pgp, col(payloadCol)).otherwise(lit(null).cast(payloadType)))
  }

  /** The rows safe to hand to the parser (plaintext only). */
  def parseable(classified: DataFrame): DataFrame =
    classified.filter(col("decrypt_status") === "plaintext")

  /** The rows a transport misconfiguration landed as ciphertext — the
    * dead-letter frame an operator alerts on.
    */
  def quarantine(classified: DataFrame): DataFrame =
    classified.filter(col("is_pgp"))
}
