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

  /** OpenPGP message-opening packet tags (RFC 4880 §4.3): PKESC(1),
    * signature(2), SKESC(3), compressed(8), symmetrically-encrypted(9),
    * SEIPD(18). A binary payload only classifies as PGP if its first octet
    * is valid packet framing AND decodes to one of these tags — a bare
    * high-bit test would quarantine any BOM- or multibyte-UTF-8-leading
    * plaintext (0xEF has the high bit set too).
    */
  private val openingTags = Seq(1, 2, 3, 8, 9, 18)

  /** True iff the payload looks like OpenPGP material. `binary = true`
    * (binary-typed column) also checks RFC 4880 packet framing; a
    * string-typed payload only gets the armor check — byte-level framing
    * inspection on character data is meaningless.
    */
  def isPgp(payload: org.apache.spark.sql.Column,
      binary: Boolean): org.apache.spark.sql.Column = {
    val armored =
      substring(payload, 1, ArmorHeader.length).cast("string") === ArmorHeader
    if (!binary) armored
    else {
      val b = conv(hex(substring(payload, 1, 1)), 16, 10).cast("int")
      // new format: 11xxxxxx, tag = b & 0x3f; old format: 10xxxxxx,
      // tag = (b >> 2) & 0x0f — bit ops, NOT Column `/` (double division:
      // any old-format octet with non-zero length-type bits would yield a
      // fractional tag that matches nothing and sail past quarantine)
      val newTag = b - 192
      val oldTag = shiftright(b, 2).bitwiseAND(lit(15))
      val framed =
        (b >= 192 && newTag.isin(openingTags.map(x => x: Any): _*)) ||
          (b >= 128 && b < 192 && oldTag.isin(openingTags.map(x => x: Any): _*))
      armored || (length(payload) > 0 && framed)
    }
  }

  /** Classify a landed frame: adds `is_pgp`, `decrypt_status`
    * ('plaintext' | 'encrypted_unsupported' | 'missing_payload') and
    * `plaintext` (the payload for plaintext rows, typed like the payload
    * column itself; null otherwise — a real deployment plugs a decryptor
    * in between detection and parse). Works for both binary payloads and
    * the engine's own string-typed landing content. A NULL payload is a
    * transport fault, surfaced as its own status — never silently labeled
    * plaintext.
    */
  def withEncryptionStatus(files: DataFrame, payloadCol: String): DataFrame = {
    val payloadType = files.schema(payloadCol).dataType
    val pgp = coalesce(isPgp(col(payloadCol),
      binary = payloadType == org.apache.spark.sql.types.BinaryType), lit(false))
    files
      .withColumn("is_pgp", pgp)
      .withColumn("decrypt_status",
        when(col(payloadCol).isNull, lit("missing_payload"))
          .when(pgp, lit("encrypted_unsupported"))
          .otherwise(lit("plaintext")))
      .withColumn("plaintext",
        when(col("decrypt_status") === "plaintext", col(payloadCol))
          .otherwise(lit(null).cast(payloadType)))
  }

  /** The rows safe to hand to the parser (plaintext only). */
  def parseable(classified: DataFrame): DataFrame =
    classified.filter(col("decrypt_status") === "plaintext")

  /** The rows a transport fault landed as ciphertext or without a payload
    * — the dead-letter frame an operator alerts on.
    */
  def quarantine(classified: DataFrame): DataFrame =
    classified.filter(col("decrypt_status") =!= "plaintext")
}
