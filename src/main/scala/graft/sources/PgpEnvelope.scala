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
  * framing), which no ASCII-leading EDI/text format does. Detection-only
  * classification ([[withEncryptionStatus]]) marks ciphertext
  * `encrypted_unsupported`; [[withDecryption]] goes further and DECRYPTS
  * it in-engine via [[OpenPgp]] (pure-JDK RFC 4880 — the r7 "environment-
  * blocked" BouncyCastle gap is closed; GnuPG-interop is spec-verified
  * against real gpg 2.2 output) — decrypt failures land as typed
  * `decrypt_failed: <reason>` quarantine rows, never a garbage parse.
  * Detection checks are native column expressions on the first bytes
  * only; the decrypt step is a Scala UDF on a pure function — imperative
  * per-file byte/crypto work, the declared UDF criterion (SURVEY §2.11,
  * the 997-generator precedent).
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

  /** [[withEncryptionStatus]] plus IN-ENGINE decryption: PGP payloads are
    * decrypted with `privateKey` (an exported OpenPGP secret-key blob,
    * binary or armored — parsed ONCE on the driver, broadcast as plain
    * Serializable key material) and land with `decrypt_status =
    * 'decrypted'` and the literal-data text as `plaintext`; failures keep
    * a null plaintext and carry `decrypt_failed: <reason>`. Plaintext and
    * null payloads classify exactly as in [[withEncryptionStatus]]. The
    * payload column may be binary or string (armored).
    */
  def withDecryption(files: DataFrame, payloadCol: String,
      privateKey: Array[Byte]): DataFrame = {
    val keys = OpenPgp.parseSecretKeys(privateKey)
    require(keys.nonEmpty, "no usable secret key in the provided blob")
    val payloadType = files.schema(payloadCol).dataType
    val isBinary = payloadType == org.apache.spark.sql.types.BinaryType
    val decryptUdf = udf { (payload: Array[Byte]) =>
      try {
        val plain = OpenPgp.decrypt(payload, keys)
        ("decrypted", new String(plain, java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Exception =>
          (s"decrypt_failed: ${e.getMessage}", null.asInstanceOf[String])
      }
    }
    val pgp = coalesce(isPgp(col(payloadCol), binary = isBinary), lit(false))
    val payloadBytes =
      if (isBinary) col(payloadCol)
      else col(payloadCol).cast(org.apache.spark.sql.types.BinaryType)
    files
      .withColumn("is_pgp", pgp)
      .withColumn("__dec",
        when(col(payloadCol).isNotNull && pgp, decryptUdf(payloadBytes)))
      .withColumn("decrypt_status",
        when(col(payloadCol).isNull, lit("missing_payload"))
          .when(pgp, col("__dec._1"))
          .otherwise(lit("plaintext")))
      .withColumn("plaintext",
        when(col("decrypt_status") === "plaintext",
          col(payloadCol).cast("string"))
          .when(col("decrypt_status") === "decrypted", col("__dec._2")))
      .drop("__dec")
  }

  /** The rows safe to hand to the parser (plaintext or decrypted). */
  def parseable(classified: DataFrame): DataFrame =
    classified.filter(col("decrypt_status").isin("plaintext", "decrypted"))

  /** The rows a transport fault landed undecryptable or without a payload
    * — the dead-letter frame an operator alerts on.
    */
  def quarantine(classified: DataFrame): DataFrame =
    classified.filter(!col("decrypt_status").isin("plaintext", "decrypted"))
}
