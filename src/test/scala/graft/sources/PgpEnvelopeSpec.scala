package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PgpEnvelopeSpec extends AnyFunSuite with SparkTestBase {

  private def frame = {
    import spark.implicits._
    Seq(
      ("plain_x12", "ISA*00*          *00*~GS*HC~ST*837~".getBytes("UTF-8")),
      ("armored", "-----BEGIN PGP MESSAGE-----\n\nhQEMA...\n-----END PGP MESSAGE-----\n"
        .getBytes("UTF-8")),
      // binary OpenPGP packet: first octet has the high bit set (0xC1 =
      // new-format packet tag) — RFC 4880 framing
      ("binary_pgp", Array(0xc1, 0x5e, 0x03, 0x01).map(_.toByte)),
      ("empty", Array.empty[Byte]))
      .toDF("file_name", "payload")
  }

  test("detects armored and binary OpenPGP payloads, passes plaintext through") {
    val c = PgpEnvelope.withEncryptionStatus(frame, "payload")
    val byName = c.collect().map(r => r.getString(0) ->
      (r.getAs[Boolean]("is_pgp"), r.getAs[String]("decrypt_status"),
        r.isNullAt(r.fieldIndex("plaintext")))).toMap
    assert(byName("plain_x12") == ((false, "plaintext", false)))
    assert(byName("armored") == ((true, "encrypted_unsupported", true)))
    assert(byName("binary_pgp") == ((true, "encrypted_unsupported", true)))
    assert(byName("empty") == ((false, "plaintext", false)))
    // plaintext passthrough is byte-identical
    val pt = c.filter(col("file_name") === "plain_x12")
      .select("plaintext").head.getAs[Array[Byte]](0)
    assert(new String(pt, "UTF-8").startsWith("ISA*00"))
  }

  test("BOM-led plaintext is not quarantined; null payloads get their own status") {
    import spark.implicits._
    val bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ "ISA*00*".getBytes("UTF-8")
    val rows = Seq(
      ("bom_text", Some(bom)),
      ("missing", Option.empty[Array[Byte]]),
      // old-format symmetrically-encrypted packet: 10 1001 xx = 0xA4
      ("old_fmt_pgp", Some(Array(0xa4, 0x01, 0x00).map(_.toByte))),
      // old-format packets with NON-ZERO length-type bits — the octets the
      // double-division bug classified as plaintext: 0x85 = 10 0001 01
      // (PKESC, two-octet length), 0xA5 = 10 1001 01 (sym-enc, two-octet)
      ("old_fmt_pkesc_2len", Some(Array(0x85, 0x01, 0x00, 0x00).map(_.toByte))),
      ("old_fmt_symenc_2len", Some(Array(0xa5, 0x01, 0x00, 0x00).map(_.toByte))),
      // old-format tag NOT in the opening set (tag 13 = user ID, 0xB4):
      // framing-valid but not a message opener — stays plaintext-classified
      ("old_fmt_userid", Some(Array(0xb4, 0x01, 0x41).map(_.toByte))))
      .toDF("file_name", "payload")
    val c = PgpEnvelope.withEncryptionStatus(rows, "payload")
    val m = c.collect().map(r => r.getString(0) ->
      (r.getAs[Boolean]("is_pgp"), r.getAs[String]("decrypt_status"))).toMap
    // 0xEF has the high bit set but is NOT valid OpenPGP opening framing
    assert(m("bom_text") == ((false, "plaintext")))
    assert(m("missing") == ((false, "missing_payload")))
    assert(m("old_fmt_pgp") == ((true, "encrypted_unsupported")))
    assert(m("old_fmt_pkesc_2len") == ((true, "encrypted_unsupported")))
    assert(m("old_fmt_symenc_2len") == ((true, "encrypted_unsupported")))
    assert(m("old_fmt_userid") == ((false, "plaintext")))
    // missing payloads are quarantined, never parseable
    assert(PgpEnvelope.parseable(c).count() == 2)
    assert(PgpEnvelope.quarantine(c).count() == 4)
  }

  test("string-typed payloads (the engine's own landing content) classify too") {
    import spark.implicits._
    val strings = Seq(
      ("plain", "ISA*00*          *00*~GS*HC~"),
      ("armored", "-----BEGIN PGP MESSAGE-----\n\nhQEMA...")).toDF("file_name", "payload")
    val c = PgpEnvelope.withEncryptionStatus(strings, "payload")
    val m = c.collect().map(r => r.getString(0) ->
      (r.getAs[Boolean]("is_pgp"), r.isNullAt(r.fieldIndex("plaintext")))).toMap
    assert(m("plain") == ((false, false)))
    assert(m("armored") == ((true, true)))
    // plaintext column keeps the payload's own type
    assert(c.schema("plaintext").dataType.typeName == "string")
  }

  test("parseable/quarantine partition the landed frame") {
    val c = PgpEnvelope.withEncryptionStatus(frame, "payload")
    assert(PgpEnvelope.parseable(c).count() == 2)
    assert(PgpEnvelope.quarantine(c).count() == 2)
    assert(PgpEnvelope.parseable(c).count() + PgpEnvelope.quarantine(c).count()
      == c.count())
  }
}
