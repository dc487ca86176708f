package graft.x12

import java.nio.file.{Files, Path, Paths}
import scala.util.Random

/** Deterministic X12 test-corpus generator (fresh implementation of the
  * reference's fixture tooling: scripts/generate_test_x12_data.py:276-303 and
  * testdata/generate_additional_testdata.py:255-281 produce the same wire
  * format — ISA/GS/ST..SE/GE/IEA envelopes, `*` elements, `~` terminators).
  *
  * Seeded `Random` makes corpora reproducible across runs (the reference
  * generator is unseeded; determinism is required by our test/verify loop).
  * A fraction of files carry injected defects — missing names, zero amounts,
  * malformed numerics, missing SE, non-X12 garbage — to exercise validation,
  * quality scoring, parsing_error capture, and bronze rejection.
  */
object X12TestDataGen {

  private val partners = Seq(
    ("ACMECLAIMS", "BIGPAYER"), ("NORTHCLINIC", "BIGPAYER"),
    ("ACMECLAIMS", "STATEHEALTH"), ("WESTLAB", "UNIONPAYER"),
    ("EASTHOSP", "BIGPAYER"))

  private val allTypes =
    Seq("837", "835", "834", "270", "271", "276", "277", "278", "279")

  private def pad15(s: String): String = s.padTo(15, ' ')

  private def ctl(rnd: Random): String = (100000000 + rnd.nextInt(900000000)).toString

  private def date(rnd: Random): String = f"2025${1 + rnd.nextInt(12)}%02d${1 + rnd.nextInt(28)}%02d"

  private def time(rnd: Random): String = f"${rnd.nextInt(24)}%02d${rnd.nextInt(60)}%02d"

  private def money(rnd: Random): String = f"${50 + rnd.nextInt(5000)}.${rnd.nextInt(100)}%02d"

  /** One complete interchange for the given transaction type. Returns
    * (content, icn, gcn, txControlNumbers).
    */
  def generateFile(rnd: Random, ttype: String, sender: String, receiver: String,
      defect: Boolean = false): (String, String, String, Seq[String]) = {
    val icn = ctl(rnd)
    val gcn = ctl(rnd)
    val d = date(rnd)
    val t = time(rnd)
    val isa = s"ISA*00*          *00*          *ZZ*${pad15(sender)}*ZZ*${pad15(receiver)}*$d*$t*^*00501*$icn*0*T*:~"
    val gs = s"GS*HC*$sender*$receiver*$d*$t*$gcn*X*005010~"
    val nTx = 1 + rnd.nextInt(3)
    val txs = (0 until nTx).map { _ =>
      val tcn = ctl(rnd)
      val body = bodySegments(rnd, ttype, d, t, defect)
      val seCount = body.length + 2 // ST + body + SE
      val st = s"ST*$ttype*$tcn"
      val se = s"SE*$seCount*$tcn"
      (tcn, (st +: body :+ se).mkString("", "~", "~"))
    }
    val ge = s"GE*$nTx*$gcn~"
    val iea = s"IEA*1*$icn~"
    val content = isa + gs + txs.map(_._2).mkString + ge + iea
    (content, icn, gcn, txs.map(_._1))
  }

  /** Transaction body segments (between ST and SE) per type. */
  private def bodySegments(rnd: Random, ttype: String, d: String, t: String,
      defect: Boolean): Seq[String] = {
    val ref = s"REF${ctl(rnd).take(6)}"
    // a defective transaction drops names / zeroes amounts to push the
    // quality score down; a heavily defective one emits a malformed numeric
    val provName = if (defect) "" else "NORTH CLINIC"
    val subName = if (defect) "" else "DOE"
    val amt = if (defect && rnd.nextBoolean()) "BADNUM" else money(rnd)
    ttype match {
      case "837" =>
        val n = 1 + rnd.nextInt(3)
        val lines = (0 until n).flatMap { i =>
          Seq(s"SV1*HC:9921$i*${money(rnd)}*UN*${1 + rnd.nextInt(4)}*11*1",
            s"DTP*472*D8*$d")
        }
        Seq(s"BHT*0019*00*$ref*$d*$t*CH",
          s"NM1*85*2*$provName****XX*${ctl(rnd)}",
          s"NM1*IL*1*$subName*JOHN****MI*${ctl(rnd)}",
          s"NM1*QC*1*DOE*JANE",
          s"CLM*CL${ctl(rnd).take(7)}*$amt***11:B:1*Y*A*Y*I") ++ lines
      case "835" =>
        val n = 1 + rnd.nextInt(3)
        val claims = (0 until n).flatMap { i =>
          Seq(s"CLP*CL${ctl(rnd).take(7)}*1*${money(rnd)}*${money(rnd)}*${money(rnd)}*12*${ctl(rnd)}*11",
            s"SVC*HC:9921$i*${money(rnd)}*${money(rnd)}*0300*1")
        }
        Seq(s"BPR*I*$amt*C*ACH*CCP*****${ctl(rnd)}******$d",
          s"TRN*1*$ref*${ctl(rnd)}",
          s"N1*PR*${if (defect) "" else "BIG PAYER INC"}*XV*${ctl(rnd)}",
          s"N1*PE*${if (defect) "" else "NORTH CLINIC"}*XX*${ctl(rnd)}") ++ claims
      case "834" =>
        val n = 1 + rnd.nextInt(4)
        val members = (0 until n).flatMap { i =>
          val mt = Seq("021", "024", "001")(rnd.nextInt(3))
          Seq(s"INS*Y*18*$mt*EC*A*E**FT",
            s"NM1*IL*1*${if (defect) "" else s"MEMBER$i"}*ANN****34*${ctl(rnd)}",
            s"HD*$mt**${Seq("HLT", "DEN", "VIS")(rnd.nextInt(3))}*GOLD PLAN*EMP")
        }
        Seq(s"BGN*00*$ref*$d*$t*ET**2*4",
          s"N1*P5*${if (defect) "" else "ACME CORP"}*FI*${ctl(rnd)}") ++ members
      case "270" =>
        Seq(s"BHT*0022*13*$ref*$d*$t",
          s"NM1*1P*2*$provName****XX*${ctl(rnd)}",
          s"NM1*IL*1*$subName*JOHN****MI*${ctl(rnd)}") ++
          (0 until 1 + rnd.nextInt(2)).map(_ => s"EQ*30**CHD")
      case "271" =>
        Seq(s"BHT*0022*11*$ref*$d*$t",
          s"NM1*PR*2*${if (defect) "" else "BIG PAYER INC"}****PI*${ctl(rnd)}",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}",
          s"NM1*IL*1*$subName*JOHN****MI*${ctl(rnd)}") ++
          (0 until 1 + rnd.nextInt(3)).map(_ =>
            s"EB*1*IND*30**GOLD PLAN*23*${money(rnd)}*${rnd.nextInt(100)}")
      case "276" =>
        Seq(s"BHT*0010*13*$ref*$d*$t",
          s"TRN*1*${if (defect) "" else s"TRC$ref"}*${ctl(rnd)}",
          s"NM1*PR*2*BIG PAYER INC****PI*${ctl(rnd)}",
          s"NM1*1P*2*$provName****XX*${ctl(rnd)}",
          s"NM1*IL*1*DOE*JOHN****MI*${ctl(rnd)}")
      case "277" =>
        Seq(s"BHT*0010*08*$ref*$d*$t",
          s"NM1*PR*2*${if (defect) "" else "BIG PAYER INC"}****PI*${ctl(rnd)}",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}") ++
          (0 until 1 + rnd.nextInt(3)).map(_ =>
            s"STC*A${1 + rnd.nextInt(4)}*$d*WQ*${money(rnd)}*${money(rnd)}*****F2*$d")
      case "278" =>
        val n = 1 + rnd.nextInt(2)
        val svcs = (0 until n).flatMap(i =>
          Seq(s"SV1*HC:9921$i*${if (defect) "0" else money(rnd)}*UN*${1 + rnd.nextInt(3)}*11**1",
            s"DTP*472*D8*$d"))
        Seq(s"BHT*0007*13*$ref*$d*$t",
          s"HL*1**20*1", s"HL*2*1*21*1",
          s"NM1*PR*2*BIG PAYER INC****PI*${ctl(rnd)}",
          s"HL*3*2*22*1",
          s"NM1*X3*1*${if (defect) "" else "DOE"}*${if (defect) "" else "JANE"}****MI*${ctl(rnd)}",
          s"HL*4*3*23*0",
          s"NM1*1P*2*$provName****XX*${ctl(rnd)}",
          s"UM*HS*I*2***Y*REV${ctl(rnd).take(6)}") ++ svcs
      case "279" =>
        val codes = Seq("A1", "A2", "A3", "A4", "A6", "CT", "DJ", "PA", "PN", "ZZ")
        val n = 1 + rnd.nextInt(3)
        val reviews = (0 until n).flatMap { _ =>
          val code = if (defect) "" else codes(rnd.nextInt(codes.length))
          Seq(s"HCR*$code*AUTH${ctl(rnd).take(6)}*OK") ++
            (if (rnd.nextBoolean()) Seq(s"PWK*OZ*EL*${1 + rnd.nextInt(3)}") else Nil)
        }
        Seq(s"BHT*0007*11*$ref*$d*$t",
          s"HL*1**20*1",
          s"NM1*PR*2*${if (defect) "" else "BIG PAYER INC"}****PI*${ctl(rnd)}",
          s"HL*2*1*22*1",
          s"NM1*X3*1*DOE*JANE****MI*${ctl(rnd)}",
          s"HL*3*2*23*0",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}") ++ reviews ++
          Seq(s"MSG*REVIEW COMPLETE", s"DTP*472*D8*$d")
      case other =>
        Seq(s"BHT*0000*00*$ref*$d*$t", s"REF*XX*$other")
    }
  }

  /** One correlated request/response file pair (J3, SURVEY.md §2.4): the
    * response carries the request's correlation key — 276→277 via the TRN
    * trace reference surfacing as the 277 BHT reference, 270→271 via a
    * shared BHT reference (schemas/x12_transaction_schemas.json TRN
    * declaration; silver trace fields silver_x12_parsing.py:573-578).
    */
  def generateCorrelatedPair(rnd: Random, reqType: String, sender: String,
      receiver: String, corrRef: String): (String, String) = {
    val respType = reqType match { case "276" => "277"; case _ => "271" }
    def file(ttype: String, body: Seq[String]): String = {
      val icn = ctl(rnd); val gcn = ctl(rnd); val tcn = ctl(rnd)
      val d = date(rnd); val t = time(rnd)
      val isa = s"ISA*00*          *00*          *ZZ*${pad15(sender)}*ZZ*${pad15(receiver)}*$d*$t*^*00501*$icn*0*T*:~"
      val gs = s"GS*HC*$sender*$receiver*$d*$t*$gcn*X*005010~"
      val st = s"ST*$ttype*$tcn"
      val se = s"SE*${body.length + 2}*$tcn"
      isa + gs + (st +: body :+ se).mkString("", "~", "~") + s"GE*1*$gcn~IEA*1*$icn~"
    }
    val d = date(rnd); val t = time(rnd)
    val (reqBody, respBody) = reqType match {
      case "276" => (
        Seq(s"BHT*0010*13*REQ$corrRef*$d*$t",
          s"TRN*1*$corrRef*${ctl(rnd)}",
          s"NM1*PR*2*BIG PAYER INC****PI*${ctl(rnd)}",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}",
          s"NM1*IL*1*DOE*JOHN****MI*${ctl(rnd)}"),
        Seq(s"BHT*0010*08*$corrRef*$d*$t",
          s"NM1*PR*2*BIG PAYER INC****PI*${ctl(rnd)}",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}",
          s"STC*A1*$d*WQ*${money(rnd)}*${money(rnd)}*****F2*$d"))
      case _ => (
        Seq(s"BHT*0022*13*$corrRef*$d*$t",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}",
          s"NM1*IL*1*DOE*JOHN****MI*${ctl(rnd)}",
          s"EQ*30**CHD"),
        Seq(s"BHT*0022*11*$corrRef*$d*$t",
          s"NM1*PR*2*BIG PAYER INC****PI*${ctl(rnd)}",
          s"NM1*1P*2*NORTH CLINIC****XX*${ctl(rnd)}",
          s"NM1*IL*1*DOE*JOHN****MI*${ctl(rnd)}",
          s"EB*1*IND*30**GOLD PLAN*23*${money(rnd)}*80"))
    }
    (file(reqType, reqBody), file(respType, respBody))
  }

  /** Files written beyond `n`: garbage + unterminated + 2 files per
    * correlated pair (3 pairs of 276/277, 3 of 270/271).
    */
  val extraFiles: Int = 2 + 12

  /** Write a corpus of n files (round-robin over types/partners, ~15%
    * defective, one garbage file, one unterminated-transaction file, plus
    * correlated request/response pairs). Idempotent per (dir, seed): skips
    * generation if the directory already holds the expected count.
    */
  /** Generator version: bump on any change to the generated content so
    * stale temp-dir corpora regenerate instead of silently serving old data.
    */
  private val generatorVersion = 2

  def writeCorpus(dir: String, n: Int, seed: Long = 42L): Seq[String] = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val expected = n + extraFiles
    // idempotence is keyed on a manifest (seed, n, generator version), not
    // just the file count — a same-sized corpus from a different seed or
    // generator version must regenerate, or golden pins would silently run
    // against the wrong data
    val manifestPath = root.resolve("_corpus_manifest.txt")
    val manifest = s"seed=$seed n=$n version=$generatorVersion"
    val existing = listX12(root)
    if (existing.length == expected && Files.exists(manifestPath) &&
        Files.readString(manifestPath) == manifest)
      return existing.map(_.toString)
    existing.foreach(Files.deleteIfExists)
    val rnd = new Random(seed)
    val pairFiles = (for (i <- 0 until 3; reqType <- Seq("276", "270")) yield {
      val (sender, receiver) = partners(rnd.nextInt(partners.length))
      val (req, resp) = generateCorrelatedPair(rnd, reqType, sender, receiver,
        s"CORR$reqType$i")
      val reqPath = root.resolve(s"test_x12_${reqType}_pair$i.x12")
      Files.writeString(reqPath, req)
      val respType = if (reqType == "276") "277" else "271"
      val respPath = root.resolve(s"test_x12_${respType}_pair$i.x12")
      Files.writeString(respPath, resp)
      Seq(reqPath, respPath)
    }).flatten
    val files = (0 until n).map { i =>
      val ttype = allTypes(i % allTypes.length)
      val (sender, receiver) = partners(rnd.nextInt(partners.length))
      val defect = rnd.nextDouble() < 0.15
      val (content, _, _, _) = generateFile(rnd, ttype, sender, receiver, defect)
      val p = root.resolve(f"test_x12_${ttype}_$i%03d.x12")
      Files.writeString(p, content)
      p
    }
    // garbage file: bronze must reject it, silver must yield zero rows
    val garbage = root.resolve("test_x12_garbage.x12")
    Files.writeString(garbage, "this is not an x12 file")
    // unterminated transaction: the trailing ST group has no SE → dropped
    val (okContent, _, _, _) =
      generateFile(rnd, "837", partners.head._1, partners.head._2)
    val unterminated = root.resolve("test_x12_unterminated.x12")
    Files.writeString(unterminated,
      okContent.stripSuffix("~").split('~').dropRight(3).mkString("", "~", "~") +
        s"ST*837*${ctl(rnd)}~BHT*0019*00*REFX*20250101*1200*CH~")
    Files.writeString(manifestPath, manifest)
    (files ++ pairFiles :+ garbage :+ unterminated).map(_.toString)
  }

  private def listX12(root: Path): Seq[Path] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".x12")).toSeq.sortBy(_.toString)
    } finally s.close()
  }
}
