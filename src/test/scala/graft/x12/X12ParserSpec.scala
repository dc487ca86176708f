package graft.x12

import org.scalatest.funsuite.AnyFunSuite

/** Pure-parser unit + property tests (no Spark). Semantics asserted against
  * the reference implementation's behavior (silver_x12_parsing.py).
  */
class X12ParserSpec extends AnyFunSuite {

  private val sample837 =
    "ISA*00*          *00*          *ZZ*SENDER01       *ZZ*RECEIVER01     *20250827*1726*^*00501*143681370*0*T*:~" +
      "GS*HC*SENDER01*RECEIVER01*20250919*1719*492367169*X*005010~" +
      "ST*837*575649697~" +
      "BHT*0019*00*REF001*20250913*1703*CH~" +
      "NM1*85*2*NORTH CLINIC****XX*111~" +
      "NM1*IL*1*DOE*JOHN****MI*222~" +
      "NM1*QC*1*DOE*JANE~" +
      "CLM*CL001*150.25***11:B:1*Y*A*Y*I~" +
      "SV1*HC:99213*100.25*UN*1*11*1~" +
      "DTP*472*D8*20250913~" +
      "SV1*HC:99214*50.00*UN*2*11*1~" +
      "SE*10*575649697~" +
      "GE*1*492367169~" +
      "IEA*1*143681370~"

  test("segment lexing splits on ~ and *") {
    val segs = X12Parser.parseSegments(sample837)
    assert(segs.head.segment_id == "ISA")
    assert(segs.head.elements.length == 16)
    assert(segs.last.segment_id == "IEA")
    assert(segs.map(_.segment_id).count(_ == "SV1") == 2)
  }

  test("trailing empty elements are preserved like Python str.split") {
    val segs = X12Parser.parseSegments("CLM*ID*10.5***X~")
    assert(segs.head.elements == Seq("ID", "10.5", "", "", "X"))
  }

  test("envelope grouping extracts ISA/GS and one ST..SE group") {
    val env = X12Parser.groupTransactions(X12Parser.parseSegments(sample837))
    assert(env.isa.exists(_.interchange_control_number == "143681370"))
    assert(env.isa.exists(_.interchange_sender_id == "SENDER01       "))
    assert(env.gs.exists(_.group_control_number == "492367169"))
    assert(env.transactions.length == 1)
    val g = env.transactions.head
    assert(g.st.transaction_set_identifier_code == "837")
    assert(g.segments.head.segment_id == "ST")
    assert(g.segments.last.segment_id == "SE")
  }

  test("trailing unterminated transaction is dropped (reference :1426-1434)") {
    val content = sample837 + "ST*837*999~BHT*0019*00*REFX*20250101*1200*CH~"
    val env = X12Parser.groupTransactions(X12Parser.parseSegments(content))
    // the stray GE/IEA between SE and the new ST flush as a spurious group
    // under the stale ST header — faithful reference quirk
    assert(env.transactions.length == 2)
    assert(env.transactions(1).segments.map(_.segment_id) == Seq("GE", "IEA"))
    assert(!env.transactions.exists(_.st.transaction_set_control_number == "999"))
  }

  test("multi-group file: all transactions take the LAST ISA/GS values (reference :1453-1469)") {
    val twoGroups =
      "ISA*00*          *00*          *ZZ*S1             *ZZ*R1             *20250101*1200*^*00501*ICN1*0*T*:~" +
        "GS*HC*S1*R1*20250101*1200*GCN1*X*005010~" +
        "ST*270*T1~BHT*0022*13*REFA*20250101*1200~SE*3*T1~" +
        "GE*1*GCN1~" +
        "GS*HC*S1*R1*20250202*1300*GCN2*X*005010~" +
        "ST*270*T2~BHT*0022*13*REFB*20250202*1300~SE*3*T2~" +
        "GE*1*GCN2~IEA*2*ICN1~"
    val (isa, gs, txs) = X12Parser.parseFile(twoGroups)
    // the reference assembles records after the scan, so the LAST GS wins
    // for every transaction in the file — replicated faithfully
    assert(gs.exists(_.group_control_number == "GCN2"))
    assert(gs.exists(_.date == "20250202"))
    assert(isa.exists(_.interchange_control_number == "ICN1"))
    // the stray GE between groups flushes as a spurious group under the
    // stale ST header (carrying T1's header again) — reference quirk; the
    // real transactions are the SE-terminated groups
    assert(txs.map(_.st.transaction_set_control_number) == Seq("T1", "T1", "T2"))
  }

  test("837 parse: claim, parties, service lines with DTP attachment") {
    val env = X12Parser.groupTransactions(X12Parser.parseSegments(sample837))
    val c = X12Parser.parse837(env.transactions.head.segments)
    assert(c.header.exists(_.reference_identification.contains("REF001")))
    assert(c.provider.exists(_.last_name_or_org_name.contains("NORTH CLINIC")))
    assert(c.subscriber.exists(_.last_name_or_org_name.contains("DOE")))
    assert(c.claim.exists(_.monetary_amount == 150.25))
    assert(c.service_lines.length == 2)
    assert(c.service_lines.head.monetary_amount == 100.25)
    assert(c.service_lines.head.service_date.exists(_.date_time_period.contains("20250913")))
    assert(c.service_lines(1).service_date.isEmpty)
  }

  test("837 validation: complete claim scores 100, missing names cost 20 each") {
    val env = X12Parser.groupTransactions(X12Parser.parseSegments(sample837))
    val (payload, err) = X12Parser.parseTransaction(env.transactions.head.segments, "837")
    assert(err.isEmpty)
    val v = X12Validator.validate(payload, "837")
    assert(v.quality_score == 100 && v.is_valid)

    val noProvider = sample837.replace("NM1*85*2*NORTH CLINIC****XX*111~", "")
    val env2 = X12Parser.groupTransactions(X12Parser.parseSegments(noProvider))
    val (p2, _) = X12Parser.parseTransaction(env2.transactions.head.segments, "837")
    val v2 = X12Validator.validate(p2, "837")
    assert(v2.issues == Seq("Missing provider name"))
    assert(v2.quality_score == 80 && v2.is_valid)
  }

  test("malformed numeric is captured as parsing_error, empty payload scores 0") {
    val bad = sample837.replace("CLM*CL001*150.25", "CLM*CL001*NOTANUM")
    val env = X12Parser.groupTransactions(X12Parser.parseSegments(bad))
    val (payload, err) = X12Parser.parseTransaction(env.transactions.head.segments, "837")
    assert(err.isDefined)
    assert(payload.claim837.isEmpty)
    val v = X12Validator.validate(payload, "837")
    assert(!v.is_valid && v.quality_score == 0) // 5 issues * 20
  }

  test("empty numeric element defaults to 0.0 (reference float-or-0.0)") {
    val segs = X12Parser.parseSegments("CLM*ID**11~SV1*HC:1**UN~")
    val c = X12Parser.parse837(segs)
    assert(c.claim.exists(_.monetary_amount == 0.0))
    assert(c.service_lines.head.monetary_amount == 0.0)
  }

  test("835 parse: nested claims → services with amounts") {
    val content =
      "BPR*I*500.00*C*ACH~TRN*1*TRC1*CO1~N1*PR*BIG PAYER*XV*P1~N1*PE*CLINIC*XX*N1~" +
        "CLP*C1*1*300.00*250.00*50.00*12~SVC*HC:1*300.00*250.00*0300*1~" +
        "CLP*C2*1*200.00*150.00*25.00*12~"
    val p = X12Parser.parse835(X12Parser.parseSegments(content))
    assert(p.header.exists(_.monetary_amount == 500.0))
    assert(p.claims.length == 2)
    assert(p.claims.head.services.length == 1)
    assert(p.claims(1).services.isEmpty)
    assert(p.claims.head.claim_charge_amount == 300.0)
    assert(X12Validator.validate(
      ParsedPayload.empty.copy(payment835 = Some(p)), "835").quality_score == 100)
  }

  test("834 parse: members with names and coverages; maintenance buckets") {
    val content =
      "BGN*00*REF1*20250101*1200*ET**2*4~N1*P5*ACME*FI*S1~" +
        "INS*Y*18*021*EC*A~NM1*IL*1*SMITH*ANN****34*111~HD*021**HLT*GOLD*EMP~" +
        "INS*Y*18*024*EC*A~NM1*IL*1*JONES*BOB****34*222~HD*024**DEN*BASIC*EMP~"
    val e = X12Parser.parse834(X12Parser.parseSegments(content))
    assert(e.members.length == 2)
    assert(e.members.head.name.exists(_.last_name.contains("SMITH")))
    assert(e.members.head.coverages.head.insurance_line_code.contains("HLT"))
    assert(e.members.count(_.maintenance_type_code.contains("021")) == 1)
  }

  test("278 composite qualifier:id split (reference :734)") {
    val segs = X12Parser.parseSegments("UM*HS*I*2~SV1*HC:99213*100.00*UN*1~SV1*SOLO*50.00~SV1**25.00~")
    val p = X12Parser.parse278(segs)
    assert(p.services.length == 3)
    assert(p.services(0).product_service_id_qualifier.contains("HC"))
    assert(p.services(0).product_service_id.contains("99213"))
    assert(p.services(1).product_service_id_qualifier.contains("SOLO"))
    assert(p.services(1).product_service_id.isEmpty)
    assert(p.services(2).product_service_id_qualifier.contains(""))
    assert(p.services(2).product_service_id.contains(""))
  }

  test("279 action-code categorization feeds validation warnings") {
    val segs = X12Parser.parseSegments(
      "BHT*0007*11*REF*20250101*1200~NM1*PR*2*PAYER~NM1*X3*1*DOE*JANE~" +
        "HCR*A1*AUTH1~HCR*ZZ*AUTH2~HCR*DJ*AUTH3~")
    val p = X12Parser.parse279(segs)
    assert(p.review_results.map(_.action_code.get) == Seq("A1", "ZZ", "DJ"))
    val v = X12Validator.validate(ParsedPayload.empty.copy(preauth279 = Some(p)), "279")
    assert(v.warnings == Seq("Review 2: Unusual action code 'ZZ'"))
    assert(v.quality_score == 95)
  }

  test("generic fallback for unknown types") {
    val (payload, err) = X12Parser.parseTransaction(
      X12Parser.parseSegments("ST*850*1~BEG*00*NE*PO1~SE*3*1~"), "850")
    assert(err.isEmpty)
    assert(payload.generic.exists(_.segments_parsed == 3))
    assert(payload.generic.exists(_.segment_types == Seq("ST", "BEG", "SE")))
    assert(X12Validator.validate(payload, "850").quality_score == 100)
  }

  test("997 generator round-trips through our own parser") {
    val ack = Ack997.generate997("SENDER01", "RECEIVER01", "492367169",
      Seq("575649697", "575649698"), "A",
      java.time.LocalDateTime.of(2025, 9, 1, 12, 30, 45))
    val segs = X12Parser.parseSegments(ack)
    assert(segs.head.segment_id == "ISA")
    assert(segs.last.segment_id == "IEA")
    assert(segs.count(_.segment_id == "AK2") == 2)
    assert(segs.count(_.segment_id == "AK5") == 2)
    val env = X12Parser.groupTransactions(segs)
    assert(env.transactions.length == 1)
    assert(env.transactions.head.st.transaction_set_identifier_code == "997")
    // receiver becomes the interchange sender in the ack
    assert(env.isa.exists(_.interchange_sender_id.trim == "RECEIVER01"))
    val se = segs.find(_.segment_id == "SE").get
    // reference parity: generate_x12_acknowledgments.py:128 computes
    // `4 + len(ak_segments) + 1`, one higher than the true ST..SE count
    val actualCount = segs.count(s => !Set("ISA", "GS", "GE", "IEA").contains(s.segment_id))
    assert(se.elements.head.toInt == actualCount + 1)
  }

  test("property: lexer round-trip — any generated corpus file parses into balanced envelopes") {
    val types = Seq("837", "835", "834", "270", "271", "276", "277", "278", "279")
    for (seed <- 0L until 50L; ttype <- types) {
      val rnd = new scala.util.Random(seed)
      val (content, icn, gcn, tcns) =
        X12TestDataGen.generateFile(rnd, ttype, "SENDERX", "RECVY", defect = false)
      val env = X12Parser.groupTransactions(X12Parser.parseSegments(content))
      assert(env.isa.exists(_.interchange_control_number == icn))
      assert(env.gs.exists(_.group_control_number == gcn))
      assert(env.transactions.map(_.st.transaction_set_control_number) == tcns)
      env.transactions.foreach { g =>
        val (payload, err) = X12Parser.parseTransaction(g.segments, ttype)
        assert(err.isEmpty, s"type $ttype seed $seed: $err")
        assert(payload.productIterator.exists {
          case Some(_) => true
          case _ => false
        })
      }
    }
  }

  test("property: lexer round-trip re-emits the original wire content") {
    val types = Seq("837", "835", "834", "270", "271", "276", "277", "278", "279")
    for (seed <- 0L until 40L; ttype <- types) {
      val rnd = new scala.util.Random(seed)
      val (content, _, _, _) =
        X12TestDataGen.generateFile(rnd, ttype, "SENDERX", "RECVY")
      val reEmitted = X12Parser.parseSegments(content)
        .map(_.raw_segment).mkString("", "~", "~")
      assert(reEmitted == content, s"type $ttype seed $seed")
    }
  }

  test("property: parseFile never throws on arbitrary garbage input") {
    val rnd = new scala.util.Random(123)
    val charsets = Seq(
      "*~ISAGSSTSE0123456789", // envelope-ish soup
      "abcdefghij*~\n\r\t",    // separators + noise
      " ÿሴ*~")  // non-ASCII + control chars
    for (i <- 0 until 300) {
      val cs = charsets(i % charsets.length)
      val len = rnd.nextInt(500)
      val garbage = (0 until len).map(_ => cs(rnd.nextInt(cs.length))).mkString
      val (isa, gs, txs) = X12Parser.parseFile(garbage) // must not throw
      // whatever comes back is structurally sane
      txs.foreach { tx =>
        assert(tx.validation.quality_score >= 0 && tx.validation.quality_score <= 100)
      }
      assert(isa != null && gs != null)
    }
    // truncated real files parse without throwing too
    val (full, _, _, _) = X12TestDataGen.generateFile(
      new scala.util.Random(1), "837", "S1", "R1")
    for (cut <- 0 until full.length by 37) {
      X12Parser.parseFile(full.take(cut))
    }
  }

  test("property: defect-free generated transactions validate at full score") {
    for (seed <- 0L until 100L) {
      val rnd = new scala.util.Random(seed)
      Seq("837", "835", "834", "270", "276").foreach { t =>
        val (content, _, _, _) =
          X12TestDataGen.generateFile(rnd, t, "S1", "R1", defect = false)
        val (_, _, txs) = X12Parser.parseFile(content)
        assert(txs.nonEmpty)
        txs.foreach(tx => assert(tx.validation.quality_score == 100,
          s"type $t seed $seed: ${tx.validation.issues} ${tx.validation.warnings}"))
      }
    }
  }
}
