package graft.x12

import scala.collection.mutable.ListBuffer

/** Pure X12 parser: lexing, envelope grouping, and per-type transaction
  * parsing. No Spark dependency — unit/property-testable in isolation; the
  * silver layer calls [[X12Parser.parseFile]] from a `Dataset.flatMap`.
  *
  * Semantics match the reference parser (notebooks/silver_x12_parsing.py)
  * exactly, including its quirks:
  *  - element access past the end of a segment yields None
  *    (reference `elements[i] if len(elements) > i else None`);
  *  - numeric elements parse with empty→0.0 and malformed→error captured as
  *    `parsing_error` on the transaction (reference float() raising into the
  *    per-transaction try/except, silver_x12_parsing.py:196-199);
  *  - ST/SE grouping is an ordered scan where a trailing unterminated
  *    transaction is dropped and all transactions take the file's LAST
  *    ISA/GS values (reference grouping loop :1417-1436 reads the final
  *    isa_data/gs_data when assembling records :1453-1469).
  */
object X12Parser {

  /** Split file content into segments (silver_x12_parsing.py:65-99). */
  def parseSegments(
      content: String,
      elementSeparator: Char = '*',
      segmentTerminator: Char = '~'): Seq[Segment] =
    content.split(segmentTerminator).toSeq.flatMap { raw =>
      val trimmed = raw.trim
      if (trimmed.isEmpty) None
      else {
        // -1 keeps trailing empty elements, matching Python str.split
        val parts =
          trimmed.split(java.util.regex.Pattern.quote(elementSeparator.toString), -1)
        if (parts.isEmpty || parts(0).isEmpty) None
        else Some(Segment(parts(0), parts.drop(1).toSeq, trimmed))
      }
    }

  /** Element access helpers with reference semantics. */
  @inline private def el(e: Seq[String], i: Int): Option[String] =
    if (i < e.length) Some(e(i)) else None

  /** Reference `float(elements[i]) if len>i and elements[i] else 0.0` —
    * malformed numerics throw (captured as parsing_error upstream).
    */
  @inline private def num(e: Seq[String], i: Int): Double =
    if (i < e.length && e(i).nonEmpty) e(i).toDouble else 0.0

  /** ISA parser — requires >=16 elements (silver_x12_parsing.py:103-125). */
  def parseIsa(e: Seq[String]): IsaHeader = {
    require(e.length >= 16, "ISA segment must have at least 16 elements")
    IsaHeader(e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7), e(8), e(9),
      e(10), e(11), e(12), e(13), e(14), e(15))
  }

  /** GS parser — requires >=8 elements (silver_x12_parsing.py:127-141). */
  def parseGs(e: Seq[String]): GsHeader = {
    require(e.length >= 8, "GS segment must have at least 8 elements")
    GsHeader(e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7))
  }

  /** ST parser — requires >=2 elements (silver_x12_parsing.py:143-152). */
  def parseSt(e: Seq[String]): StHeader = {
    require(e.length >= 2, "ST segment must have at least 2 elements")
    StHeader(e(0), e(1), el(e, 2))
  }

  private def bht(e: Seq[String], with6th: Boolean): BhtHeader =
    BhtHeader(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4),
      if (with6th) el(e, 5) else None)

  private def nm1(e: Seq[String], withMiddle: Boolean = true): NameInfo =
    NameInfo(el(e, 0), el(e, 1), el(e, 2), el(e, 3),
      if (withMiddle) el(e, 4) else None, el(e, 7), el(e, 8))

  private def n1(e: Seq[String]): N1Name =
    N1Name(el(e, 0), el(e, 1), el(e, 2), el(e, 3))

  private def dtp(e: Seq[String]): DatePeriod =
    DatePeriod(el(e, 0), el(e, 1), el(e, 2))

  private def trn(e: Seq[String]): TraceInfo =
    TraceInfo(el(e, 0), el(e, 1), el(e, 2))

  /** 837 Health Care Claim (silver_x12_parsing.py:202-283). */
  def parse837(segments: Seq[Segment]): Claim837 = {
    var header: Option[BhtHeader] = None
    var provider, subscriber, patient: Option[NameInfo] = None
    var claim: Option[ClaimInfo] = None
    val lines = ListBuffer.empty[ServiceLine]
    var current: Option[ServiceLine] = None
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = true))
        case "CLM" =>
          claim = Some(ClaimInfo(el(e, 0), num(e, 1), el(e, 2), el(e, 4),
            el(e, 5), el(e, 6), el(e, 7), el(e, 8)))
        case "NM1" =>
          val nd = nm1(e)
          el(e, 0) match {
            case Some("85") => provider = Some(nd)
            case Some("IL") => subscriber = Some(nd)
            case Some("QC") => patient = Some(nd)
            case _ =>
          }
        case "SV1" =>
          current.foreach(lines += _)
          current = Some(ServiceLine(el(e, 0), num(e, 1), el(e, 2), num(e, 3),
            el(e, 4), el(e, 5), None))
        case "DTP" =>
          current = current.map(_.copy(service_date = Some(dtp(e))))
        case _ =>
      }
    }
    current.foreach(lines += _)
    Claim837(header, provider, subscriber, patient, claim, lines.toSeq)
  }

  /** 835 Payment/Advice (silver_x12_parsing.py:285-365). */
  def parse835(segments: Seq[Segment]): Payment835 = {
    var header: Option[BprHeader] = None
    var trace: Option[TraceInfo] = None
    var payer, payee: Option[N1Name] = None
    val claims = ListBuffer.empty[PaymentClaim]
    var curClaim: Option[PaymentClaim] = None
    var curSvc: Option[PaymentService] = None
    def flushSvc(): Unit = {
      curSvc.foreach(svc => curClaim = curClaim.map(c => c.copy(services = c.services :+ svc)))
      curSvc = None
    }
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BPR" =>
          header = Some(BprHeader(el(e, 0), num(e, 1), el(e, 2), el(e, 3),
            el(e, 4), el(e, 9), el(e, 15)))
        case "TRN" => trace = Some(trn(e))
        case "N1" =>
          val nd = n1(e)
          el(e, 0) match {
            case Some("PR") => payer = Some(nd)
            case Some("PE") => payee = Some(nd)
            case _ =>
          }
        case "CLP" =>
          flushSvc()
          curClaim.foreach(claims += _)
          curClaim = Some(PaymentClaim(el(e, 0), el(e, 1), num(e, 2), num(e, 3),
            num(e, 4), el(e, 5), el(e, 6), el(e, 7), Seq.empty))
        case "SVC" if curClaim.isDefined =>
          flushSvc()
          curSvc = Some(PaymentService(el(e, 0), num(e, 1), num(e, 2), el(e, 3), num(e, 4)))
        case _ =>
      }
    }
    flushSvc()
    curClaim.foreach(claims += _)
    Payment835(header, trace, payer, payee, claims.toSeq)
  }

  /** 834 Enrollment (silver_x12_parsing.py:367-439). */
  def parse834(segments: Seq[Segment]): Enrollment834 = {
    var header: Option[BgnHeader] = None
    var sponsor: Option[N1Name] = None
    val members = ListBuffer.empty[Member]
    var cur: Option[Member] = None
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BGN" =>
          header = Some(BgnHeader(el(e, 0), el(e, 1), el(e, 2), el(e, 3),
            el(e, 4), el(e, 6), el(e, 7)))
        case "N1" if el(e, 0).contains("P5") => sponsor = Some(n1(e))
        case "INS" =>
          cur.foreach(members += _)
          cur = Some(Member(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4),
            el(e, 5), el(e, 7), el(e, 8), None, Seq.empty))
        case "NM1" if cur.isDefined =>
          cur = cur.map(_.copy(name = Some(MemberName(el(e, 0), el(e, 1),
            el(e, 2), el(e, 3), el(e, 4), el(e, 7), el(e, 8)))))
        case "HD" if cur.isDefined =>
          val cov = Coverage(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4))
          cur = cur.map(m => m.copy(coverages = m.coverages :+ cov))
        case _ =>
      }
    }
    cur.foreach(members += _)
    Enrollment834(header, sponsor, members.toSeq)
  }

  /** 270 Eligibility Inquiry (silver_x12_parsing.py:441-491). */
  def parse270(segments: Seq[Segment]): Eligibility270 = {
    var header: Option[BhtHeader] = None
    var provider, subscriber, patient: Option[NameInfo] = None
    val inquiries = ListBuffer.empty[Inquiry]
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "NM1" =>
          val nd = nm1(e, withMiddle = false)
          el(e, 0) match {
            case Some("1P") => provider = Some(nd)
            case Some("IL") => subscriber = Some(nd)
            case Some("QC") => patient = Some(nd)
            case _ =>
          }
        case "EQ" =>
          inquiries += Inquiry(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4))
        case _ =>
      }
    }
    Eligibility270(header, provider, subscriber, patient, inquiries.toSeq)
  }

  /** 271 Eligibility Response (silver_x12_parsing.py:493-549). */
  def parse271(segments: Seq[Segment]): Eligibility271 = {
    var header: Option[BhtHeader] = None
    var source, receiver, subscriber, patient: Option[NameInfo] = None
    val benefits = ListBuffer.empty[Benefit]
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "NM1" =>
          val nd = nm1(e, withMiddle = false)
          el(e, 0) match {
            case Some("PR") => source = Some(nd)
            case Some("1P") => receiver = Some(nd)
            case Some("IL") => subscriber = Some(nd)
            case Some("QC") => patient = Some(nd)
            case _ =>
          }
        case "EB" =>
          benefits += Benefit(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4),
            el(e, 5), num(e, 6), num(e, 7))
        case _ =>
      }
    }
    Eligibility271(header, source, receiver, subscriber, patient, benefits.toSeq)
  }

  /** 276 Claim Status Request (silver_x12_parsing.py:551-597). */
  def parse276(segments: Seq[Segment]): Status276 = {
    var header: Option[BhtHeader] = None
    var provider, subscriber, patient: Option[NameInfo] = None
    var trace: Option[TraceInfo] = None
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "TRN" => trace = Some(trn(e))
        case "NM1" =>
          val nd = nm1(e, withMiddle = false)
          el(e, 0) match {
            case Some("1P") => provider = Some(nd)
            case Some("IL") => subscriber = Some(nd)
            case Some("QC") => patient = Some(nd)
            case _ =>
          }
        case _ =>
      }
    }
    Status276(header, provider, subscriber, patient, trace)
  }

  /** 277 Claim Status Response (silver_x12_parsing.py:599-656). */
  def parse277(segments: Seq[Segment]): Status277 = {
    var header: Option[BhtHeader] = None
    var source, receiver: Option[NameInfo] = None
    val statuses = ListBuffer.empty[ClaimStatus]
    var cur: Option[ClaimStatus] = None
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "NM1" =>
          val nd = nm1(e, withMiddle = false)
          el(e, 0) match {
            case Some("PR") => source = Some(nd)
            case Some("1P") => receiver = Some(nd)
            case _ =>
          }
        case "STC" =>
          cur.foreach(statuses += _)
          cur = Some(ClaimStatus(el(e, 0), el(e, 1), el(e, 2), num(e, 3),
            num(e, 4), el(e, 9), el(e, 10)))
        case _ =>
      }
    }
    cur.foreach(statuses += _)
    Status277(header, source, receiver, statuses.toSeq)
  }

  /** 278 Preauthorization Request (silver_x12_parsing.py:658-762),
    * including the composite `qualifier:id` SV1 split at :734.
    */
  def parse278(segments: Seq[Segment]): Preauth278 = {
    var header: Option[BhtHeader] = None
    var submitter, receiver, patient, serviceProvider, requestingProvider = Party.empty
    var review: Option[ReviewInfo] = None
    val services = ListBuffer.empty[PreauthService]
    val dates = ListBuffer.empty[DatePeriod]
    var curSvc: Option[PreauthService] = None
    var curDate: Option[DatePeriod] = None
    def merge(p: Party, e: Seq[String]): Party = p.copy(
      entity_identifier_code = el(e, 0), entity_type_qualifier = el(e, 1),
      last_name_or_org_name = el(e, 2), first_name = el(e, 3),
      middle_name = el(e, 4), identification_code_qualifier = el(e, 7),
      identification_code = el(e, 8))
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "HL" =>
          el(e, 2) match {
            case Some("20") => submitter = submitter.copy(hierarchical_id = el(e, 0))
            case Some("21") => receiver = receiver.copy(hierarchical_id = el(e, 0))
            case Some("22") => patient = patient.copy(hierarchical_id = el(e, 0))
            case Some("23") => serviceProvider = serviceProvider.copy(hierarchical_id = el(e, 0))
            case _ =>
          }
        case "NM1" =>
          el(e, 0) match {
            case Some("X3") => patient = merge(patient, e)
            case Some("1P") => serviceProvider = merge(serviceProvider, e)
            case Some("FA") => serviceProvider = merge(serviceProvider, e)
            case Some("PR") => receiver = merge(receiver, e)
            case _ =>
          }
        case "UM" =>
          review = Some(ReviewInfo(el(e, 0), el(e, 1), el(e, 2), el(e, 3), el(e, 4)))
        case "SV1" =>
          curSvc.foreach(services += _)
          // composite qualifier:id; empty/missing element → ["", ""]
          val parts = el(e, 0).filter(_.nonEmpty)
            .map(_.split(":", -1).toSeq).getOrElse(Seq("", ""))
          curSvc = Some(PreauthService(
            parts.headOption, parts.lift(1),
            num(e, 1), el(e, 2), num(e, 3), el(e, 4), el(e, 6)))
        case "DTP" =>
          curDate.foreach(dates += _)
          curDate = Some(dtp(e))
        case _ =>
      }
    }
    curSvc.foreach(services += _)
    curDate.foreach(dates += _)
    Preauth278(header, submitter, receiver, patient, serviceProvider,
      requestingProvider, review, services.toSeq, dates.toSeq)
  }

  /** 279 Preauthorization Response (silver_x12_parsing.py:764-870). */
  def parse279(segments: Seq[Segment]): Preauth279 = {
    var header: Option[BhtHeader] = None
    var source, receiver, patient, serviceProvider = Party.empty
    val reviews = ListBuffer.empty[ReviewResult]
    val messages = ListBuffer.empty[Message]
    val dates = ListBuffer.empty[DatePeriod]
    var curReview: Option[ReviewResult] = None
    var curMsg: Option[Message] = None
    var curDate: Option[DatePeriod] = None
    def merge(p: Party, e: Seq[String]): Party = p.copy(
      entity_identifier_code = el(e, 0), entity_type_qualifier = el(e, 1),
      last_name_or_org_name = el(e, 2), first_name = el(e, 3),
      middle_name = el(e, 4), identification_code_qualifier = el(e, 7),
      identification_code = el(e, 8))
    segments.foreach { s =>
      val e = s.elements
      s.segment_id match {
        case "BHT" => header = Some(bht(e, with6th = false))
        case "HL" =>
          el(e, 2) match {
            case Some("20") => source = source.copy(hierarchical_id = el(e, 0))
            case Some("21") => receiver = receiver.copy(hierarchical_id = el(e, 0))
            case Some("22") => patient = patient.copy(hierarchical_id = el(e, 0))
            case Some("23") => serviceProvider = serviceProvider.copy(hierarchical_id = el(e, 0))
            case _ =>
          }
        case "NM1" =>
          el(e, 0) match {
            case Some("X3") => patient = merge(patient, e)
            case Some("1P") => serviceProvider = merge(serviceProvider, e)
            case Some("PR") => source = merge(source, e)
            case _ =>
          }
        case "HCR" =>
          curReview.foreach(reviews += _)
          curReview = Some(ReviewResult(el(e, 0), el(e, 1), el(e, 2), el(e, 3), None))
        case "MSG" =>
          curMsg.foreach(messages += _)
          curMsg = Some(Message(el(e, 0)))
        case "PWK" if curReview.isDefined =>
          val copies = el(e, 2).filter(_.nonEmpty).map(_.toInt)
          curReview = curReview.map(_.copy(paperwork = Some(
            Paperwork(el(e, 0), el(e, 1), copies))))
        case "DTP" =>
          curDate.foreach(dates += _)
          curDate = Some(dtp(e))
        case _ =>
      }
    }
    curReview.foreach(reviews += _)
    curMsg.foreach(messages += _)
    curDate.foreach(dates += _)
    Preauth279(header, source, receiver, patient, serviceProvider,
      reviews.toSeq, messages.toSeq, dates.toSeq)
  }

  /** Generic fallback (silver_x12_parsing.py:872-878): segment count +
    * distinct segment ids (insertion-ordered for determinism) + raw segments.
    */
  def parseGeneric(segments: Seq[Segment]): GenericParsed =
    GenericParsed(segments.length, segments.map(_.segment_id).distinct, segments)

  /** Per-type dispatch (silver_x12_parsing.py:156-200). Returns the payload
    * or, when a parser throws (malformed numeric etc.), an empty payload plus
    * the error message — the reference's `parsing_error` capture.
    */
  def parseTransaction(
      segments: Seq[Segment],
      transactionType: String): (ParsedPayload, Option[String]) =
    try {
      val p = transactionType match {
        case "837" => ParsedPayload.empty.copy(claim837 = Some(parse837(segments)))
        case "835" => ParsedPayload.empty.copy(payment835 = Some(parse835(segments)))
        case "834" => ParsedPayload.empty.copy(enrollment834 = Some(parse834(segments)))
        case "270" => ParsedPayload.empty.copy(eligibility270 = Some(parse270(segments)))
        case "271" => ParsedPayload.empty.copy(eligibility271 = Some(parse271(segments)))
        case "276" => ParsedPayload.empty.copy(status276 = Some(parse276(segments)))
        case "277" => ParsedPayload.empty.copy(status277 = Some(parse277(segments)))
        case "278" => ParsedPayload.empty.copy(preauth278 = Some(parse278(segments)))
        case "279" => ParsedPayload.empty.copy(preauth279 = Some(parse279(segments)))
        case _     => ParsedPayload.empty.copy(generic = Some(parseGeneric(segments)))
      }
      (p, None)
    } catch {
      case e: Exception => (ParsedPayload.empty, Some(e.getMessage))
    }

  /** One grouped transaction set plus the envelope state it was read under. */
  final case class GroupedTransaction(st: StHeader, segments: Seq[Segment])

  /** Envelope scan (silver_x12_parsing.py:1417-1436): ISA/GS update file
    * state; ST flushes any open group under the PREVIOUS st header then
    * starts a new one; SE closes the open group. A trailing unterminated
    * group is dropped — faithfully replicating the reference, including the
    * quirk that stray segments between SE and the next ST get flushed as a
    * spurious group under the stale ST header.
    */
  final case class FileEnvelope(
      isa: Option[IsaHeader],
      gs: Option[GsHeader],
      transactions: Seq[GroupedTransaction])

  def groupTransactions(segments: Seq[Segment]): FileEnvelope = {
    var isa: Option[IsaHeader] = None
    var gs: Option[GsHeader] = None
    var st: Option[StHeader] = None
    val groups = ListBuffer.empty[GroupedTransaction]
    var current = ListBuffer.empty[Segment]
    def flush(): Unit = {
      // reference uses the last-parsed st_data even for pre-ST strays; an
      // absent ST yields empty header values (st_data={} → .get(...,""))
      val header = st.getOrElse(StHeader("", "", None))
      groups += GroupedTransaction(header, current.toSeq)
      current = ListBuffer.empty[Segment]
    }
    segments.foreach { s =>
      s.segment_id match {
        case "ISA" => isa = Some(parseIsa(s.elements))
        case "GS"  => gs = Some(parseGs(s.elements))
        case "ST" =>
          if (current.nonEmpty) flush()
          st = Some(parseSt(s.elements))
          current = ListBuffer(s)
        case "SE" =>
          current += s
          flush()
        case _ => current += s
      }
    }
    FileEnvelope(isa, gs, groups.toSeq)
  }

  /** A fully parsed, validated transaction from one file. */
  final case class ParsedTransaction(
      st: StHeader,
      transactionType: String,
      payload: ParsedPayload,
      parsingError: Option[String],
      validation: ValidationResult)

  /** Parse a whole file into transactions (the flatMap body for silver).
    * A file whose envelope fails to parse (short ISA/GS) contributes zero
    * transactions, like the reference's per-file try/except
    * (silver_x12_parsing.py:1390-1487).
    */
  def parseFile(content: String): (Option[IsaHeader], Option[GsHeader], Seq[ParsedTransaction]) =
    try {
      val env = groupTransactions(parseSegments(content))
      val txs = env.transactions.map { g =>
        val ttype = g.st.transaction_set_identifier_code
        val (payload, err) = parseTransaction(g.segments, ttype)
        val validation = X12Validator.validate(payload, ttype)
        ParsedTransaction(g.st, ttype, payload, err, validation)
      }
      (env.isa, env.gs, txs)
    } catch {
      case _: Exception => (None, None, Seq.empty)
    }
}
