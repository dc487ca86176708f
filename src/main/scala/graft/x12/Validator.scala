package graft.x12

import scala.collection.mutable.ListBuffer

/** Per-type semantic validation + quality scoring.
  *
  * Reference: notebooks/silver_x12_parsing.py:1029-1323. Scoring at
  * :1068-1073: `score = max(0, 100 - 20*issues - 5*warnings)`, below 50 ⇒
  * invalid. Presence checks replicate Python truthiness: a missing field,
  * empty string, and 0.0 amount are all "missing".
  */
object X12Validator {

  /** Python `not x` for an optional string: None or "" is falsy. */
  @inline private def falsy(o: Option[String]): Boolean = o.forall(_.isEmpty)

  def validate(payload: ParsedPayload, transactionType: String): ValidationResult = {
    val issues = ListBuffer.empty[String]
    val warnings = ListBuffer.empty[String]

    transactionType match {
      case "837" => // silver_x12_parsing.py:1082-1117
        val c = payload.claim837
        if (falsy(c.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing claim reference identification"
        if (falsy(c.flatMap(_.claim).flatMap(_.claim_submitter_identifier)))
          issues += "Missing claim submitter identifier"
        if (falsy(c.flatMap(_.provider).flatMap(_.last_name_or_org_name)))
          issues += "Missing provider name"
        if (falsy(c.flatMap(_.subscriber).flatMap(_.last_name_or_org_name)))
          issues += "Missing subscriber name"
        val lines = c.map(_.service_lines).getOrElse(Seq.empty)
        if (lines.isEmpty) issues += "No service lines found"
        lines.zipWithIndex.foreach { case (sl, i) =>
          if (falsy(sl.product_service_id))
            warnings += s"Service line ${i + 1}: Missing product/service ID"
          if (sl.monetary_amount == 0.0)
            warnings += s"Service line ${i + 1}: Missing monetary amount"
        }

      case "835" => // silver_x12_parsing.py:1119-1144
        val p = payload.payment835
        if (p.flatMap(_.header).map(_.monetary_amount).getOrElse(0.0) == 0.0)
          issues += "Missing payment amount"
        if (falsy(p.flatMap(_.payer).flatMap(_.name)))
          issues += "Missing payer name"
        if (falsy(p.flatMap(_.payee).flatMap(_.name)))
          issues += "Missing payee name"
        val claims = p.map(_.claims).getOrElse(Seq.empty)
        if (claims.isEmpty) issues += "No claims found in payment advice"
        claims.zipWithIndex.foreach { case (cl, i) =>
          if (falsy(cl.claim_submitter_identifier))
            warnings += s"Claim ${i + 1}: Missing claim identifier"
          if (falsy(cl.claim_status_code))
            warnings += s"Claim ${i + 1}: Missing claim status"
        }

      case "834" => // silver_x12_parsing.py:1146-1171
        val en = payload.enrollment834
        if (falsy(en.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing enrollment reference identification"
        if (falsy(en.flatMap(_.sponsor).flatMap(_.name)))
          issues += "Missing plan sponsor name"
        val members = en.map(_.members).getOrElse(Seq.empty)
        if (members.isEmpty) issues += "No members found in enrollment transaction"
        members.zipWithIndex.foreach { case (m, i) =>
          if (falsy(m.subscriber_indicator))
            warnings += s"Member ${i + 1}: Missing subscriber indicator"
          if (falsy(m.name.flatMap(_.last_name)))
            warnings += s"Member ${i + 1}: Missing last name"
        }

      case "270" => // silver_x12_parsing.py:1173-1193
        val q = payload.eligibility270
        if (falsy(q.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing inquiry reference identification"
        if (falsy(q.flatMap(_.provider).flatMap(_.last_name_or_org_name)))
          issues += "Missing provider name"
        if (falsy(q.flatMap(_.subscriber).flatMap(_.last_name_or_org_name)))
          issues += "Missing subscriber name"
        if (q.map(_.inquiries).getOrElse(Seq.empty).isEmpty)
          warnings += "No eligibility inquiries found"

      case "271" => // silver_x12_parsing.py:1195-1215
        val r = payload.eligibility271
        if (falsy(r.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing response reference identification"
        if (falsy(r.flatMap(_.source).flatMap(_.last_name_or_org_name)))
          issues += "Missing source/payer name"
        if (falsy(r.flatMap(_.subscriber).flatMap(_.last_name_or_org_name)))
          issues += "Missing subscriber name"
        if (r.map(_.benefits).getOrElse(Seq.empty).isEmpty)
          warnings += "No benefit information found"

      case "276" => // silver_x12_parsing.py:1217-1232
        val sr = payload.status276
        if (falsy(sr.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing status request reference identification"
        if (falsy(sr.flatMap(_.provider).flatMap(_.last_name_or_org_name)))
          issues += "Missing provider name"
        if (falsy(sr.flatMap(_.trace).flatMap(_.reference_identification)))
          issues += "Missing trace reference identification"

      case "277" => // silver_x12_parsing.py:1234-1249
        val sp = payload.status277
        if (falsy(sp.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing status response reference identification"
        if (falsy(sp.flatMap(_.source).flatMap(_.last_name_or_org_name)))
          issues += "Missing source/payer name"
        if (sp.map(_.claim_status).getOrElse(Seq.empty).isEmpty)
          warnings += "No claim status information found"

      case "278" => // silver_x12_parsing.py:1251-1287
        val pr = payload.preauth278
        if (falsy(pr.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing preauthorization request reference identification"
        if (falsy(pr.flatMap(_.header).flatMap(_.date)))
          issues += "Missing request date"
        val pat = pr.map(_.patient).getOrElse(Party.empty)
        if (falsy(pat.last_name_or_org_name) && falsy(pat.first_name))
          issues += "Missing patient name information"
        if (falsy(pr.map(_.service_provider).getOrElse(Party.empty).last_name_or_org_name))
          issues += "Missing service provider name"
        if (falsy(pr.flatMap(_.review_information).flatMap(_.request_category_code)))
          issues += "Missing request category code"
        val services = pr.map(_.services).getOrElse(Seq.empty)
        if (services.isEmpty)
          warnings += "No services found in preauthorization request"
        services.zipWithIndex.foreach { case (sv, i) =>
          if (falsy(sv.product_service_id))
            warnings += s"Service ${i + 1}: Missing product/service ID"
          if (sv.monetary_amount <= 0)
            warnings += s"Service ${i + 1}: Missing or invalid monetary amount"
        }

      case "279" => // silver_x12_parsing.py:1289-1323
        val rr = payload.preauth279
        if (falsy(rr.flatMap(_.header).flatMap(_.reference_identification)))
          issues += "Missing preauthorization response reference identification"
        if (falsy(rr.flatMap(_.header).flatMap(_.date)))
          issues += "Missing response date"
        if (falsy(rr.map(_.source).getOrElse(Party.empty).last_name_or_org_name))
          issues += "Missing source/payer name"
        val pat = rr.map(_.patient).getOrElse(Party.empty)
        if (falsy(pat.last_name_or_org_name) && falsy(pat.first_name))
          issues += "Missing patient name information"
        val reviews = rr.map(_.review_results).getOrElse(Seq.empty)
        if (reviews.isEmpty)
          issues += "No review results found in preauthorization response"
        val knownCodes = Set("A1", "A2", "A3", "A4", "A6", "CT", "DJ", "PA", "PN")
        reviews.zipWithIndex.foreach { case (rv, i) =>
          if (falsy(rv.action_code))
            issues += s"Review ${i + 1}: Missing action code"
          // Python renders an absent code as the literal 'None' in the message
          if (!rv.action_code.exists(knownCodes.contains))
            warnings += s"Review ${i + 1}: Unusual action code '${rv.action_code.getOrElse("None")}'"
        }

      case _ => // unknown types get no semantic checks (reference dispatch has no else)
    }

    val score = math.max(0, 100 - issues.length * 20 - warnings.length * 5)
    ValidationResult(is_valid = score >= 50, quality_score = score,
      issues = issues.toSeq, warnings = warnings.toSeq)
  }
}
