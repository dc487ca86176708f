package graft.x12

/** Typed data model for X12 EDI transactions.
  *
  * Mirrors the dict shapes built by the reference silver parser
  * (reference: notebooks/silver_x12_parsing.py:88-93 segments, :103-152
  * envelope headers, :202-878 per-type payloads). Field names are
  * intentionally snake_case so `to_json(struct(...))` emits payload JSON
  * with exactly the reference's keys (silver stores payloads as JSON
  * strings, silver_x12_parsing.py:1344-1345).
  *
  * Spark mapping: every case class below has a natural `Encoder`, so the
  * silver layer is a `Dataset[SilverRecord]` with nested
  * `StructType`/`ArrayType` columns — typed for gold-mart expressions,
  * serialized to JSON only at the parity boundary.
  */

/** One X12 segment (silver_x12_parsing.py:88-93). */
final case class Segment(
    segment_id: String,
    elements: Seq[String],
    raw_segment: String)

/** ISA Interchange Control Header, 16 elements (silver_x12_parsing.py:103-125). */
final case class IsaHeader(
    authorization_info_qualifier: String,
    authorization_information: String,
    security_info_qualifier: String,
    security_information: String,
    sender_id_qualifier: String,
    interchange_sender_id: String,
    receiver_id_qualifier: String,
    interchange_receiver_id: String,
    interchange_date: String,
    interchange_time: String,
    repetition_separator: String,
    interchange_control_version: String,
    interchange_control_number: String,
    acknowledgment_requested: String,
    usage_indicator: String,
    component_element_separator: String)

/** GS Functional Group Header, 8 elements (silver_x12_parsing.py:127-141). */
final case class GsHeader(
    functional_identifier_code: String,
    application_senders_code: String,
    application_receivers_code: String,
    date: String,
    time: String,
    group_control_number: String,
    responsible_agency_code: String,
    version_release_industry_id: String)

/** ST Transaction Set Header (silver_x12_parsing.py:143-152). */
final case class StHeader(
    transaction_set_identifier_code: String,
    transaction_set_control_number: String,
    implementation_convention_reference: Option[String])

/** BHT header shared by 837/270/271/276/277/278/279
  * (silver_x12_parsing.py:219-226 etc.; the 6th field only exists for 837).
  */
final case class BhtHeader(
    hierarchical_structure_code: Option[String],
    transaction_set_purpose_code: Option[String],
    reference_identification: Option[String],
    date: Option[String],
    time: Option[String],
    transaction_type_code: Option[String])

/** NM1 name block (silver_x12_parsing.py:242-250). */
final case class NameInfo(
    entity_identifier_code: Option[String],
    entity_type_qualifier: Option[String],
    last_name_or_org_name: Option[String],
    first_name: Option[String],
    middle_name: Option[String],
    identification_code_qualifier: Option[String],
    identification_code: Option[String])

/** N1 name block used by 835/834 (silver_x12_parsing.py:317-323). */
final case class N1Name(
    entity_identifier_code: Option[String],
    name: Option[String],
    identification_code_qualifier: Option[String],
    identification_code: Option[String])

/** DTP date-or-period block (silver_x12_parsing.py:273-277). */
final case class DatePeriod(
    date_time_qualifier: Option[String],
    date_time_format_qualifier: Option[String],
    date_time_period: Option[String])

// ---------------------------------------------------------------- 837

/** CLM claim info (silver_x12_parsing.py:229-239). */
final case class ClaimInfo(
    claim_submitter_identifier: Option[String],
    monetary_amount: Double,
    claim_filing_indicator_code: Option[String],
    health_care_service_location: Option[String],
    provider_signature_indicator: Option[String],
    medicare_assignment_code: Option[String],
    assignment_acceptance: Option[String],
    release_of_information_code: Option[String])

/** SV1 professional service line (silver_x12_parsing.py:258-270). */
final case class ServiceLine(
    product_service_id: Option[String],
    monetary_amount: Double,
    unit_basis_measurement_code: Option[String],
    service_unit_count: Double,
    place_of_service_code: Option[String],
    service_type_code: Option[String],
    service_date: Option[DatePeriod])

/** 837 Health Care Claim payload (silver_x12_parsing.py:202-283). */
final case class Claim837(
    header: Option[BhtHeader],
    provider: Option[NameInfo],
    subscriber: Option[NameInfo],
    patient: Option[NameInfo],
    claim: Option[ClaimInfo],
    service_lines: Seq[ServiceLine])

// ---------------------------------------------------------------- 835

/** BPR payment header (silver_x12_parsing.py:300-309). */
final case class BprHeader(
    transaction_handling_code: Option[String],
    monetary_amount: Double,
    credit_debit_flag_code: Option[String],
    payment_method_code: Option[String],
    payment_format_code: Option[String],
    originating_company_identifier: Option[String],
    payment_date: Option[String])

/** TRN trace (silver_x12_parsing.py:311-315; also 276 at :572-577). */
final case class TraceInfo(
    trace_type_code: Option[String],
    reference_identification: Option[String],
    originating_company_identifier: Option[String])

/** SVC service payment info (silver_x12_parsing.py:346-356). */
final case class PaymentService(
    product_service_id: Option[String],
    charge_amount: Double,
    payment_amount: Double,
    revenue_code: Option[String],
    quantity: Double)

/** CLP claim-level payment (silver_x12_parsing.py:330-344). */
final case class PaymentClaim(
    claim_submitter_identifier: Option[String],
    claim_status_code: Option[String],
    claim_charge_amount: Double,
    claim_payment_amount: Double,
    patient_responsibility_amount: Double,
    claim_filing_indicator_code: Option[String],
    payer_claim_control_number: Option[String],
    facility_code_value: Option[String],
    services: Seq[PaymentService])

/** 835 Payment/Advice payload (silver_x12_parsing.py:285-365). */
final case class Payment835(
    header: Option[BprHeader],
    trace: Option[TraceInfo],
    payer: Option[N1Name],
    payee: Option[N1Name],
    claims: Seq[PaymentClaim])

// ---------------------------------------------------------------- 834

/** BGN header (silver_x12_parsing.py:381-389). */
final case class BgnHeader(
    transaction_set_purpose_code: Option[String],
    reference_identification: Option[String],
    date: Option[String],
    time: Option[String],
    time_zone_code: Option[String],
    transaction_type_code: Option[String],
    action_code: Option[String])

/** 834 member NM1 (silver_x12_parsing.py:415-423; keys differ from NameInfo). */
final case class MemberName(
    entity_identifier_code: Option[String],
    entity_type_qualifier: Option[String],
    last_name: Option[String],
    first_name: Option[String],
    middle_name: Option[String],
    identification_code_qualifier: Option[String],
    identification_code: Option[String])

/** HD health coverage (silver_x12_parsing.py:424-432). */
final case class Coverage(
    maintenance_type_code: Option[String],
    maintenance_reason_code: Option[String],
    insurance_line_code: Option[String],
    plan_coverage_description: Option[String],
    coverage_level_code: Option[String])

/** INS insured member (silver_x12_parsing.py:400-413). */
final case class Member(
    subscriber_indicator: Option[String],
    individual_relationship_code: Option[String],
    maintenance_type_code: Option[String],
    maintenance_reason_code: Option[String],
    benefit_status_code: Option[String],
    medicare_plan_code: Option[String],
    employment_status_code: Option[String],
    student_status_code: Option[String],
    name: Option[MemberName],
    coverages: Seq[Coverage])

/** 834 Enrollment payload (silver_x12_parsing.py:367-439). */
final case class Enrollment834(
    header: Option[BgnHeader],
    sponsor: Option[N1Name],
    members: Seq[Member])

// ---------------------------------------------------------------- 270/271

/** EQ eligibility inquiry (silver_x12_parsing.py:482-489). */
final case class Inquiry(
    service_type_code: Option[String],
    product_service_id_qualifier: Option[String],
    product_service_id: Option[String],
    coverage_level_code: Option[String],
    insurance_type_code: Option[String])

/** 270 Eligibility Inquiry payload (silver_x12_parsing.py:441-491). */
final case class Eligibility270(
    header: Option[BhtHeader],
    provider: Option[NameInfo],
    subscriber: Option[NameInfo],
    patient: Option[NameInfo],
    inquiries: Seq[Inquiry])

/** EB benefit info (silver_x12_parsing.py:536-546). */
final case class Benefit(
    eligibility_benefit_info_code: Option[String],
    coverage_level_code: Option[String],
    service_type_code: Option[String],
    insurance_type_code: Option[String],
    plan_coverage_description: Option[String],
    time_period_qualifier: Option[String],
    monetary_amount: Double,
    percentage: Double)

/** 271 Eligibility Response payload (silver_x12_parsing.py:493-549). */
final case class Eligibility271(
    header: Option[BhtHeader],
    source: Option[NameInfo],
    receiver: Option[NameInfo],
    subscriber: Option[NameInfo],
    patient: Option[NameInfo],
    benefits: Seq[Benefit])

// ---------------------------------------------------------------- 276/277

/** 276 Claim Status Request payload (silver_x12_parsing.py:551-597). */
final case class Status276(
    header: Option[BhtHeader],
    provider: Option[NameInfo],
    subscriber: Option[NameInfo],
    patient: Option[NameInfo],
    trace: Option[TraceInfo])

/** STC status info (silver_x12_parsing.py:640-650). */
final case class ClaimStatus(
    health_care_claim_status_code: Option[String],
    status_date: Option[String],
    action_code: Option[String],
    total_claim_charge_amount: Double,
    claim_payment_amount: Double,
    category_of_service: Option[String],
    status_effective_date: Option[String])

/** 277 Claim Status Response payload (silver_x12_parsing.py:599-656). */
final case class Status277(
    header: Option[BhtHeader],
    source: Option[NameInfo],
    receiver: Option[NameInfo],
    claim_status: Seq[ClaimStatus])

// ---------------------------------------------------------------- 278/279

/** A hierarchical-level participant: HL id merged with NM1 name fields
  * (silver_x12_parsing.py:685-720 — reference `update()`s dicts in place).
  */
final case class Party(
    hierarchical_id: Option[String],
    entity_identifier_code: Option[String],
    entity_type_qualifier: Option[String],
    last_name_or_org_name: Option[String],
    first_name: Option[String],
    middle_name: Option[String],
    identification_code_qualifier: Option[String],
    identification_code: Option[String])

object Party { val empty: Party = Party(None, None, None, None, None, None, None, None) }

/** UM review info (silver_x12_parsing.py:722-728). */
final case class ReviewInfo(
    request_category_code: Option[String],
    certification_type_code: Option[String],
    service_type_code: Option[String],
    shortage_area_code: Option[String],
    review_identification_number: Option[String])

/** 278 SV1 with composite qualifier:id split (silver_x12_parsing.py:730-744). */
final case class PreauthService(
    product_service_id_qualifier: Option[String],
    product_service_id: Option[String],
    monetary_amount: Double,
    unit_basis_measurement_code: Option[String],
    service_unit_count: Double,
    place_of_service_code: Option[String],
    diagnosis_code_pointer: Option[String])

/** 278 Preauthorization Request payload (silver_x12_parsing.py:658-762). */
final case class Preauth278(
    header: Option[BhtHeader],
    submitter: Party,
    receiver: Party,
    patient: Party,
    service_provider: Party,
    requesting_provider: Party,
    review_information: Option[ReviewInfo],
    services: Seq[PreauthService],
    service_dates: Seq[DatePeriod])

/** PWK paperwork (silver_x12_parsing.py:846-851). */
final case class Paperwork(
    report_type_code: Option[String],
    report_transmission_code: Option[String],
    report_copies_needed: Option[Int])

/** HCR review result (silver_x12_parsing.py:826-833). */
final case class ReviewResult(
    action_code: Option[String],
    review_identification_number: Option[String],
    review_decision_reason_code: Option[String],
    second_review_decision_reason_code: Option[String],
    paperwork: Option[Paperwork])

/** MSG free-form message (silver_x12_parsing.py:836-841). */
final case class Message(free_form_message_text: Option[String])

/** 279 Preauthorization Response payload (silver_x12_parsing.py:764-870). */
final case class Preauth279(
    header: Option[BhtHeader],
    source: Party,
    receiver: Party,
    patient: Party,
    service_provider: Party,
    review_results: Seq[ReviewResult],
    messages: Seq[Message],
    authorization_dates: Seq[DatePeriod])

/** Fallback for unknown transaction types (silver_x12_parsing.py:872-878). */
final case class GenericParsed(
    segments_parsed: Int,
    segment_types: Seq[String],
    raw_segments: Seq[Segment])

/** Union payload — exactly one branch non-empty per transaction (the Spark
  * analog of the reference's per-type dict; branch = transaction_type).
  * Catalyst prunes unread branches at the parquet scan, so a gold mart that
  * touches only `claim837` never deserializes the other eight.
  */
final case class ParsedPayload(
    claim837: Option[Claim837],
    payment835: Option[Payment835],
    enrollment834: Option[Enrollment834],
    eligibility270: Option[Eligibility270],
    eligibility271: Option[Eligibility271],
    status276: Option[Status276],
    status277: Option[Status277],
    preauth278: Option[Preauth278],
    preauth279: Option[Preauth279],
    generic: Option[GenericParsed])

object ParsedPayload {
  val empty: ParsedPayload =
    ParsedPayload(None, None, None, None, None, None, None, None, None, None)
}

/** Validation outcome (silver_x12_parsing.py:1040-1045, score at :1068-1073). */
final case class ValidationResult(
    is_valid: Boolean,
    quality_score: Int,
    issues: Seq[String],
    warnings: Seq[String])

/** One silver row = one X12 transaction set
  * (schema parity: silver_x12_parsing.py:1333-1349; the typed `payload`
  * supersedes the reference's JSON-string `parsed_data` — the JSON view is
  * derived with to_json at the silver boundary. `group_control_number` /
  * `transaction_control_number` are the columns the reference ack notebook
  * reads but silver never wrote (generate_x12_acknowledgments.py:158-160) —
  * defined properly here so the ack path type-checks.)
  */
final case class SilverRecord(
    batch_id: String,
    file_name: String,
    processing_timestamp: java.sql.Timestamp,
    interchange_control_number: String,
    functional_group_number: String,
    transaction_set_control_number: String,
    transaction_type: String,
    sender_id: String,
    receiver_id: String,
    transaction_date: String,
    payload: ParsedPayload,
    validation: ValidationResult,
    parsing_error: Option[String],
    quality_score: Int,
    is_valid: Boolean,
    processing_date: java.sql.Date)
