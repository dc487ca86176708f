package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two double arrays.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * builds an intermediate product array per row and evaluates both lambdas
  * interpreted (HigherOrderFunction bodies are not code-generated). For the
  * embedding-similarity hot path (SURVEY.md training-data ops; 64-float
  * vectors × millions of candidate pairs) this expression compiles to a
  * tight fused loop inside whole-stage codegen: no allocation, no lambda
  * dispatch.
  *
  * The accumulation is the same left-to-right double fold as the
  * higher-order form and the DuckDB oracle's list_sum, so results are
  * bit-identical across all three.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Matches `aggregate(zip_with(a, b, _*_), 0.0, _+_)` exactly: a null
    * element poisons the product and the fold (null result), and zip_with
    * pads length-mismatched arrays with nulls, so a mismatch is null too —
    * never a silent zero or partial sum.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Registration: both the imperative hook (for library use) and the
  * `SparkSessionExtensions` injection point (for
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {
  /** Shared builder with an explicit arity check — analysis reports a clear
    * wrong-number-of-arguments error instead of IndexOutOfBoundsException.
    */
  private[functions] val buildDot: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_dot: expected 2 " +
          s"(graft_dot(array<double>, array<double>)), got ${children.length}")
    ArrayDot(children(0), children(1))
  }

  /** graft_minhash(shingles, k): k must be an integer literal — the
    * signature width is a plan-time constant.
    */
  private[functions] val buildMinHash: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_minhash: expected 2 " +
          s"(graft_minhash(array<string>, k)), got ${children.length}")
    children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
        MinHashSigs(children(0), k)
      case other => throw new IllegalArgumentException(
        s"graft_minhash k must be an integer literal, got $other")
    }
  }

  private[functions] val buildNfc: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_nfc: expected 1, " +
          s"got ${children.length}")
    NfcNormalize(children.head)
  }

  private[functions] val buildMinHashU: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_minhash_u: expected 2 " +
          s"(graft_minhash_u(array<string>, k)), got ${children.length}")
    children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
        MinHashUniversal(children(0), k)
      case other => throw new IllegalArgumentException(
        s"graft_minhash_u k must be an integer literal, got $other")
    }
  }

  private[functions] val buildNgramDigests: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_ngram_digests: " +
          s"expected 2 (graft_ngram_digests(text, n)), got ${children.length}")
    children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
        NgramDigests(children(0), n)
      case other => throw new IllegalArgumentException(
        s"graft_ngram_digests n must be an integer literal, got $other")
    }
  }

  private[functions] val buildGopherStats: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_gopher_stats: " +
          s"expected 2 (graft_gopher_stats(text, stopwords)), got ${children.length}")
    if (!children(1).foldable)
      throw new IllegalArgumentException(
        "graft_gopher_stats stopwords must be foldable (an array literal)")
    val arr = children(1).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val stops = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    GopherStats(children(0), stops)
  }

  private[functions] val buildStripSpans: Seq[Expression] => Expression = children => {
    if (children.length != 3 && children.length != 4)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_strip_spans: " +
          s"expected 3-4 (graft_strip_spans(text, starts, n[, sep])), " +
          s"got ${children.length}")
    val sep = if (children.length == 4) children(3) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"graft_strip_spans sep must be a string literal, got $other")
    } else " "
    children(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
        StripSpans(children(0), children(1), n, sep)
      case other => throw new IllegalArgumentException(
        s"graft_strip_spans n must be an integer literal, got $other")
    }
  }

  private[functions] val buildTopFreq: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_top_freq: " +
          s"expected 1 (graft_top_freq(array<string>)), got ${children.length}")
    TopFreq(children.head)
  }

  private[functions] val buildShingles: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_shingles: expected 1, " +
          s"got ${children.length}")
    BigramShingles(children.head)
  }

  private[functions] val buildBigrams: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bigrams: expected 1, " +
          s"got ${children.length}")
    WordBigrams(children.head)
  }

  private[functions] val buildTf: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_tf: expected 1, " +
          s"got ${children.length}")
    TermFreq(children.head)
  }

  private[functions] val buildHashEmbed: Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_hash_embed: " +
          s"expected 1, got ${children.length}")
    HashEmbed(children.head)
  }

  private[functions] val buildBpeMerge: Seq[Expression] => Expression = children => {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bpe_merge: " +
          s"expected 3 (graft_bpe_merge(w, l, r)), got ${children.length}")
    BpeMerge(children(0), children(1), children(2))
  }

  /** graft_bloom_contains(sketchBytes, long): Spark's own codegen'd
    * `BloomFilterMightContain` — the engine's runtime-row-filter probe —
    * exposed as a registered function so library operators
    * (TextDedup.bloomScreen) can apply an explicit Bloom prune with a
    * plan-embedded literal sketch. The sketch argument must be foldable
    * (the expression's own contract); the value side is an xxhash64 long.
    */
  private[functions] val buildBloomContains: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bloom_contains: " +
          s"expected 2 (graft_bloom_contains(binary, bigint)), got ${children.length}")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      children(0), children(1))
  }

  /** graft_bloom_agg(longCol, items, numBits): Spark's distributed Bloom
    * sketch build (`BloomFilterAggregate` — partial sketches merge
    * map-side, one binary row out). items/numBits must be long literals.
    */
  private[functions] val buildBloomAgg: Seq[Expression] => Expression = children => {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bloom_agg: " +
          s"expected 3 (graft_bloom_agg(bigint, items, numBits)), got ${children.length}")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      children(0), children(1), children(2)).toAggregateExpression()
  }

  /** graft_cms_agg(col, eps, confidence, seed): Spark's distributed
    * count-min sketch build (`CountMinSketchAgg` — the engine's own
    * mergeable heavy-hitter state, also behind df.stat.countMinSketch).
    * eps/confidence/seed must be foldable literals.
    */
  private[functions] val buildCmsAgg: Seq[Expression] => Expression = children => {
    if (children.length != 4)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_cms_agg: " +
          s"expected 4 (graft_cms_agg(col, eps, confidence, seed)), got ${children.length}")
    new org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg(
      children(0), children(1), children(2), children(3)).toAggregateExpression()
  }

  /** graft_lm_score(tokens, biMap, wMap, lpq0): the two model maps and
    * the unseen-word fallback must be FOLDABLE — they ARE the model
    * (bpeEncode's rules idiom), inlined plan-side and converted once to
    * hash tables so the per-position lookup is O(1), not a linear
    * map-literal scan.
    */
  private[functions] val buildLmScore: Seq[Expression] => Expression = children => {
    if (children.length != 4)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_lm_score: expected 4 " +
          s"(graft_lm_score(array<string>, map, map, lpq0)), got ${children.length}")
    def toTable(e: Expression, what: String) = {
      if (!e.foldable)
        throw new IllegalArgumentException(
          s"graft_lm_score $what must be foldable (a map literal)")
      val md = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val m = new java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, java.lang.Long](
        md.numElements() * 2)
      val ks = md.keyArray()
      val vs = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        m.put(ks.getUTF8String(i).clone(),
          java.lang.Long.valueOf(vs.getLong(i)))
        i += 1
      }
      m
    }
    children(3) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(lpq0: Long, _) =>
        LmScore(children(0), toTable(children(1), "bigram model"),
          toTable(children(2), "word model"), lpq0)
      case other => throw new IllegalArgumentException(
        s"graft_lm_score lpq0 must be a long literal, got $other")
    }
  }

  /** graft_nb_seen(tokens, lutMap, nLabels): the vocabulary lookup table
    * must be FOLDABLE (a map<string, array<long>> literal — it IS the
    * model, the graft_lm_score idiom) and is converted once to a hash
    * table of primitive long arrays; nLabels a literal so an EMPTY vocab
    * still types.
    */
  private[functions] val buildNbSeen: Seq[Expression] => Expression = children => {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_nb_seen: expected 3 " +
          s"(graft_nb_seen(array<string>, map, nLabels)), got ${children.length}")
    if (!children(1).foldable)
      throw new IllegalArgumentException(
        "graft_nb_seen lookup table must be foldable (a map literal)")
    val nLabels = children(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case other => throw new IllegalArgumentException(
        s"graft_nb_seen nLabels must be an int literal, got $other")
    }
    require(nLabels >= 1, s"graft_nb_seen nLabels must be >= 1, got $nLabels")
    val md = children(1).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Array[Long]](
      md.numElements() * 2)
    val ks = md.keyArray()
    val vs = md.valueArray()
    var i = 0
    while (i < md.numElements()) {
      val a = vs.getArray(i).toLongArray()
      require(a.length == nLabels,
        s"graft_nb_seen: lut value arity ${a.length} != nLabels $nLabels")
      m.put(ks.getUTF8String(i).clone(), a)
      i += 1
    }
    NbSeen(children(0), m, nLabels)
  }

  private def toQueryIdx(e: Expression, fn: String)
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn query index must be foldable (a map literal)")
    val md = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Integer](
      md.numElements() * 2)
    val ks = md.keyArray()
    val vs = md.valueArray()
    var i = 0
    while (i < md.numElements()) {
      val slot = vs.getInt(i)
      // fail at plan build on the driver, not AIOOBE at executor time
      // inside the hits array (r11 advice: buildBm25Q range-checked its
      // slots, this shared builder did not)
      if (slot < 0)
        throw new IllegalArgumentException(
          s"$fn: query slot $slot for token '${ks.getUTF8String(i)}' " +
            "must be >= 0")
      m.put(ks.getUTF8String(i).clone(), Integer.valueOf(slot))
      i += 1
    }
    m
  }

  private def longLit(e: Expression, fn: String, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be a long literal, got $other")
  }

  /** graft_query_hits(tokens, qIdxMap): the query-slot map must be
    * foldable (it is query-sized — the model idiom).
    */
  private[functions] val buildQueryHits: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_query_hits: " +
          s"expected 2, got ${children.length}")
    val qIdx = toQueryIdx(children(1), "graft_query_hits")
    val nq = if (qIdx.isEmpty) 0
      else qIdx.values().stream().mapToInt(_.intValue()).max().getAsInt + 1
    QueryHits(children(0), qIdx, nq)
  }

  /** graft_bm25q(tokens, qIdxMap, dfArray, nDocs, totTok, quantScale):
    * everything but the tokens is query-sized/scalar and foldable.
    */
  private[functions] val buildBm25Q: Seq[Expression] => Expression = children => {
    if (children.length != 6)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bm25q: " +
          s"expected 6, got ${children.length}")
    val qIdx = toQueryIdx(children(1), "graft_bm25q")
    if (!children(2).foldable)
      throw new IllegalArgumentException(
        "graft_bm25q df must be foldable (an array literal)")
    val df = children(2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    require(qIdx.values().stream().allMatch(v => v >= 0 && v < df.length),
      s"graft_bm25q: query slot out of df range ${df.length}")
    Bm25Q(children(0), qIdx, df,
      longLit(children(3), "graft_bm25q", "nDocs"),
      longLit(children(4), "graft_bm25q", "totTok"),
      longLit(children(5), "graft_bm25q", "quantScale"))
  }

  /** graft_bm25q_multi(tokens, qIdxMap, dfArray, querySlots, nDocs,
    * totTok, quantScale): the batch form of graft_bm25q — everything but
    * the tokens is query-sized/scalar and foldable. querySlots is an
    * array<array<int>> literal: per query index, the union slots of that
    * query's tokens.
    */
  private[functions] val buildBm25QMulti: Seq[Expression] => Expression = children => {
    if (children.length != 7)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_bm25q_multi: " +
          s"expected 7, got ${children.length}")
    val qIdx = toQueryIdx(children(1), "graft_bm25q_multi")
    if (!children(2).foldable)
      throw new IllegalArgumentException(
        "graft_bm25q_multi df must be foldable (an array literal)")
    val df = children(2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    require(qIdx.values().stream().allMatch(v => v >= 0 && v < df.length),
      s"graft_bm25q_multi: query slot out of df range ${df.length}")
    if (!children(3).foldable)
      throw new IllegalArgumentException(
        "graft_bm25q_multi querySlots must be foldable (an array literal)")
    val qsData = children(3).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val querySlots = (0 until qsData.numElements()).map { i =>
      val a = qsData.getArray(i).toIntArray()
      require(a.forall(s => s >= 0 && s < df.length),
        s"graft_bm25q_multi: querySlots[$i] out of df range ${df.length}")
      a
    }.toArray
    Bm25QMulti(children(0), qIdx, df, querySlots,
      longLit(children(4), "graft_bm25q_multi", "nDocs"),
      longLit(children(5), "graft_bm25q_multi", "totTok"),
      longLit(children(6), "graft_bm25q_multi", "quantScale"))
  }

  /** Shared extractor for the 3-nested codebook literal of the PQ
    * kernels: array<array<array<double>>> → double[][][].
    */
  private def toBook(e: Expression, fn: String): Array[Array[Array[Double]]] = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn book must be foldable (a nested array literal)")
    val outer = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until outer.numElements()).map { s =>
      val mid = outer.getArray(s)
      (0 until mid.numElements()).map(c =>
        mid.getArray(c).toDoubleArray()).toArray
    }.toArray
  }

  /** graft_pq_codes(emb, book): the codebook is model-sized and foldable. */
  private[functions] val buildPqCodes: Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_pq_codes: " +
          s"expected 2, got ${children.length}")
    PqCodes(children(0), toBook(children(1), "graft_pq_codes"))
  }

  /** graft_pq_adc(emb, codes, book). */
  private[functions] val buildPqAdc: Seq[Expression] => Expression = children => {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function graft_pq_adc: " +
          s"expected 3, got ${children.length}")
    PqAdc(children(0), children(1), toBook(children(2), "graft_pq_adc"))
  }

  private val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_query_hits"),
      new ExpressionInfo(classOf[QueryHits].getName, "graft_query_hits"),
      buildQueryHits),
    (FunctionIdentifier("graft_bm25q_multi"),
      new ExpressionInfo(classOf[Bm25QMulti].getName, "graft_bm25q_multi"),
      buildBm25QMulti),
    (FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "graft_pq_codes"),
      buildPqCodes),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      buildPqAdc),
    (FunctionIdentifier("graft_bm25q"),
      new ExpressionInfo(classOf[Bm25Q].getName, "graft_bm25q"),
      buildBm25Q),
    (FunctionIdentifier("graft_nb_seen"),
      new ExpressionInfo(classOf[NbSeen].getName, "graft_nb_seen"),
      buildNbSeen),
    (FunctionIdentifier("graft_lm_score"),
      new ExpressionInfo(classOf[LmScore].getName, "graft_lm_score"),
      buildLmScore),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      buildDot),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash"),
      buildMinHash),
    (FunctionIdentifier("graft_minhash_u"),
      new ExpressionInfo(classOf[MinHashUniversal].getName, "graft_minhash_u"),
      buildMinHashU),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      buildNfc),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[BigramShingles].getName, "graft_shingles"),
      buildShingles),
    (FunctionIdentifier("graft_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_bigrams"),
      buildBigrams),
    (FunctionIdentifier("graft_tf"),
      new ExpressionInfo(classOf[TermFreq].getName, "graft_tf"),
      buildTf),
    (FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[BpeMerge].getName, "graft_bpe_merge"),
      buildBpeMerge),
    (FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
      buildHashEmbed),
    (FunctionIdentifier("graft_ngram_digests"),
      new ExpressionInfo(classOf[NgramDigests].getName, "graft_ngram_digests"),
      buildNgramDigests),
    (FunctionIdentifier("graft_gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "graft_gopher_stats"),
      buildGopherStats),
    (FunctionIdentifier("graft_strip_spans"),
      new ExpressionInfo(classOf[StripSpans].getName, "graft_strip_spans"),
      buildStripSpans),
    (FunctionIdentifier("graft_top_freq"),
      new ExpressionInfo(classOf[TopFreq].getName, "graft_top_freq"),
      buildTopFreq),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      buildBloomContains),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      buildBloomAgg),
    (FunctionIdentifier("graft_cms_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg].getName,
        "graft_cms_agg"),
      buildCmsAgg))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = fns.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-level helper once registered. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)

  /** Column-level helper once registered: array of k min-hash hex strings. */
  def minhash(shingles: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash", shingles,
      org.apache.spark.sql.functions.lit(k))

  /** One-digest universal-hash MinHash: array of k min-permutation longs. */
  def minhashU(shingles: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash_u", shingles,
      org.apache.spark.sql.functions.lit(k))

  /** Unicode NFC canonical form (matches DuckDB's nfc_normalize). */
  def nfc(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", text)

  /** Distinct word-bigram shingles, one fused codegen loop (parity with
    * the composable HOF form is spec-pinned).
    */
  def shingles(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_shingles", text)

  /** ALL word-bigram occurrences (duplicates kept, order kept), one fused
    * codegen loop (parity with the composable HOF form is spec-pinned).
    */
  def bigrams(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bigrams", text)

  /** Local term-frequency census of an array<string> — one struct
    * (token, tf) per distinct element, one codegen'd O(n) pass.
    */
  def termFreq(arr: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_tf", arr)

  /** Greedy leftmost non-overlapping BPE merge of rule (l, r) over a
    * U+0001-joined symbol string (exact Sennrich semantics).
    */
  def bpeMerge(w: Column, l: String, r: String): Column =
    org.apache.spark.sql.functions.call_function("graft_bpe_merge", w,
      org.apache.spark.sql.functions.lit(l),
      org.apache.spark.sql.functions.lit(r))

  /** Deterministic 16-dim md5-byte hash-projection embedding (the
    * model-free encoder stand-in; see [[HashEmbed]]).
    */
  def hashEmbed(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hash_embed", text)

  /** Per-doc bigram-LM scoring against inlined model maps (see
    * [[LmScore]]); `bi`/`w` map String→Long, `lpq0` is the unseen-word
    * fallback.
    */
  def lmScore(tokens: Column, bi: Map[String, Long], w: Map[String, Long],
      lpq0: Long): Column =
    org.apache.spark.sql.functions.call_function("graft_lm_score", tokens,
      org.apache.spark.sql.functions.typedlit(bi),
      org.apache.spark.sql.functions.typedlit(w),
      org.apache.spark.sql.functions.lit(lpq0))

  /** Distinct matched query slots per document (see [[QueryHits]]);
    * `qIdx` maps query token → slot index.
    */
  def queryHits(tokens: Column, qIdx: Map[String, Int]): Column =
    org.apache.spark.sql.functions.call_function("graft_query_hits", tokens,
      org.apache.spark.sql.functions.typedlit(qIdx))

  /** Fused quantized BM25 per-document score (see [[Bm25Q]]); null when
    * no query term matches. `df` indexed by `qIdx` slots.
    */
  def bm25q(tokens: Column, qIdx: Map[String, Int], df: Seq[Long],
      nDocs: Long, totTok: Long, quantScale: Long): Column =
    org.apache.spark.sql.functions.call_function("graft_bm25q", tokens,
      org.apache.spark.sql.functions.typedlit(qIdx),
      org.apache.spark.sql.functions.typedlit(df),
      org.apache.spark.sql.functions.lit(nDocs),
      org.apache.spark.sql.functions.lit(totTok),
      org.apache.spark.sql.functions.lit(quantScale))

  /** Batch form of [[bm25q]] (see [[Bm25QMulti]]): every query's score in
    * ONE corpus pass — array<struct<q, bm25q>> of the queries the document
    * matches, null when it matches none. `querySlots(i)` lists query i's
    * union slots; `df` is indexed by `qIdx` slots.
    */
  def bm25qMulti(tokens: Column, qIdx: Map[String, Int], df: Seq[Long],
      querySlots: Seq[Seq[Int]], nDocs: Long, totTok: Long,
      quantScale: Long): Column =
    org.apache.spark.sql.functions.call_function("graft_bm25q_multi", tokens,
      org.apache.spark.sql.functions.typedlit(qIdx),
      org.apache.spark.sql.functions.typedlit(df),
      org.apache.spark.sql.functions.typedlit(querySlots),
      org.apache.spark.sql.functions.lit(nDocs),
      org.apache.spark.sql.functions.lit(totTok),
      org.apache.spark.sql.functions.lit(quantScale))

  /** All PQ subspace codes of an embedding in one pass (see [[PqCodes]]);
    * `book(s)(c)` is centroid c of subspace s. Null codes where the
    * subspace slice is null/short.
    */
  def pqCodes(emb: Column, book: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.functions.call_function("graft_pq_codes", emb,
      org.apache.spark.sql.functions.typedlit(book))

  /** Asymmetric-distance sum of a query/residual embedding against a PQ
    * code array (see [[PqAdc]]); bit-identical to the expanded
    * per-centroid LUT form.
    */
  def pqAdc(emb: Column, codes: Column, book: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.functions.call_function("graft_pq_adc", emb, codes,
      org.apache.spark.sql.functions.typedlit(book))

  /** Per-doc Naive-Bayes seen-sums against an inlined vocabulary table
    * (see [[NbSeen]]); `lut` maps token → per-label quantized log-probs
    * (every value exactly `nLabels` long).
    */
  def nbSeen(tokens: Column, lut: Map[String, Seq[Long]],
      nLabels: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_nb_seen", tokens,
      org.apache.spark.sql.functions.typedlit(lut),
      org.apache.spark.sql.functions.lit(nLabels))

  /** md5 digests of all sliding n-token windows, one fused codegen loop
    * (parity with the composable HOF form is spec-pinned).
    */
  def ngramDigests(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_ngram_digests", text,
      org.apache.spark.sql.functions.lit(n))

  /** All Gopher rule-screen counters in one pass; returns the raw-count
    * struct (see [[GopherStats]] for the parity contract).
    */
  def gopherStats(text: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.functions.call_function("graft_gopher_stats", text,
      org.apache.spark.sql.functions.array(
        stopwords.map(org.apache.spark.sql.functions.lit(_)): _*))

  /** Strip every token covered by a hot n-window start (0-based) and
    * reassemble; returns struct(text, n_removed). See [[StripSpans]].
    */
  def stripSpans(text: Column, starts: Column, n: Int,
      sep: String = " "): Column =
    org.apache.spark.sql.functions.call_function("graft_strip_spans", text,
      starts, org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(sep))

  /** Highest element multiplicity of an array<string>, one codegen'd
    * O(n) hash-count pass (parity with the sorted-run fold is spec-pinned).
    */
  def topFreq(arr: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_top_freq", arr)

  /** Bloom-sketch membership probe (no false negatives); `sketch` must be
    * a literal/foldable binary, `value` the xxhash64 long that was put in.
    */
  def bloomContains(sketch: Column, value: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_contains",
      sketch, value)

  /** Distributed Bloom sketch over a long column → one binary row. */
  def bloomAgg(value: Column, items: Long, numBits: Long): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_agg", value,
      org.apache.spark.sql.functions.lit(items),
      org.apache.spark.sql.functions.lit(numBits))

  /** Distributed count-min sketch over a column → one binary row. */
  def cmsAgg(value: Column, eps: Double, confidence: Double,
      seed: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_cms_agg", value,
      org.apache.spark.sql.functions.lit(eps),
      org.apache.spark.sql.functions.lit(confidence),
      org.apache.spark.sql.functions.lit(seed))
}

/** Extensions entry point: inject graft functions into every session built
  * with `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        GraftFunctions.buildDot))
    ext.injectFunction(
      (FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash"),
        GraftFunctions.buildMinHash))
    ext.injectFunction(
      (FunctionIdentifier("graft_minhash_u"),
        new ExpressionInfo(classOf[MinHashUniversal].getName, "graft_minhash_u"),
        GraftFunctions.buildMinHashU))
    ext.injectFunction(
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        GraftFunctions.buildNfc))
    ext.injectFunction(
      (FunctionIdentifier("graft_shingles"),
        new ExpressionInfo(classOf[BigramShingles].getName, "graft_shingles"),
        GraftFunctions.buildShingles))
    ext.injectFunction(
      (FunctionIdentifier("graft_bigrams"),
        new ExpressionInfo(classOf[WordBigrams].getName, "graft_bigrams"),
        GraftFunctions.buildBigrams))
    ext.injectFunction(
      (FunctionIdentifier("graft_tf"),
        new ExpressionInfo(classOf[TermFreq].getName, "graft_tf"),
        GraftFunctions.buildTf))
    ext.injectFunction(
      (FunctionIdentifier("graft_bpe_merge"),
        new ExpressionInfo(classOf[BpeMerge].getName, "graft_bpe_merge"),
        GraftFunctions.buildBpeMerge))
    ext.injectFunction(
      (FunctionIdentifier("graft_hash_embed"),
        new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
        GraftFunctions.buildHashEmbed))
    ext.injectFunction(
      (FunctionIdentifier("graft_ngram_digests"),
        new ExpressionInfo(classOf[NgramDigests].getName, "graft_ngram_digests"),
        GraftFunctions.buildNgramDigests))
    ext.injectFunction(
      (FunctionIdentifier("graft_gopher_stats"),
        new ExpressionInfo(classOf[GopherStats].getName, "graft_gopher_stats"),
        GraftFunctions.buildGopherStats))
    ext.injectFunction(
      (FunctionIdentifier("graft_strip_spans"),
        new ExpressionInfo(classOf[StripSpans].getName, "graft_strip_spans"),
        GraftFunctions.buildStripSpans))
    ext.injectFunction(
      (FunctionIdentifier("graft_top_freq"),
        new ExpressionInfo(classOf[TopFreq].getName, "graft_top_freq"),
        GraftFunctions.buildTopFreq))
  }
}
