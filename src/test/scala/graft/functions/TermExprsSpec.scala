package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Parity specs for the round-8 term-grain expressions: each native loop
  * must equal the composable (HOF / relational) form it replaced,
  * element-for-element, on real fixture text plus hand-built edge cases.
  */
class TermExprsSpec extends AnyFunSuite with SparkTestBase {

  private def fixtureDocs = {
    import spark.implicits._
    val tricky = Seq(
      (9100001L, "a b c a b"),            // duplicate bigram kept (occurrences!)
      (9100002L, "single"),               // one token → empty
      (9100003L, ""),                     // "" splits to [""] → empty
      (9100004L, "a  b c"),               // double space → empty middle token
      (9100005L, "héllo wörld héllo wörld x"),
      (9100006L, "trailing space "))
      .toDF("doc_id", "text")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(tricky)
  }

  test("graft_bigrams matches the HOF occurrence form exactly") {
    GraftFunctions.register(spark)
    val docs = fixtureDocs
    val sp = split(col("text"), " ")
    val hof = docs.select(col("doc_id"),
      when(size(sp) >= 2, transform(sequence(lit(1), size(sp) - 1),
        i => concat(element_at(sp, i), lit(" "), element_at(sp, i + 1))))
        .otherwise(array().cast("array<string>")).as("h"))
    val fast = docs.select(col("doc_id"),
      GraftFunctions.bigrams(col("text")).as("f"))
    val joined = hof.join(fast, "doc_id")
    assert(joined.filter(col("h") =!= col("f")).count() == 0,
      "native bigram occurrences must equal the HOF form element-for-element")
    assert(joined.count() == docs.count())
    // duplicates are KEPT, in order — the distinction vs graft_shingles
    val m = fast.filter(col("doc_id") === 9100001L)
      .head.getSeq[String](1)
    assert(m == Seq("a b", "b c", "c a", "a b"))
  }

  test("q51 self-join pair mining equals the local nested-HOF expansion") {
    GraftFunctions.register(spark)
    val docs = fixtureDocs
    // the reference semantics q51 re-expresses: per-doc sorted-distinct
    // C(k,2) pairs, empty token dropped, counted across docs
    val t = array_sort(array_distinct(split(col("text"), " ")))
    val hof = docs.select(explode(
        filter(flatten(transform(t, (x, i) =>
          transform(slice(t, i + 2, size(t)), y =>
            concat(x, lit(" "), y)))), p => !p.startsWith(" "))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_docs"))
      .select(element_at(split(col("pair"), " "), 1).as("tok_a"),
        element_at(split(col("pair"), " "), 2).as("tok_b"), col("n_docs"))
    val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok_a"))
      .filter(length(col("tok_a")) > 0)
    val b = toks.select(col("doc_id"), col("tok_a").as("tok_b"))
    val joined = toks.hint("shuffle_hash").join(b.hint("shuffle_hash"),
        Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_docs"))
    assert(hof.exceptAll(joined).count() == 0 &&
      joined.exceptAll(hof).count() == 0,
      "self-join pair counts must equal the local-expansion reference")
    assert(joined.count() > 0)
  }

  test("graft_tf matches groupBy(doc_id, token) tf counts and totals") {
    GraftFunctions.register(spark)
    val docs = fixtureDocs
    val F = GraftFunctions
    val occ = docs.select(col("doc_id"),
      explode(F.bigrams(col("text"))).as("token"))
    val relational = occ.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val relTotals = occ.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val fast = docs.select(col("doc_id"),
        explode(F.termFreq(F.bigrams(col("text")))).as("t"))
      .select(col("doc_id"), col("t.token").as("token"),
        col("t.tf").as("ftf"), col("t.n_terms").as("fn"))
    // identical (doc, token, tf) triples
    val cmp = relational.join(fast, Seq("doc_id", "token"), "full_outer")
    assert(cmp.filter(col("tf").isNull || col("ftf").isNull ||
      col("tf") =!= col("ftf")).count() == 0,
      "per-(doc, token) tf must match the relational aggregation")
    // n_terms equals the per-doc occurrence total on every row
    val tot = fast.join(relTotals, "doc_id")
    assert(tot.filter(col("fn") =!= col("n_tokens")).count() == 0)
  }

  test("graft_hash_embed matches the md5-byte composable form, empties included") {
    GraftFunctions.register(spark)
    val docs = fixtureDocs
    val sp = split(col("text"), " ")
    val hof = docs.select(col("doc_id"),
      transform(sequence(lit(1), lit(16)), i =>
        aggregate(sp, lit(0L), (acc, t) =>
          acc + conv(substring(md5(t), (i - 1) * 2 + 1, lit(2)), 16, 10)
            .cast("long") - 128).cast("double")).as("h"))
    val fast = docs.select(col("doc_id"),
      GraftFunctions.hashEmbed(col("text")).as("f"))
    val joined = hof.join(fast, "doc_id")
    assert(joined.filter(col("h") =!= col("f")).count() == 0,
      "native hash embedding must equal the md5-byte HOF form")
    assert(joined.count() == docs.count())
    // determinism + shape: 16 dims, same text → same vector
    val one = fast.filter(col("doc_id") === 9100005L).head.getSeq[Double](1)
    assert(one.length == 16)
  }

  test("td45 fast path (tfidfPairsFromCounts) row-identical to generic tfidfPairs") {
    GraftFunctions.register(spark)
    val F = GraftFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nDocs = docs.count()
    val generic = graft.operators.TextAnalysis.tfidfPairs(
      docs.select(col("doc_id"), explode(F.bigrams(col("text"))).as("token")),
      nDocs, maxDf = 5, threshold = 0.10)
    val tfRows = docs.select(col("doc_id"),
        explode(F.termFreq(F.bigrams(col("text")))).as("t"))
      .select(col("doc_id"), col("t.token").as("token"),
        col("t.tf").as("tf"), col("t.n_terms").as("n_tokens"))
    val census = docs.select(explode(F.shingles(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val fast = graft.operators.TextAnalysis.tfidfPairsFromCounts(
      tfRows, census, nDocs, maxDf = 5, threshold = 0.10)
    assert(generic.count() > 0, "fixture must produce pairs at this threshold")
    assert(generic.exceptAll(fast).count() == 0 &&
      fast.exceptAll(generic).count() == 0,
      "precounted fast path must be row-identical to the generic front-end")
  }
}
