package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bpe, BpeKernel}

class BpeSpec extends AnyFunSuite {
  import TestSession._

  // the classic BPE corpus (Sennrich et al.'s worked example shape):
  // low×5, lower×2, newest×6, widest×3
  private val ChainedMerges =
    Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w")
  private lazy val ranks = new BpeKernel.Ranks(ChainedMerges)

  test("greedy merge loop follows rank order through chained merges") {
    // lowest: es (rank0) → est (rank1) → lo (rank2) → low (rank3)
    assert(BpeKernel.tokenizeWord("lowest", ranks) == Seq("low", "est"))
    assert(BpeKernel.countWord("lowest", ranks) == 2)
    assert(BpeKernel.tokenizeWord("lower", ranks) == Seq("low", "e", "r"))
    assert(BpeKernel.tokenizeWord("newest", ranks) == Seq("n", "e", "w", "est"))
    assert(BpeKernel.tokenizeWord("low", ranks) == Seq("low"))
    // no applicable merges → pure chars; empty word → 0
    assert(BpeKernel.countWord("xyz", ranks) == 3)
    assert(BpeKernel.countWord("", ranks) == 0)
    // a merge applies to ALL its occurrences before the next rank
    assert(BpeKernel.tokenizeWord("eses", ranks) == Seq("es", "es"))
  }

  test("learnMerges reproduces the published example's merge sequence") {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val learned = Bpe.learnMerges(docs, nMerges = 4)
    // (e,s)=9 beats (s,t)=9 lexicographically; then est; then (l,o)=7
    // beats (o,w)=7; then (lo,w)=7
    assert(learned == ChainedMerges)
  }

  test("bpe_token_count column matches the kernel, codegen on") {
    import spark.implicits._
    val docs = Seq("lowest newest", "low lower", "", "no merges here qqq")
      .toDF("text")
    val got = docs.select(
      Bpe.bpe_token_count(col("text"), ChainedMerges).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // lowest(2)+newest(4)=6; low(1)+lower(3)=4; ""=0
    assert(got.take(3) == Seq(6, 4, 0))
    // and the driver-side kernel agrees on the last row
    val ranks2 = new BpeKernel.Ranks(ChainedMerges)
    assert(got(3) ==
      BpeKernel.countTokens(
        org.apache.spark.unsafe.types.UTF8String
          .fromString("no merges here qqq"), ranks2))
  }

  test("OracleMerges greedy result equals the closed form on the corpus") {
    // the oracle's whole premise: for the non-chaining digraph table,
    // greedy BPE token count == non-space chars − Σ pair occurrences.
    // Pin it against the REAL documents, computed independently here.
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        Bpe.bpe_token_count(col("text")).as("n_bpe"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(1)
      def occ(p: String): Int =
        (text.length - text.replace(p, "").length) / 2
      val closed = text.replace(" ", "").length -
        Seq("th", "er", "on", "an", "is", "ed").map(occ).sum
      assert(r.getInt(2) == closed, s"doc ${r.getLong(0)}")
    }
  }

  test("packBpe bins are consistent with its own token counts") {
    val out = graft.operators.TextAnalysis.packBpe(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, off, first, last) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(off >= 0 && off < 128 && first <= last)
      assert(last == (first * 128 + off + n - 1) / 128)
    }
  }
}
