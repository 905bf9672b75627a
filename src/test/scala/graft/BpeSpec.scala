package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** BPE merge learning: greedy pair selection must match hand counts,
  * repeated-symbol runs must fuse left-to-right, ties must break
  * lexicographically, and the final segmentation must reassemble every
  * word exactly.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two rounds match hand-computed greedy merges") {
    // "aab" x3 + "ab" x2: pairs r1 — (a,a):3, (a,b):5 → merge (a,b).
    // r2 reps: "a ab" x3, "ab" x2 → (a,ab):3 → merge (a,ab).
    val docs = Seq("aab aab aab ab ab").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "b", 5L), (2L, "a", "ab", 3L)))
  }

  test("repeated-symbol runs fuse with left-to-right greed") {
    val docs = Seq("aaaa aaaa").toDF("text")
    val (merges, reps) = Bpe.learn(docs, "text", 1)
    assert(merges.as[(Long, String, String, Long)].collect().toSeq ==
      Seq((1L, "a", "a", 6L))) // 3 adjacent pairs x wc 2
    // "a a a a" → "aa aa", never "aa a a"
    val rep = reps.select("rep").as[String].head()
    assert(rep == "  aa  aa  ", rep)
  }

  test("equal-count ties break lexicographically") {
    // "xy" and "ab" once each: both pairs count 1 → (a,b) wins.
    val docs = Seq("xy ab").toDF("text")
    val m = Bpe.learnMerges(docs, "text", 1)
      .as[(Long, String, String, Long)].head()
    assert(m == ((1L, "a", "b", 1L)))
  }

  test("encode replays training: corpus words segment exactly as trained") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, reps) = Bpe.learn(docs, "text", 3)
    val trained = reps.select(col("word"),
      regexp_replace(trim(col("rep")), "  ", " ").as("expected"))
    val encoded = Bpe.encode(reps.select(col("word").as("text")), "text", merges)
      .select(col("text").as("word"),
        concat_ws(" ", col("subwords")).as("got"))
    val diff = trained.join(encoded, Seq("word"))
      .filter(col("expected") =!= col("got")).count()
    assert(diff == 0)
  }

  test("encode segments unseen words with the learned merges in order") {
    val train = Seq("aab aab aab ab ab").toDF("text")
    val merges = Bpe.learnMerges(train, "text", 2) // (a,b) then (a,ab)
    val out = Bpe.encode(Seq("baab xy").toDF("text"), "text", merges)
      .select("n_words", "n_subwords", "subwords")
      .as[(Long, Long, Seq[String])].head()
    assert(out == ((2L, 4L, Seq("b", "aab", "x", "y"))))
  }

  test("vocabulary-join encode equals chain encode, unseen words fall back") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val (merges, vocab) = Bpe.learn(docs, "text", 3)
    val chain = Bpe.encode(docs, "text", merges)
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        concat_ws(" ", col("subwords")).as("st"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val byVocab = Bpe.encodeByVocab(docs, "doc_id", "text", merges, vocab)
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        concat_ws(" ", col("subwords")).as("st"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(chain.nonEmpty && chain == byVocab)
    // A document of unseen words still segments (chain fallback).
    val unseen = Seq((1L, "zzq wvx")).toDF("doc_id", "text")
    val out = Bpe.encodeByVocab(unseen, "doc_id", "text", merges, vocab)
      .select("subwords").as[Seq[String]].head()
    assert(out.mkString("") == "zzqwvx")
  }

  test("pair-less vocabulary ends training early and keeps the word table") {
    val docs = Seq("a b c a b").toDF("text")
    val (merges, reps) = Bpe.learn(docs, "text", 3)
    assert(merges.count() == 0)
    assert(reps.count() == 3) // a, b, c survive the early stop
    // Partial progress: one mergeable pair, then rounds run dry.
    val (m2, r2) = Bpe.learn(Seq("ab ab cd").toDF("text"), "text", 3)
    assert(m2.as[(Long, String, String, Long)].collect().toSeq ==
      Seq((1L, "a", "b", 2L), (2L, "c", "d", 1L)))
    assert(r2.count() == 2)
  }

  test("final segmentation reassembles every word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (_, reps) = Bpe.learn(docs, "text", 3)
    val bad = reps
      .withColumn("joined", concat_ws("",
        graft.functions.Text.tokens(regexp_replace(col("rep"), "  ", " "))))
      .filter(col("joined") =!= col("word"))
      .count()
    assert(bad == 0)
  }

  test("fertility histogram conserves types and token mass") {
    val docs = Seq((1L, "aa aa aa bb cc"), (2L, "aa bb dd dd")).toDF("id", "text")
    val hist = graft.functions.Bpe.fertilityStats(docs, "text", 2)
      .collect().map(r => r.getAs[Long]("n_syms") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("total_wc")))).toMap
    // 4 word types, 9 word occurrences — bins must partition both
    assert(hist.values.map(_._1).sum === 4L)
    assert(hist.values.map(_._2).sum === 9L)
    // round 1 merges (a,a) [wc 4 beats d's 2]; round 2 merges (b,b) or
    // (d,d) by count-then-lex ties => "aa" is 1 symbol, one of bb/dd too
    assert(hist.contains(1L) && hist(1L)._2 >= 4L)
    // nothing can have more symbols than its character count (2 here)
    assert(hist.keySet.max <= 2L)
  }
}
