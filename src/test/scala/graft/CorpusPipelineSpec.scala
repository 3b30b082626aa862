package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusPipeline

/** Decontamination + sequence packing (the composed corpus pipeline
  * itself is covered in RangeOpsSpec alongside its building blocks).
  */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags docs overlapping the benchmark slice") {
    // benchMod=29 → ids 0 and 29 are benchmark docs
    val bench0 = "alpha beta gamma delta epsilon zeta eta theta"
    val bench29 = "one two three four five six seven eight nine"
    val docs = Seq(
      (0L, bench0, "en", "s", 10L),
      (29L, bench29, "en", "s", 10L),
      (5L, bench0, "en", "s", 10L),              // exact copy of bench 0
      (7L, "one two three four five ten", "en", "s", 10L), // partial of 29
      (9L, "completely different words entirely here now", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.decontaminate(docs, tau = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(5L) == (0L, 1.0)) // all shingles contained in bench 0
    // doc 7: shingles {one two three, two three four, three four five,
    // four five ten} — 3 of 4 appear in bench 29
    assert(out(7L) == (29L, 0.75))
    assert(!out.contains(9L)) // disjoint: never flagged
    assert(!out.contains(0L) && !out.contains(29L)) // bench side excluded
  }

  test("packSequences matches a driver-side running-sum reference") {
    // pure-alpha words so regex tokens == words; irregular sizes and a
    // blockSize smaller than the corpus exercise the ledger path
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(137)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))("word").mkString(" "),
        "en", "s", 10L))
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPipeline.packSequences(docs, seqLen = 16L, blockSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // reference: plain sequential packing over doc_id order
    var cum = 0L
    val bins = rows.sortBy(_._1).map { case (id, text, _, _, _) =>
      val n = text.split(" ").length.toLong
      val start = cum; cum += n
      (start / 16L, id, n)
    }
    val expected = bins.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, xs) => (bin, xs.length.toLong, xs.map(_._3).sum,
        xs.map(_._2).min, xs.map(_._2).max)
    }
    assert(got.toSeq == expected)
  }

  test("packSequences is layout-independent") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(3 + i % 5)("tok").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = CorpusPipeline.packSequences(docs, 32L, 7L).collect()
    val b = CorpusPipeline.packSequences(docs.repartition(13), 32L, 7L).collect()
    assert(a.sameElements(b))
  }
}
