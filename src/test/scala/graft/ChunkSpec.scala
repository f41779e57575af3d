package graft

import org.apache.spark.sql.functions._

import graft.ops.Chunk

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"),       // 10 tokens
    (2L, "one  two\tthree"),           // 3 tokens, messy whitespace
    (3L, ""),                          // empty → no chunks
    (4L, (1 to 25).map(i => s"t$i").mkString(" ")) // 25 tokens
  ).toDF("doc_id", "text")

  test("chunkTokens: non-overlapping chunks reassemble the token stream") {
    val out = Chunk.chunkTokens(docs, "text", "doc_id", chunkSize = 4, overlap = 0)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 1: 10 tokens / 4 → 3 chunks (4,4,2)
    assert(byDoc(1L).map(_.getLong(3)).toSeq == Seq(4L, 4L, 2L))
    assert(byDoc(1L).map(_.getString(2)).mkString(" ") == "a b c d e f g h i j")
    // doc 2: whitespace-normalized
    assert(byDoc(2L).map(_.getString(2)).toSeq == Seq("one two three"))
    // doc 3: no rows
    assert(!byDoc.contains(3L))
    // doc 4: 25 / 4 → 7 chunks, last of 1
    assert(byDoc(4L).length == 7 && byDoc(4L).last.getLong(3) == 1L)
  }

  test("chunkTokens: overlap repeats the window tail") {
    val out = Chunk.chunkTokens(docs.filter($"doc_id" === 1), "text", "doc_id",
      chunkSize = 6, overlap = 2).orderBy("chunk_idx").collect()
    // stride 4: starts 0 and 4 — window [4:10] reaches the end, so no third
    assert(out.map(_.getString(2)).toSeq ==
      Seq("a b c d e f", "e f g h i j"))
  }

  test("packContext: offsets are the exclusive prefix sums in doc_id order") {
    val out = Chunk.packContext(docs, "text", "doc_id", contextSize = 16)
      .orderBy("doc_id").collect()
    // token counts: 10, 3, 0, 25 → offsets 0, 10, 13, 13
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 10L, 0L), (2L, 3L, 10L), (3L, 0L, 13L), (4L, 25L, 13L)))
    // doc 4 spans tokens 13..37 → bins 0..2 at contextSize 16
    val d4 = out.find(_.getLong(0) == 4L).get
    assert(d4.getLong(3) == 0L && d4.getLong(4) == 2L)
    // zero-token doc: bin_first == bin_last
    val d3 = out.find(_.getLong(0) == 3L).get
    assert(d3.getLong(3) == d3.getLong(4))
  }

  test("packContext: no single-partition funnel in the plan") {
    val plan = Chunk.packContext(docs, "text", "doc_id", contextSize = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
