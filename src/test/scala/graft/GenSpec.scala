package graft

import graft.gen.{ChangeGen, GenConfig}

class GenSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(events = 5000, segmentSize = 512)

  test("generator is deterministic across runs") {
    val a = ChangeGen.events(spark, cfg).collect().sortBy(e => (e.lsn, e.seg))
    val b = ChangeGen.events(spark, cfg).collect().sortBy(e => (e.lsn, e.seg))
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) =>
      x.op == y.op && x.lsn == y.lsn && x.url == y.url && x.text == y.text &&
        x.seg == y.seg && x.wal_part == y.wal_part
    })
  }

  test("op mix, duplicates, per-part lsn monotonicity, out-of-order arrival") {
    val evs = ChangeGen.events(spark, cfg).collect()
    val distinct = evs.distinctBy(_.lsn)
    assert(distinct.length == cfg.events)
    assert(evs.length > cfg.events) // duplicate re-deliveries exist
    val mix = distinct.groupBy(_.op).view.mapValues(_.length.toDouble / cfg.events).toMap
    assert(mix("I") > 0.65 && mix("I") < 0.75, s"insert share ${mix("I")}")
    assert(mix("U") > 0.20 && mix("U") < 0.30)
    assert(mix("D") > 0.02 && mix("D") < 0.08)
    // lsn strictly increasing per wal_part (WAL contract)
    distinct.groupBy(_.wal_part).foreach { case (_, es) =>
      val ls = es.sortBy(_.lsn).map(_.lsn)
      assert(ls.zip(ls.tail).forall { case (a, b) => a < b })
    }
    // arrival (segment) order ≠ lsn order: some later segment has a smaller lsn
    val bySeg = distinct.sortBy(_.seg)
    assert(bySeg.zip(bySeg.tail).exists { case (a, b) => a.seg < b.seg && a.lsn > b.lsn })
    // updates/deletes target previously inserted urls
    val inserted = distinct.filter(_.op == "I").map(_.url).toSet
    assert(distinct.filter(e => e.op != "I").forall(e => inserted.contains(e.url)))
  }

  test("domain skew is Zipf-hot") {
    val evs = ChangeGen.events(spark, cfg).collect().distinctBy(_.lsn)
    val domains = evs.map(e => e.url.split('/')(2)).groupBy(identity).view.mapValues(_.length).toSeq
    val top = domains.map(_._2).max.toDouble / evs.length
    assert(top > 0.15, s"hottest domain share $top — expected Zipf skew")
  }

  test("text is a pure function of the raw html bytes: extractText(html) == text, byte-identical") {
    import org.apache.spark.sql.functions.col
    // the replay invariant's derivation direction: the WAL's `text` column is
    // re-derivable from `html` alone, so ANY replay that preserves html bytes
    // reconverges to byte-identical extracted text per url
    val mismatches = ChangeGen.events(spark, cfg).toDF()
      .filter(col("op") =!= "D")
      .filter(graft.functions.Text.extractText(col("html")) =!= col("text"))
      .count()
    assert(mismatches == 0L)
  }
}
