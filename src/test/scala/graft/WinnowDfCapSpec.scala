package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.ops.Dedup

/** The winnow family's dfCap-on-by-default decision (see
  * [[graft.ops.Dedup.WinnowDfCap]]): capped mode must be byte-identical
  * to uncapped on the oracle corpora (the cap never bites there — that
  * invariance is what keeps q128/q163's DuckDB oracles green), and must
  * actually bite on a planted boilerplate corpus, dropping ONLY pairs
  * whose every shared fingerprint is oversubscribed.
  */
class WinnowDfCapSpec extends SparkSpec {

  private val bits = Dedup.OracleHashBits

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("capped default == uncapped on the oracle corpora (q128 and q163)") {
    for (sf <- Seq(sf0001, sf001)) {
      assert(rows(Dedup.winnowPairs(spark, sf, bits)) ==
        rows(Dedup.winnowPairs(spark, sf, bits, dfCap = None)), s"q128 at $sf")
      assert(rows(Dedup.winnowAttribution(spark, sf, bits)) ==
        rows(Dedup.winnowAttribution(spark, sf, bits, dfCap = None)), s"q163 at $sf")
    }
  }

  test("the cap bites on planted boilerplate and preserves rare-run pairs exactly") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("winnow-dfcap")
    // WinnowDfCap+8 docs all carrying the same 30-token boilerplate
    // header (every boilerplate fingerprint lands in all of them ->
    // df > cap), each followed by unique filler; docs 9000/9001 share
    // a rare 30-token run no one else has
    val boiler = (1 to 30).map(i => s"license$i").mkString(" ")
    val rare = (1 to 30).map(i => s"rare$i").mkString(" ")
    val nBoiler = Dedup.WinnowDfCap + 8
    val docs =
      (0 until nBoiler).map { d =>
        (d.toLong, boiler + " " + (1 to 40).map(i => s"u${d}x$i").mkString(" "))
      } ++ Seq(
        9000L -> (rare + " " + (1 to 40).map(i => s"a$i").mkString(" ")),
        9001L -> (rare + " " + (1 to 40).map(i => s"b$i").mkString(" ")))
    docs.map { case (id, t) => (id, t, "en", s"s${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val capped = rows(Dedup.winnowPairs(spark, dir, bits))
    val uncapped = rows(Dedup.winnowPairs(spark, dir, bits, dfCap = None))

    // uncapped enumerates the boilerplate family pairwise; capped does not
    val cappedPairs = capped.map(r => (r(0), r(1))).toSet
    val uncappedPairs = uncapped.map(r => (r(0), r(1))).toSet
    assert(uncappedPairs.size > cappedPairs.size,
      s"cap must bite: capped=${cappedPairs.size} uncapped=${uncappedPairs.size}")
    assert(cappedPairs.subsetOf(uncappedPairs))
    assert(uncappedPairs.contains((0L, 1L)), "boilerplate pair present uncapped")
    assert(!cappedPairs.contains((0L, 1L)), "boilerplate-only pair dropped capped")

    // the rare pair survives the cap with IDENTICAL counts: none of its
    // shared fingerprints is popular, so capped and uncapped agree on
    // the full row (shared_fps, totals, overlap)
    val rareCapped = capped.filter(r => r(0) == 9000L && r(1) == 9001L)
    val rareUncapped = uncapped.filter(r => r(0) == 9000L && r(1) == 9001L)
    assert(rareCapped.nonEmpty, "rare-run pair must survive the cap")
    assert(rareCapped == rareUncapped)

    // attribution: capped mode still attributes the rare-run docs to
    // each other's source (their shared fps are rare), with the n_fp
    // denominator identical to uncapped (denominator stays honest)
    val attr = Dedup.winnowAttribution(spark, dir, bits).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    val attrUn = Dedup.winnowAttribution(spark, dir, bits, dfCap = None).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(attr.contains(9000L) && attr.contains(9001L))
    assert(attr(9000L)._2 == attrUn(9000L)._2, "n_fp denominator uncapped either way")
  }
}
