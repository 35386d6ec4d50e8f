package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import scala.collection.mutable.ListBuffer

/** Streaming near-duplicate candidate detection — the online counterpart
  * of the batch MinHash/LSH pipeline (MinHashLsh.scala): as documents
  * arrive, each is min-hashed and banded with EXACTLY the batch scheme
  * (same portable md5-lane hashes, same band packing), then routed to
  * its (band_idx, band_hash) cell where a `flatMapGroupsWithState`
  * state machine emits a candidate pair against every document already
  * resident in that cell.
  *
  * State is bounded two ways: per cell, at most `maxPerCell` resident
  * doc ids (a pathological hot band cannot grow state or emit
  * quadratically without bound — overflow docs still PAIR with the
  * residents, they just don't become residents); per time, an
  * event-time timeout drops a cell once the watermark passes its last
  * activity + `horizon`, so an unbounded stream holds a bounded window
  * of candidates. Emitted pairs are candidates in the LSH sense —
  * downstream exact verification (MinHashLsh.verifiedPairs semantics)
  * applies, exactly as in batch.
  */
object StreamingNearDedup {
  case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)
  case class CandidatePair(id_a: Long, id_b: Long, band_idx: Int,
      band_hash: Long, ts: Timestamp)
  case class CellDocs(ids: List[Long], maxTs: Long)
  case class VerifiedPair(id_a: Long, id_b: Long, jaccard: Double, ts: Timestamp)
  case class CellSigs(ids: List[Long], sigs: List[Array[Long]], maxTs: Long)

  /** (doc_id, ts, band_idx, band_hash) — per-document signature + bands
    * in one projection (no aggregation: a stream row IS a whole doc, so
    * each min-hash lane is an array_min over the doc's own shingles).
    * Hash/band arithmetic matches MinHashLsh.signatures/candidatePairs
    * bit-for-bit, so online candidates equal the batch operator's on
    * identical input. */
  def bandedCells(docs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
    val mhs = (1 to numHashes).map(s => expr(
      s"array_min(transform(shingles, x -> CAST(conv(substring(md5(concat('$s:', x)), 1, 12), 16, 10) AS BIGINT)))")
      .as(s"mh$s"))
    val sig = sh.select(col("doc_id") +: col("ts") +: col("shingles") +: mhs: _*)
    // the one shared banding definition — bit-identical to batch
    val bandCols = graft.operators.MinHashLsh.bandColumns(numHashes, bands)
    sig.select(col("doc_id"), col("ts"), col("shingles"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("ts"), col("band.band_idx"),
        col("band.band_hash"), col("shingles"))
  }

  /** Online candidate pairs. `horizon` (ms of event time) bounds how far
    * apart two documents can arrive and still pair. */
  def candidatePairs(docs: Dataset[StreamDoc], numHashes: Int = 4,
      bands: Int = 2, watermarkDelay: String = "1 hour",
      horizonMs: Long = 3600 * 1000L, maxPerCell: Int = 8): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(key: (Int, Long), batch: Iterator[(Long, Timestamp, Int, Long)],
        state: GroupState[CellDocs]): Iterator[CandidatePair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = ListBuffer.empty[CandidatePair]
        var cur = state.getOption.getOrElse(CellDocs(Nil, 0L))
        batch.toSeq.sortBy(d => (d._2.getTime, d._1)).foreach { case (id, ts, bi, bh) =>
          cur.ids.foreach { prev =>
            if (prev != id)
              out += CandidatePair(math.min(prev, id), math.max(prev, id), bi, bh, ts)
          }
          if (cur.ids.size < maxPerCell && !cur.ids.contains(id))
            cur = cur.copy(ids = cur.ids :+ id)
          cur = cur.copy(maxTs = math.max(cur.maxTs, ts.getTime))
        }
        state.update(cur)
        state.setTimeoutTimestamp(
          math.max(cur.maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
        out.iterator
      }
    }

    bandedCells(docs.toDF().withWatermark("ts", watermarkDelay), numHashes, bands)
      .select("doc_id", "ts", "band_idx", "band_hash")
      .as[(Long, Timestamp, Int, Long)]
      .groupByKey(c => (c._3, c._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Online EXACT-VERIFIED near-dup pairs — the streaming analogue of
    * batch `MinHashLsh.verifiedPairs`: cell residents keep their full
    * shingle-hash set in state, so an arriving document's candidates are
    * confirmed by exact Jaccard over the hash sets at arrival time (no
    * second verification pass, no false-positive LSH emissions). Emits
    * one row per (band, pair) that clears `threshold`; distinct
    * (id_a, id_b) downstream if a pair verifying in multiple bands
    * should count once. State grows by one shingle-hash array per
    * resident — still bounded by maxPerCell × shingles/doc and the
    * event-time timeout. */
  def verifiedPairs(docs: Dataset[StreamDoc], threshold: Double,
      numHashes: Int = 4, bands: Int = 2, watermarkDelay: String = "1 hour",
      horizonMs: Long = 3600 * 1000L, maxPerCell: Int = 8): Dataset[VerifiedPair] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(key: (Int, Long),
        batch: Iterator[(Long, Timestamp, Int, Long, Seq[Long])],
        state: GroupState[CellSigs]): Iterator[VerifiedPair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = ListBuffer.empty[VerifiedPair]
        var cur = state.getOption.getOrElse(CellSigs(Nil, Nil, 0L))
        batch.toSeq.sortBy(d => (d._2.getTime, d._1)).foreach {
          case (id, ts, _, _, shingleHashes) =>
            val mine = shingleHashes.toSet
            cur.ids.lazyZip(cur.sigs).foreach { (prev, prevSig) =>
              if (prev != id) {
                val common = prevSig.count(mine.contains)
                val j = common.toDouble / (mine.size + prevSig.length - common)
                if (j >= threshold)
                  out += VerifiedPair(math.min(prev, id), math.max(prev, id), j, ts)
              }
            }
            if (cur.ids.size < maxPerCell && !cur.ids.contains(id))
              cur = cur.copy(ids = cur.ids :+ id, sigs = cur.sigs :+ mine.toArray.sorted)
            cur = cur.copy(maxTs = math.max(cur.maxTs, ts.getTime))
        }
        state.update(cur)
        state.setTimeoutTimestamp(
          math.max(cur.maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
        out.iterator
      }
    }

    bandedCells(docs.toDF().withWatermark("ts", watermarkDelay), numHashes, bands)
      .withColumn("shingle_hashes", expr("transform(shingles, x -> xxhash64(x))"))
      .select(col("doc_id"), col("ts"), col("band_idx"), col("band_hash"),
        col("shingle_hashes"))
      .as[(Long, Timestamp, Int, Long, Seq[Long])]
      .groupByKey(c => (c._3, c._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

}
