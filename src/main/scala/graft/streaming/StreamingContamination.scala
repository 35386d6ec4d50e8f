package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Online benchmark-contamination detection — the streaming counterpart
  * of `Contamination.contamination` (SURVEY §2 E10), with the same
  * scale shape: the BENCHMARK side is small and ships to every executor
  * once (here an explicit broadcast variable of shingle → bench-ids;
  * in batch, a broadcast hash join), the CORPUS streams and is never
  * state-held — a document's verdict is computable entirely from its
  * own row, so the operator is stateless: no watermark latency, no
  * state store, emissions in the same micro-batch the document arrives.
  *
  * Semantics match batch: overlap(doc, bench_doc) = number of distinct
  * word 3-grams shared; a doc is flagged when its worst overlap ≥
  * `minOverlap`, carrying (n_shingles, n_contaminated = Σ overlaps,
  * worst_bench_id, worst_overlap) with the same (overlap, bench_id)
  * lexicographic argmax. Parity with the batch operator is spec-tested
  * on identical input.
  */
object StreamingContamination {
  case class DocRow(doc_id: Long, ts: Timestamp, text: String)
  case class Flagged(doc_id: Long, ts: Timestamp, n_shingles: Int,
      n_contaminated: Long, worst_bench_id: Long, worst_overlap: Long)

  private[streaming] def shingles(text: String): Array[String] = {
    val toks = text.split(" ")
    if (toks.length < 3) Array.empty
    else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      .distinct.toArray
  }

  /** Build the broadcastable benchmark index: shingle → bench doc ids.
    * One Spark job over the static benchmark table (shingle strings as
    * keys — no hash scheme to keep in sync with the batch operator). */
  def benchIndex(bench: DataFrame, idCol: String = "bench_id"): Map[String, Array[Long]] = {
    bench.select(col(idCol).cast("long").as("bench_id"),
        split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("bench_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))
      .groupBy(col("shingle")).agg(collect_list(col("bench_id")).as("ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray.sorted)
      .toMap
  }

  /** Flag contaminated documents in a stream. `bench` is static; docs
    * whose worst benchmark overlap ≥ minOverlap emit immediately. */
  def contaminated(docs: Dataset[DocRow], bench: DataFrame,
      minOverlap: Int = 3): Dataset[Flagged] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchIndex(bench))
    docs.flatMap { d =>
      val sh = shingles(d.text)
      if (sh.isEmpty) Iterator.empty
      else {
        val idx = bc.value
        val perBench = collection.mutable.LongMap.empty[Long]
        sh.foreach { s =>
          idx.get(s) match {
            case Some(ids) => ids.foreach(id => perBench(id) = perBench.getOrElse(id, 0L) + 1L)
            case None =>
          }
        }
        if (perBench.isEmpty) Iterator.empty
        else {
          // lexicographic (overlap, bench_id) argmax — identical to the
          // batch operator's struct-valued MAX
          val (worstId, worstOv) = perBench.toSeq
            .maxBy { case (id, ov) => (ov, id) }
          if (worstOv < minOverlap) Iterator.empty
          else Iterator.single(Flagged(d.doc_id, d.ts, sh.length,
            perBench.values.sum, worstId, worstOv))
        }
      }
    }
  }
}
