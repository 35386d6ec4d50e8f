package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash+LSH near-duplicate pair generation — the 100 TB-scale path for
  * C2/C3 (the oracle queries verify the signatures; this operator turns
  * them into candidate pairs without ever crossing all documents).
  *
  * Pipeline: shingle → k portable minhashes → b bands of r hashes →
  * explode one row per band → equi-join on (band_idx, band_hash) →
  * distinct candidate pairs → exact Jaccard verification on just the
  * candidates. Shuffle volume is O(docs × b), never O(docs²); band-bucket
  * skew (a band value shared by many docs) is handled by AQE skew-join
  * splitting since the join is a plain equi-join.
  */
object MinHashLsh {
  /** portable 48-bit minhash of an exploded (id, shingle) relation.
    * md5-derived so DuckDB reproduces it bit-for-bit — the ORACLE form;
    * production banding should use [[signaturesFast]]. */
  def signatures(shingled: DataFrame, id: String, numHashes: Int): DataFrame = {
    val mhs = (1 to numHashes).map(s =>
      min(conv(substring(md5(concat(lit(s"$s:"), col("shingle"))), 1, 12), 16, 10).cast("long"))
        .as(s"mh$s"))
    shingled.groupBy(col(id)).agg(mhs.head, mhs.tail: _*)
  }

  /** xxhash64-lane signatures — the cluster-scale variant: same banding
    * quality (uniform 64-bit lanes, seeded per lane), ~an order of
    * magnitude cheaper per shingle than cryptographic md5. Use this for
    * real corpora; [[signatures]] exists for cross-engine oracle checks. */
  def signaturesFast(shingled: DataFrame, id: String, numHashes: Int): DataFrame = {
    val mhs = (1 to numHashes).map(s =>
      min(xxhash64(lit(s), col("shingle"))).as(s"mh$s"))
    shingled.groupBy(col(id)).agg(mhs.head, mhs.tail: _*)
  }

  /** THE banding definition: one struct column per band,
    * (band_idx, band_hash) with band_hash = xxhash64 over the band's
    * minhash lanes (columns `mh1..mhN`). xxhash64, not a*31+c: full-range
    * 64-bit lanes from [[signaturesFast]] overflow a polynomial combine
    * under ANSI mode. Shared by [[candidatePairs]] and the streaming
    * operator's `bandedCells`, so online and batch banding are
    * bit-identical by construction (parity-spec-asserted on the emitted
    * (band_idx, band_hash) sets, not just the pair sets). */
  def bandColumns(numHashes: Int, bands: Int): Seq[Column] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    (0 until bands).map { b =>
      val hs = (1 to r).map(i => col(s"mh${b * r + i}"))
      struct(lit(b).as("band_idx"), xxhash64(hs: _*).as("band_hash"))
    }
  }

  /** candidate pairs via band-bucket equi-join. */
  def candidatePairs(sigs: DataFrame, id: String, numHashes: Int, bands: Int): DataFrame = {
    val bandCols: Seq[Column] = bandColumns(numHashes, bands)
    val exploded = sigs.select(col(id), explode(array(bandCols: _*)).as("band"))
      .select(col(id), col("band.band_idx"), col("band.band_hash"))
    val a = exploded.select(col(id).as("id_a"), col("band_idx"), col("band_hash"))
    val b = exploded.select(col(id).as("id_b"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** exact Jaccard on candidates only. The shingle relation is first
    * semi-joined to the docs that appear in any candidate pair, so the
    * verification join never touches shingles of unpaired documents —
    * without this, verifying 1% of docs would still re-join 100% of the
    * corpus. */
  def verifiedPairs(shingled: DataFrame, id: String, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val candDocs = candidates.select(col("id_a").as(id))
      .union(candidates.select(col("id_b").as(id))).distinct()
    val sh = shingled.join(candDocs, Seq(id), "left_semi")
    val sz = shingled.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val sa = sh.select(col(id).as("id_a"), col("shingle"))
    val sb = sh.select(col(id).as("id_b"), col("shingle"))
    val common = sa.join(sb, Seq("shingle"))
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    common
      .join(sz.select(col(id).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sz.select(col(id).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
