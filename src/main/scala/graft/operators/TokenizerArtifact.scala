package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Generation-directory + `_meta`-swap persistence for MODEL-shaped
  * artifacts (learned tokenizer merges + vocab, n-gram LM count
  * tables) — the IvfIndex commit discipline factored for artifacts
  * whose payload is "a few small parquet tables". This is the
  * reference's own core versioned-materialization idea (models.py:45-62
  * materializes each feature version durably) applied to the two model
  * artifacts the curation pipeline learns.
  *
  * Commit protocol, identical in spirit to the IvfIndex `_meta` swap:
  *  - a save writes its tables under `gen=G/` (invisible to readers),
  *    then commits `_meta` LAST through the knob-governed pointer
  *    protocol ([[BatchedState.writePointer]], r17: rename mode =
  *    temp + atomic replace as before; `spark.graft.commit.mode=
  *    manifest` = create-new numbered manifests, zero renames — the
  *    object-store-safe form). A crashed save leaves only orphan
  *    `gen=` directories that a later save overwrites; readers follow
  *    `_meta` ([[BatchedState.readPointer]] — legacy bare k=v files
  *    still parse, a torn-first-commit manifest dir reads as
  *    never-saved), never the directory listing.
  *  - the PREVIOUS generation survives one further save (the
  *    BatchedState keep-two retention), so a lazy vocab/counts frame
  *    from a handle loaded before a save keeps reading across it.
  *  - writers serialize on the shared atomic create-new lock
  *    ([[BatchedState.tryAcquireLock]] — one implementation with the
  *    FeatureStore/IvfIndex/incremental locks; same filesystem caveats).
  */
private[graft] object ModelStore {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def metaPath(path: String) = new Path(s"$path/_meta")
  def lockPath(path: String) = new Path(s"$path/_lock_write")

  def genDir(path: String, gen: Long, table: String): String =
    s"$path/gen=$gen/$table"

  /** k=v lines committed through the knob-governed pointer protocol
    * ([[BatchedState.writePointer]]) — written LAST, it IS the commit.
    * Rename mode keeps the temp + atomic-replace swap this store
    * always used; under `spark.graft.commit.mode=manifest` the marker
    * becomes a directory of create-new numbered manifests and no
    * rename sits on the commit path (r17: the write-once artifact
    * manifests join the seven live-pointer sites under the one knob). */
  def writeMeta(spark: SparkSession, path: String,
      kv: Seq[(String, String)]): Unit = {
    fs(spark, path).mkdirs(new Path(path)): Unit
    val body = kv.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    BatchedState.writePointer(spark, metaPath(path), body)
  }

  /** The committed marker, or None when the artifact was never saved —
    * which includes a manifest-mode marker directory whose only
    * manifest is torn (a crashed FIRST commit reads as unpublished,
    * the readPointer contract). Legacy bare k=v files parse through. */
  def readMetaOpt(spark: SparkSession,
      path: String): Option[Map[String, String]] =
    BatchedState.readPointer(spark, metaPath(path)).map(parseKv)

  def readMeta(spark: SparkSession, path: String,
      what: String): Map[String, String] =
    readMetaOpt(spark, path).getOrElse(throw new IllegalArgumentException(
      s"requirement failed: no committed $what at $path " +
        "(missing _meta — crashed or absent save)"))

  private def parseKv(text: String): Map[String, String] =
    text.linesIterator.filter(_.contains("=")).map { l =>
      val Array(k, v) = l.split("=", 2); (k, v) }.toMap

  /** Remove the commit marker (decertify). Recursive: in manifest mode
    * the marker is a DIRECTORY of numbered manifests, and leaving a
    * stale complete manifest under it would re-certify the directory
    * the caller is about to overwrite. Routed through
    * [[BatchedState.deletePointer]] so a crashed pointer-migration's
    * stage cannot resurrect the deleted marker (review wave r17). */
  def deleteMeta(spark: SparkSession, path: String): Unit =
    BatchedState.deletePointer(spark, metaPath(path))

  /** A loaded artifact must be the KIND and layout version the reader
    * understands — failing here names the mismatch instead of dying
    * confusingly on a missing table downstream. */
  def checkKind(kv: Map[String, String], path: String, kind: String,
      version: String): Unit = {
    require(kv.getOrElse("kind", "?") == kind,
      s"artifact at $path is kind '${kv.getOrElse("kind", "?")}', " +
        s"this reader needs '$kind'")
    require(kv.getOrElse("version", "?") == version,
      s"$kind artifact at $path is layout version " +
        s"${kv.getOrElse("version", "?")}, this reader needs $version — re-save")
  }

  /** Generation the next save commits: committed gen + 1, or 0 for a
    * fresh path. Called UNDER the writer lock (the read-increment-write
    * is exactly the race the lock exists for). Resolves through
    * readMetaOpt, NOT a raw existence probe (review wave r17): a
    * crashed FIRST manifest-mode commit leaves a `_meta` directory
    * with no complete manifest — exists() is true but nothing is
    * committed, and throwing here would brick every retry save; the
    * retry starts at gen 0 and overwrites the orphan, the documented
    * crash contract. */
  def nextGen(spark: SparkSession, path: String): Long =
    readMetaOpt(spark, path).flatMap(_.get("gen"))
      .map(_.toLong + 1L).getOrElse(0L)

  /** Keep-two retention: drop every generation older than the one just
    * replaced. Best-effort — a failed delete costs disk, never
    * correctness (readers follow `_meta`). */
  def pruneGens(spark: SparkSession, path: String, committed: Long): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) return
    f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("gen=").toLong).toOption
        .map((_, s.getPath)))
      .filter(_._1 < committed - 1L)
      .foreach { case (_, gp) =>
        try f.delete(gp, true) catch { case _: Exception => () } }
  }

  def withLock[T](spark: SparkSession, path: String, what: String)(
      body: => T): T = {
    BatchedState.acquireLock(spark, lockPath(path), what)
    try {
      // commit-mode probe BEFORE the save's heavy work (review wave
      // r17 — the r16-ADVICE shape at the sites the pointer migration
      // touched): without it a knob/marker mode mismatch surfaced only
      // at the final writeMeta, after the full artifact tables were
      // written, and every retry re-paid the save
      BatchedState.assertPointerWritable(spark, metaPath(path))
      body
    } finally BatchedState.releaseLock(spark, lockPath(path))
  }
}

/** The DURABLE form of a learned tokenizer — the ordered merge rules
  * ([[TokenizerTrain.learnMerges]]/`learnMergesLocal`), the frozen id
  * vocabulary ([[TokenEncode.buildVocab]]), and the special tokens —
  * saved once and loaded by ANY later session, so a 100 TB pipeline
  * trains its tokenizer once instead of per-session (the gap the
  * persisted [[IvfIndex]] closed for ANN indexes; same `_meta`
  * atomic-commit convention via [[ModelStore]]).
  *
  * What round-trips, exactly (parity-spec'd on the real documents
  * table from a separate session): `load(path)` returns merges
  * IN TRAINING ORDER (order is the algorithm — applying BPE merges out
  * of order tokenizes differently), the vocab frame with identical
  * (token, id, cnt) rows, and the specials in id order — so
  * tokenize/encode/pack/coverage over the loaded artifact are
  * bit-identical to the in-session results.
  *
  * Scale shape: both tables are vocabulary-sized (KBs–MBs after Zipf;
  * merges are numMerges rows by construction), so the driver-side
  * merge collect on load is bounded exactly like `learnMergesLocal`'s
  * working set — the corpus is never touched by save or load.
  */
object TokenizerArtifact {

  /** A loaded tokenizer: everything [[TokenEncode.encodeCorpus]] /
    * [[TokenizerTrain.tokenizeCorpus]] / [[TokenEncode.packSequences]]
    * need. `vocab` is a lazy frame over the committed generation's
    * parquet (it stays readable across ONE subsequent save — the
    * keep-two retention). */
  final case class Loaded(merges: Seq[(String, String)], vocab: DataFrame,
      specials: Seq[String])

  /** Persist `merges` + `vocab` under `path` atomically. `specials`
    * must be exactly the list `buildVocab` was given — validated
    * against the WRITTEN vocab files (ids 0..k-1; the writeShards
    * read-back convention: a green save certifies the artifact, not
    * the plan). Runs under the shared writer lock — a concurrent save
    * to the same path fails loudly having written nothing visible. */
  def save(spark: SparkSession, path: String, merges: Seq[(String, String)],
      vocab: DataFrame,
      specials: Seq[String] = Seq(TokenEncode.UnkToken, TokenEncode.EodToken))
      : Unit =
    ModelStore.withLock(spark, path, "TokenizerArtifact") {
      val g = ModelStore.nextGen(spark, path)
      import spark.implicits._
      // merges: numMerges rows, rank = training order — tiny, one file
      merges.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "left", "right")
        .repartition(1)
        .write.mode("overwrite").parquet(ModelStore.genDir(path, g, "merges"))
      vocab.select(col("token"), col("id").cast("long").as("id"),
          col("cnt").cast("long").as("cnt"))
        .write.mode("overwrite").parquet(ModelStore.genDir(path, g, "vocab"))
      // validate the specials contract on the files just written (one
      // k-row read), BEFORE the meta swap: a bad save must not commit
      val head = spark.read.parquet(ModelStore.genDir(path, g, "vocab"))
        .filter(col("id") < specials.length)
        .select(col("id"), col("token")).collect().sortBy(_.getLong(0))
      require(head.length == specials.length &&
        head.map(_.getString(1)).toSeq == specials,
        s"vocab ids 0..${specials.length - 1} do not carry the declared " +
          s"specials $specials — pass the same list buildVocab was given")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "tokenizer", "gen" -> g.toString,
        "numMerges" -> merges.length.toString,
        "nSpecials" -> specials.length.toString))
      ModelStore.pruneGens(spark, path, g)
    }

  /** Reopen a committed tokenizer in any session. The merge collect is
    * numMerges rows (driver-bounded by construction); the row count is
    * cross-checked against `_meta` so a torn merges table fails loudly
    * rather than silently tokenizing with a truncated rule list. */
  def load(spark: SparkSession, path: String): Loaded = {
    val kv = ModelStore.readMeta(spark, path, "TokenizerArtifact")
    ModelStore.checkKind(kv, path, "tokenizer", "1")
    val g = kv("gen").toLong
    val merges = spark.read.parquet(ModelStore.genDir(path, g, "merges"))
      .orderBy(col("rank")).select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    require(merges.length.toLong == kv("numMerges").toLong,
      s"merges table holds ${merges.length} rows, _meta claims " +
        s"${kv("numMerges")} — torn artifact, re-save")
    val vocab = spark.read.parquet(ModelStore.genDir(path, g, "vocab"))
    val nSpec = kv("nSpecials").toInt
    val specials = vocab.filter(col("id") < nSpec)
      .select(col("id"), col("token")).collect()
      .sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    require(specials.length == nSpec,
      s"vocab carries ${specials.length} special rows, _meta claims $nSpec")
    Loaded(merges, vocab, specials)
  }
}
