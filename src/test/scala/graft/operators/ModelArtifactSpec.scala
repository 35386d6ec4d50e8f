package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two model-shaped artifacts (tokenizer merges+vocab, n-gram LM
  * count tables) must be DURABLE the way features (manifest) and ANN
  * indexes (`_meta`) are: a save commits atomically behind `_meta`, a
  * load in a separate session reproduces the in-session results
  * bit-identically, writers serialize on the shared lock, and retention
  * keeps exactly the committed + previous generation. */
class ModelArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("modelart").resolve("art").toString

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 120).select("doc_id", "text").cache()

  test("tokenizer: load in a separate session reproduces merges, vocab, specials, and the full encode bit-identically") {
    val merges = TokenizerTrain.learnMergesLocal(docs, 24)
    assert(merges.nonEmpty)
    val vocab = TokenEncode.buildVocab(docs, merges).localCheckpoint(true)
    val inSession = TokenEncode.encodeCorpus(docs, merges, vocab)
      .select("doc_id", "ids").as[(Long, Seq[Long])].collect().sortBy(_._1)

    val path = tmpPath()
    TokenizerArtifact.save(spark, path, merges, vocab)
    val s2 = spark.newSession()
    val loaded = TokenizerArtifact.load(s2, path)
    assert(loaded.merges === merges, "merge rules must round-trip IN ORDER")
    assert(loaded.specials === Seq(TokenEncode.UnkToken, TokenEncode.EodToken))
    val vocabRows = vocab.select(col("token"), col("id").cast("long"),
      col("cnt").cast("long")).as[(String, Long, Long)].collect().sortBy(_._2)
    val loadedRows = loaded.vocab.select(col("token"), col("id").cast("long"),
        col("cnt").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    assert(loadedRows.toSeq === vocabRows.toSeq)
    // the artifact drives the whole encode identically from the other
    // session — the thing a per-session retrain could silently break
    val docs2 = Tables.documents(s2, sf)
      .filter(col("doc_id") < 120).select("doc_id", "text")
    val fresh = TokenEncode.encodeCorpus(docs2, loaded.merges, loaded.vocab)
      .select("doc_id", "ids")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(fresh.map { case (i, s) => (i, s.toSeq) }.toSeq ===
      inSession.map { case (i, s) => (i, s.toSeq) }.toSeq)
  }

  test("tokenizer: a save is atomic behind _meta — re-save bumps the generation, keep-two retention holds, prior lazy frames survive one save") {
    val m1 = TokenizerTrain.learnMergesLocal(docs, 8)
    val m2 = TokenizerTrain.learnMergesLocal(docs, 16)
    val v1 = TokenEncode.buildVocab(docs, m1).localCheckpoint(true)
    val v2 = TokenEncode.buildVocab(docs, m2).localCheckpoint(true)
    val path = tmpPath()
    TokenizerArtifact.save(spark, path, m1, v1)
    val gen0 = TokenizerArtifact.load(spark, path)
    assert(gen0.merges === m1)
    val gen0VocabCount = gen0.vocab.count()

    TokenizerArtifact.save(spark, path, m2, v2)
    assert(TokenizerArtifact.load(spark, path).merges === m2,
      "load must follow _meta to the newest generation")
    // the pre-save handle's lazy vocab frame still reads (keep-two)
    assert(gen0.vocab.count() === gen0VocabCount)

    // a third save prunes gen=0 but keeps gen=1 (the just-replaced one)
    TokenizerArtifact.save(spark, path, m1, v1)
    val gens = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("gen=")).map(_.getName).sorted
    assert(gens.toSeq === Seq("gen=1", "gen=2"),
      s"keep-two retention violated: ${gens.mkString(", ")}")
  }

  test("tokenizer: writers serialize — a held lock fails a save loudly with nothing committed; a two-writer race never tears the artifact") {
    val merges = TokenizerTrain.learnMergesLocal(docs, 8)
    val vocab = TokenEncode.buildVocab(docs, merges).localCheckpoint(true)
    val path = tmpPath()
    val lock = java.nio.file.Paths.get(path, "_lock_write")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalStateException] {
      TokenizerArtifact.save(spark, path, merges, vocab)
    }
    assert(e.getMessage.contains("_lock_write"))
    intercept[IllegalArgumentException] { TokenizerArtifact.load(spark, path) }
    java.nio.file.Files.delete(lock)

    // two concurrent saves: losers fail loudly on the lock; every
    // winner commits a complete readable artifact (never a torn one)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(
      Future(scala.util.Try(TokenizerArtifact.save(spark, path, merges, vocab))),
      Future(scala.util.Try(TokenizerArtifact.save(spark, path, merges, vocab))))),
      300.seconds)
    val wins = results.count(_.isSuccess)
    assert(wins >= 1, s"at least one save must win: $results")
    results.filter(_.isFailure).foreach(l => assert(
      l.failed.get.isInstanceOf[IllegalStateException], s"unexpected: $l"))
    val loaded = TokenizerArtifact.load(spark, path)
    assert(loaded.merges === merges)
    assert(loaded.vocab.count() > 0)
    assert(!java.nio.file.Files.exists(lock), "every save must release the lock")
  }

  test("tokenizer: save validates the specials contract against the written files and does not commit a bad artifact") {
    val merges = TokenizerTrain.learnMergesLocal(docs, 8)
    val vocab = TokenEncode.buildVocab(docs, merges).localCheckpoint(true)
    val path = tmpPath()
    val e = intercept[IllegalArgumentException] {
      TokenizerArtifact.save(spark, path, merges, vocab,
        specials = Seq("<bos>", "<eos>")) // not what buildVocab was given
    }
    assert(e.getMessage.contains("specials"))
    intercept[IllegalArgumentException] { TokenizerArtifact.load(spark, path) }
  }

  test("ngram lm: score over load(path) in a separate session is bit-identical to the in-session model") {
    val model = NgramLm.train(docs, 3).localCheckpoint(true)
    val inSession = NgramLm.score(docs, model)
      .select("doc_id", "log_prob", "ppl")
      .as[(Long, Double, Double)].collect().sortBy(_._1)

    val path = tmpPath()
    NgramLm.save(model, path)
    val s2 = spark.newSession()
    val loaded = NgramLm.load(s2, path)
    val docs2 = Tables.documents(s2, sf)
      .filter(col("doc_id") < 120).select("doc_id", "text")
    val fresh = NgramLm.score(docs2, loaded)
      .select("doc_id", "log_prob", "ppl")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(fresh.toSeq === inSession.toSeq)
    // the meta row carries order + total — the load-side probe reads
    // small parquet, never re-running train
    val kv = ModelStore.readMeta(s2, path, "NgramLm model")
    assert(kv("order") === "3")
    assert(kv("total").toLong ===
      model.filter(col("n") === 0).select("cnt").as[Long].head())
  }

  test("ngram lm: a non-model frame fails the save before the meta swap; kind/version mismatches fail loads loudly") {
    val path = tmpPath()
    val e = intercept[IllegalArgumentException] {
      NgramLm.save(Seq((1, "x", 2L)).toDF("n", "gram", "cnt")
        .filter(col("n") > 0), path) // no n=0 total row
    }
    assert(e.getMessage.contains("total-tokens"))
    intercept[IllegalArgumentException] { NgramLm.load(spark, path) }

    // a tokenizer artifact is not an LM — the kind check names it
    val merges = TokenizerTrain.learnMergesLocal(docs, 8)
    val vocab = TokenEncode.buildVocab(docs, merges).localCheckpoint(true)
    val tokPath = tmpPath()
    TokenizerArtifact.save(spark, tokPath, merges, vocab)
    val k = intercept[IllegalArgumentException] { NgramLm.load(spark, tokPath) }
    assert(k.getMessage.contains("kind"))
    val k2 = intercept[IllegalArgumentException] {
      TokenizerArtifact.load(spark, tmpPath())
    }
    assert(k2.getMessage.contains("_meta"))
  }
}
