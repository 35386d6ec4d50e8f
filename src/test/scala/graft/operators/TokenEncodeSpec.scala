package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The id-encoding + sequence-packing layer must be a lossless,
  * deterministic re-expression of the tokenized corpus: ids decode back
  * to exactly the token streams, the packed stream equals a single-node
  * concatenate-and-slice of the same documents, and none of it depends
  * on partition layout.
  */
class TokenEncodeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .filter(col("doc_id") < 150).select("doc_id", "text").cache()
  private lazy val merges = TokenizerTrain.learnMerges(docs, 10)
  private lazy val vocab = TokenEncode.buildVocab(docs, merges).cache()

  test("buildVocab: specials lead, ids dense, ordered by count then token, layout-independent") {
    val rows = vocab.select("token", "id", "cnt")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(rows(0) === ((TokenEncode.UnkToken, 0L, 0L)))
    assert(rows(1) === ((TokenEncode.EodToken, 1L, 0L)))
    assert(rows.map(_._2).toSeq === rows.indices.map(_.toLong),
      "ids must be dense 0..V-1")
    // corpus tokens: count desc, then token asc — the published
    // frequency-ranked id convention, reproducible anywhere
    val corpus = rows.drop(2)
    assert(corpus === corpus.sortBy { case (t, _, c) => (-c, t) },
      "corpus ids must follow (cnt desc, token) order")
    assert(corpus.map(_._1).toSet ===
      TokenizerTrain.tokenizeWords(docs, merges)
        .select(explode(col("tokens")).as("t")).distinct()
        .as[String].collect().toSet)
    val relaid = TokenEncode.buildVocab(docs.repartition(7), merges)
      .select("token", "id", "cnt").as[(String, Long, Long)].collect().sortBy(_._2)
    assert(relaid.toSeq === rows.toSeq, "vocab ids must not depend on layout")
  }

  test("buildVocab fails loudly on special collisions and duplicate specials") {
    // the (e,e) merge makes "ee" a real corpus token; declaring it a
    // special would make decode ambiguous
    val bad = Seq((1L, "ee ee")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TokenEncode.buildVocab(bad, Seq(("e", "e")), specials = Seq("ee"))
    }
    assert(e.getMessage.contains("collides"))
    val d = intercept[IllegalArgumentException] {
      TokenEncode.buildVocab(bad, Seq.empty, specials = Seq("<a>", "<a>"))
    }
    assert(d.getMessage.contains("duplicate"))
  }

  test("encodeCorpus round-trips: decode(encode(docs)) is exactly tokenizeCorpus") {
    val enc = TokenEncode.encodeCorpus(docs, merges, vocab)
    val dec = TokenEncode.decode(enc, vocab)
      .as[(Long, Seq[String])].collect().toMap
    val ref = TokenizerTrain.tokenizeCorpus(docs, merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(dec.keySet === ref.keySet)
    ref.foreach { case (id, toks) =>
      assert(dec(id) === toks, s"doc $id did not round-trip") }
    // and n_tokens is the id count
    enc.select("doc_id", "ids", "n_tokens").as[(Long, Seq[Long], Long)]
      .collect().foreach { case (id, ids, n) =>
        assert(n === ids.length.toLong, s"doc $id n_tokens mismatch") }
  }

  test("tokens outside the training vocabulary encode to unkId") {
    // vocab learned on `docs`; encode a corpus with characters the
    // training corpus never saw — those symbols have no id
    val alien = Seq((1L, "zzz ßßß"), (2L, "ß zzz")).toDF("doc_id", "text")
    val enc = TokenEncode.encodeCorpus(alien, merges, vocab, unkId = 0L)
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> r._2).toMap
    val known = vocab.select("token").as[String].collect().toSet
    // reference: tokenize the alien corpus the same way, then map
    val refTok = TokenizerTrain.tokenizeCorpus(alien, merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val ids = vocab.select("token", "id").as[(String, Long)].collect().toMap
    refTok.foreach { case (id, toks) =>
      assert(enc(id) === toks.map(t => ids.getOrElse(t, 0L)),
        s"doc $id unk mapping diverged")
      assert(toks.exists(t => !known.contains(t)),
        "test corpus must actually contain unseen tokens")
    }
  }

  test("coverageStats: occurrence-exact OOV gauge, zero on the training corpus") {
    // the corpus the vocab was learned on covers itself completely
    val self = TokenEncode.coverageStats(docs, merges, vocab)
      .as[(Long, Long, Double, Long)].head()
    val totalTokens = TokenizerTrain.tokenizeCorpus(docs, merges)
      .agg(sum("n_tokens")).as[Long].head()
    assert(self === ((totalTokens, 0L, 0.0, 0L)))
    // a corpus with unseen symbols: n_unk must equal the brute-force
    // unk-id count of the actual encoding (specials keep id 0 off every
    // real token, so counting unkId occurrences is exact), n_tokens the
    // tokenized total, and the distinct count the unseen token set
    val alien = Seq((1L, "zzz ßßß"), (2L, "ß zzz the")).toDF("doc_id", "text")
    val got = TokenEncode.coverageStats(alien, merges, vocab)
      .as[(Long, Long, Double, Long)].head()
    val encUnks = TokenEncode.encodeCorpus(alien, merges, vocab, unkId = 0L)
      .select(explode(col("ids")).as("id"))
    val refTotal = encUnks.count()
    val refUnk = encUnks.filter(col("id") === 0L).count()
    assert(refUnk > 0L, "test corpus must actually contain unseen tokens")
    val known = vocab.select("token").as[String].collect().toSet
    val refDistinct = TokenizerTrain.tokenizeCorpus(alien, merges)
      .select(explode(col("tokens")).as("t")).as[String].collect()
      .filterNot(known).distinct.length.toLong
    assert(got === ((refTotal, refUnk, refUnk.toDouble / refTotal, refDistinct)))
  }

  test("packSequences equals the single-node concatenate-and-slice, any layout") {
    val enc = TokenEncode.encodeCorpus(docs, merges, vocab).cache()
    val seqLen = 64
    // single-node reference: docs in doc_id order, each + eod, one
    // global stream, sliced
    val stream = enc.select("doc_id", "ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1).flatMap(_._2 :+ 1L)
    val ref = stream.grouped(seqLen).zipWithIndex
      .map { case (s, i) => i.toLong -> s.toSeq }.toMap
    val got = TokenEncode.packSequences(enc, seqLen)
      .as[(Long, Seq[Long], Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (sid, ids) =>
      assert(got(sid) === ids, s"sequence $sid diverged") }
    // every row is full except possibly the last
    val lastId = ref.keySet.max
    got.foreach { case (sid, ids) =>
      if (sid != lastId) assert(ids.length === seqLen) }
    // layout-independence: a different partitioning packs bit-identically
    val relaid = TokenEncode.packSequences(enc.repartition(7), seqLen,
        numPartitions = 5)
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> r._2).toMap
    assert(relaid === got)
    // dropIncomplete drops exactly the short tail
    val full = TokenEncode.packSequences(enc, seqLen, dropIncomplete = true)
      .as[(Long, Seq[Long], Long)].collect()
    assert(full.forall(_._3 === seqLen.toLong))
    assert(full.length === (if (stream.length % seqLen == 0) ref.size
                            else ref.size - 1))
  }

  test("packSequences splits documents across boundaries token-exactly") {
    // three docs of 5 ids each + eod = 18 tokens; seqLen 7 forces every
    // boundary to fall inside a document
    val enc = Seq(
      (1L, Seq(10L, 11L, 12L, 13L, 14L)),
      (2L, Seq(20L, 21L, 22L, 23L, 24L)),
      (3L, Seq(30L, 31L, 32L, 33L, 34L))
    ).toDF("doc_id", "ids")
    val got = TokenEncode.packSequences(enc, 7, eodId = 99L)
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got(0)._2 === Seq(10L, 11L, 12L, 13L, 14L, 99L, 20L))
    assert(got(1)._2 === Seq(21L, 22L, 23L, 24L, 99L, 30L, 31L))
    assert(got(2)._2 === Seq(32L, 33L, 34L, 99L))
  }

  test("packSequences rejects duplicate document ids by default") {
    // mixtureRepeat epochs share doc_id — tied prefix-sum keys would
    // pack OVERLAPPING sequences, so the operator must refuse loudly
    val enc = Seq((1L, Seq(10L, 11L)), (1L, Seq(12L)), (2L, Seq(13L)))
      .toDF("doc_id", "ids")
    val e = intercept[IllegalArgumentException] {
      TokenEncode.packSequences(enc, 4)
    }
    assert(e.getMessage.contains("duplicate"))
    // unique ids pass the probe, and opting out skips it
    val ok = Seq((1L, Seq(10L, 11L)), (2L, Seq(12L))).toDF("doc_id", "ids")
    assert(TokenEncode.packSequences(ok, 4).count() === 2L)
    assert(TokenEncode.packSequences(ok, 4, requireUniqueIds = false)
      .count() === 2L)
  }

  test("the shuffle-join fallback for huge word tables is bit-identical") {
    val bc = TokenEncode.encodeCorpus(docs, merges, vocab)
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    val sj = TokenEncode.encodeCorpus(docs, merges, vocab,
        broadcastWords = false)
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(sj.toSeq === bc.toSeq)
    val tokBc = TokenizerTrain.tokenizeCorpus(docs, merges)
      .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
    val tokSj = TokenizerTrain.tokenizeCorpus(docs, merges,
        broadcastWords = false)
      .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
    assert(tokSj.toSeq === tokBc.toSeq)
    // and with the hint gone AND auto-broadcast off, the word join
    // really does plan as a shuffle join (the 100 TB path)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val phys = TokenEncode.encodeCorpus(docs, merges, vocab,
        broadcastWords = false).queryExecution.executedPlan.toString
      assert(phys.contains("SortMergeJoin") || phys.contains("ShuffledHashJoin"),
        s"word join did not fall back to a shuffle join:\n$phys")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("no single-partition stage in the encode or pack plans") {
    val enc = TokenEncode.encodeCorpus(docs, merges, vocab)
    val packed = TokenEncode.packSequences(enc, 64)
    Seq(enc, packed).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"single-partition exchange in:\n$plan")
    }
  }
}
