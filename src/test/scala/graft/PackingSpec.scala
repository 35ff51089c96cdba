package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Packing

/** Sequence-packing layout semantics: boundary straddling, per-shard
  * contiguity, zero-token docs, and the bad-input guard. */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("docs straddle sequence boundaries exactly (single shard)") {
    import spark.implicits._
    val df = Seq((1L, 3000L), (2L, 2000L), (3L, 4096L), (4L, 1L))
      .toDF("id", "t")
    val out = Packing.packedLayout(df, "id", "t", budget = 4096L,
      shards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),    // [0, 3000)
      (2L, 0L, 1L, 3000L), // [3000, 5000) spans seqs 0-1
      (3L, 1L, 2L, 904L),  // [5000, 9096) spans seqs 1-2
      (4L, 2L, 2L, 904L))) // [9096, 9097)
  }

  test("per-shard layout is contiguous and reconstructible") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0L until 500L).map(i => (i, 1L + rnd.nextInt(2000).toLong))
      .toDF("id", "t")
    val rows = Packing.packedLayout(df, "id", "t", budget = 1024L,
      shards = 4)
      .join(df, "id")
      .select("id", "shard", "seq_first", "seq_offset", "t")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var before = 0L
      docs.sortBy(_._2).foreach { case (_, _, seqFirst, offset, t) =>
        assert(seqFirst == before / 1024L)
        assert(offset == before % 1024L)
        before += t
      }
    }
  }

  test("determinism: identical layout across recomputation") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i % 37) * 13 + 1)).toDF("id", "t")
    def layout() = Packing.packedLayout(df, "id", "t", 512L, shards = 4)
      .collect().map(_.toSeq).toSet
    assert(layout() == layout())
  }

  test("null or negative token counts raise") {
    val df = sources.Ingest.localData(spark, Seq("id", "t"),
      Seq(Seq(1L, 5L), Seq(2L, null)))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val e = intercept[Exception] {
      Packing.packedLayout(df, "id", "t", 128L, shards = 1).collect()
    }
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("bad token count")))
    intercept[IllegalArgumentException] {
      Packing.packedLayout(df, "id", "t", 0L)
    }
  }

  test("binLayout: no doc crosses a boundary, bins are dense per shard, " +
      "offsets reconstruct the next-fit fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0L until 400L).map(i => (i, 1L + rnd.nextInt(900).toLong))
      .toDF("id", "t")
    for ((dec, bf) <- Seq((false, false), (true, false), (true, true))) {
      val rows = Packing.binLayout(df, "id", "t", budget = 1024L,
        shards = 4, decreasing = dec, bestFit = bf)
        .join(df, "id")
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("id"),
          r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"),
          r.getAs[Long]("t")))
      assert(rows.length == 400)
      rows.groupBy(_._1).foreach { case (_, docs) =>
        // every doc fits its bin whole
        docs.foreach { case (_, id, _, off, t) =>
          assert(off + t <= 1024L, s"doc $id crosses its bin") }
        // bins dense 0..max
        val bins = docs.map(_._3).distinct.sorted
        assert(bins.toSeq == (0L to bins.max))
        // within a bin, offsets are the running sum of sizes in the
        // policy order — the fold replays exactly
        docs.groupBy(_._3).foreach { case (_, inBin) =>
          val ordered =
            if (dec) inBin.sortBy(d => (-d._5, d._2)) else inBin.sortBy(_._2)
          val cum = ordered.map(_._5).scanLeft(0L)(_ + _)
          assert(ordered.map(_._4).toSeq == cum.init.toSeq)
        }
      }
    }
  }

  test("binLayout: best-fit-decreasing fills at least as well as arrival " +
      "next-fit on a skewed corpus; oversize docs raise with the value") {
    import spark.implicits._
    // alternating big/small sizes: arrival-order next-fit closes a bin
    // at 800/1024 every pair; BFD backfills each 600-bin with two 200s.
    // (Plain next-fit-DECREASING is famously WORSE here — 600s first
    // strand 424 in every bin — which is exactly why the placement
    // axis exists.)
    val df = (0L until 300L).map(i =>
      (i, if (i % 2 == 0) 600L else 200L)).toDF("id", "t")
    def bins(dec: Boolean, bf: Boolean) = Packing.binLayout(df, "id", "t",
      budget = 1024L, shards = 1, decreasing = dec, bestFit = bf)
      .agg(org.apache.spark.sql.functions.max("bin")).head.getLong(0) + 1
    assert(bins(dec = true, bf = true) <= bins(dec = false, bf = false))
    // and strictly better than next-fit-decreasing on this corpus
    assert(bins(dec = true, bf = true) < bins(dec = true, bf = false))
    val over = Seq((1L, 2000L)).toDF("id", "t")
    val e = intercept[Exception] {
      Packing.binLayout(over, "id", "t", budget = 1024L, shards = 1)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => String.valueOf(c.getMessage)
      .contains("2000")), e.getMessage)
    // a ZERO-token document raises too: best-fit would hand it a full
    // bin's remainder-0 slot and emit bin_offset == budget — a
    // doc_starts entry outside [0, budget)
    val zero = Seq((1L, 100L), (2L, 0L)).toDF("id", "t")
    val ez = intercept[Exception] {
      Packing.binLayout(zero, "id", "t", budget = 1024L, shards = 1,
        bestFit = true).collect()
    }
    assert(causes(ez).exists(c => String.valueOf(c.getMessage)
      .contains("outside [1")), ez.getMessage)
  }

  test("positionIds: resets at sequence start and every doc_start, " +
      "zeros in padding") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc_starts [3, 7], 10 live tokens of budget 12:
    // continuation 0,1,2 | doc at 3: 0,1,2,3 | doc at 7: 0,1,2 | pad 0,0
    val df = Seq((Seq(3, 7), 10L)).toDF("ds", "nt")
    val got = df.select(Packing.positionIds(col("ds"), col("nt"), 12L)
      .as("p")).head().getSeq[Int](0)
    assert(got.toList === List(0, 1, 2, 0, 1, 2, 3, 0, 1, 2, 0, 0))
    // a doc_start AT 0 (new doc heads the sequence) must not
    // double-reset; empty starts = one continuation segment
    val df2 = Seq((Seq(0, 4), 6L), (Seq.empty[Int], 3L))
      .toDF("ds", "nt")
    val got2 = df2.select(Packing.positionIds(col("ds"), col("nt"), 6L)
      .as("p")).collect().map(_.getSeq[Int](0).toList)
    assert(got2(0) === List(0, 1, 2, 3, 0, 1))
    assert(got2(1) === List(0, 1, 2, 0, 0, 0))
    intercept[IllegalArgumentException](
      Packing.positionIds(col("ds"), col("nt"), 0L))
  }

  test("lengthBatches: batches are length-sorted fixed-row-count, " +
      "pad_waste is vs the batch max, guards raise") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq.tabulate(10)(i => (i.toLong, (10 - i).toLong * 3))
      .toDF("id", "t")
    val out = Packing.lengthBatches(docs, "id", "t", 4)
      .orderBy("batch", "batch_pos").collect()
    // total order (t ASC, id ASC): ids 9,8,...,0 by ascending t
    assert(out.map(_.getAs[Long]("id")).toSeq ===
      (9L to 0L by -1L).toSeq)
    assert(out.map(_.getAs[Long]("batch")).toSeq ===
      Seq(0L,0L,0L,0L, 1L,1L,1L,1L, 2L,2L))
    // within a batch, pad_waste = batch_max - t and the max row has 0
    out.groupBy(_.getAs[Long]("batch")).foreach { case (_, rows) =>
      val mx = rows.map(_.getAs[Long]("t")).max
      rows.foreach { r =>
        assert(r.getAs[Long]("batch_max") == mx)
        assert(r.getAs[Long]("pad_waste") == mx - r.getAs[Long]("t"))
      }
      assert(rows.exists(_.getAs[Long]("pad_waste") == 0L))
    }
    // partitioning invariance
    val out11 = Packing.lengthBatches(docs.repartition(7), "id", "t", 4)
      .orderBy("batch", "batch_pos").collect()
    assert(out11.map(_.getAs[Long]("id")).toSeq ===
      out.map(_.getAs[Long]("id")).toSeq)
    // guards: bad count raises in-plan, reserved name rejected
    val e = intercept[Exception] {
      Packing.lengthBatches(Seq((1L, -5L)).toDF("id", "t"), "id", "t", 4)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => String.valueOf(c.getMessage)
      .contains("bad token count")))
    intercept[IllegalArgumentException](
      Packing.lengthBatches(docs.withColumn("batch", lit(1)), "id", "t", 4))
    intercept[IllegalArgumentException](
      Packing.lengthBatches(docs, "id", "t", 0))
  }

  test("emitAligned: sequences are budget-length, ids concatenate in " +
      "placement order, n_tokens marks the pad boundary; an " +
      "overflowing bin raises naming (shard, bin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val docs = (0L until 120L).map { i =>
      val ids = Array.fill(20 + rnd.nextInt(200))(rnd.nextInt(1000))
      (i, ids)
    }.toDF("id", "ids").withColumn("n", size(col("ids")))
    val layout = Packing.binLayout(docs, "id", "n", budget = 512L,
      shards = 2, decreasing = true, bestFit = true)
    val emitted = Packing.emitAligned(layout.join(docs, "id"), "ids",
      512L, padId = -1)
    val rows = emitted.collect()
    val idsByDoc = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val placement = layout.join(docs, "id").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("bin_offset"), r.getAs[Long]("id")))
    rows.foreach { r =>
      val (sh, bin) = (r.getAs[Long]("shard"), r.getAs[Long]("bin"))
      val ids = r.getSeq[Int](r.fieldIndex("input_ids"))
      val nTok = r.getAs[Int]("n_tokens")
      assert(ids.length == 512, "padded to the budget exactly")
      assert(ids.drop(nTok).forall(_ == -1), "pad after the boundary")
      assert(ids.take(nTok).forall(_ != -1), "no pad before it")
      // placement-order concatenation reconstructs exactly
      val expect = placement.filter(p => p._1 == sh && p._2 == bin)
        .sortBy(_._3).flatMap(p => idsByDoc(p._4)).toSeq
      assert(ids.take(nTok) == expect, s"shard $sh bin $bin")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 120)
    // layout/ids drift raises in-plan with the bin named
    val drifted = layout.join(
      docs.withColumn("ids", concat(col("ids"), col("ids"))), "id")
    val e = intercept[Exception] {
      Packing.emitAligned(drifted, "ids", 512L).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => String.valueOf(c.getMessage)
      .contains("out of sync")), e.getMessage)
  }

  test("emitPacked: sequences are full except each shard's tail, the " +
      "shard's concatenation reconstructs the id-ordered corpus, and " +
      "doc_starts mark exactly the new-document heads") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9)
    val docs = (0L until 80L).map { i =>
      (i, Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(1000)))
    }.toDF("id", "ids").withColumn("n", size(col("ids")))
    val layout = Packing.packedLayout(docs, "id", "n", budget = 256L,
      shards = 2)
    val emitted = Packing.emitPacked(layout.join(docs, "id"), "ids",
      256L, padId = -1).collect()
    val idsByDoc = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val shardOf = layout.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    emitted.groupBy(_.getAs[Long]("shard")).foreach { case (sh, seqs) =>
      val ordered = seqs.sortBy(_.getAs[Long]("seq"))
      // dense seq numbering, full except the tail
      assert(ordered.map(_.getAs[Long]("seq")).toSeq ==
        (0L until ordered.length))
      ordered.init.foreach(r =>
        assert(r.getAs[Int]("n_tokens") == 256, "non-tail must be full"))
      // shard concatenation == id-ordered doc concatenation
      val got = ordered.flatMap(r =>
        r.getSeq[Int](r.fieldIndex("input_ids"))
          .take(r.getAs[Int]("n_tokens")))
      val expect = shardOf.toSeq.filter(_._2 == sh).map(_._1).sorted
        .flatMap(idsByDoc)
      assert(got.toSeq == expect, s"shard $sh stream")
      // pad only after the boundary, and only with padId
      ordered.foreach { r =>
        val ids = r.getSeq[Int](r.fieldIndex("input_ids"))
        assert(ids.length == 256)
        assert(ids.drop(r.getAs[Int]("n_tokens")).forall(_ == -1))
      }
      // every document's head appears as exactly one doc_start
      val starts = ordered.map(r =>
        r.getSeq[Long](r.fieldIndex("doc_starts")).length).sum
      assert(starts == shardOf.count(_._2 == sh),
        s"shard $sh doc_starts count")
      ordered.foreach(r =>
        r.getSeq[Long](r.fieldIndex("doc_starts")).foreach(o =>
          assert(o >= 0 && o < 256)))
    }
  }

  test("positionIdsExact: a continuation's first position equals its " +
      "true in-document offset; exact == approximate wherever a doc " +
      "starts the sequence; padding stays 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val docs = (0L until 60L).map { i =>
      (i, Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(1000)))
    }.toDF("id", "ids").withColumn("n", size(col("ids")))
    val layout = Packing.packedLayout(docs, "id", "n", budget = 128L,
      shards = 2)
    val emitted = Packing.emitPacked(layout.join(docs, "id"), "ids",
      128L, padId = 0)
    val rows = emitted.select(col("shard"), col("seq"), col("n_tokens"),
      col("doc_starts"), col("first_doc_offset"),
      Packing.positionIdsExact(col("doc_starts"),
        col("first_doc_offset"), col("n_tokens"), 128L).as("exact"),
      Packing.positionIds(col("doc_starts"), col("n_tokens"), 128L)
        .as("approx")).collect()
    // the fixture must actually exercise spanning continuations
    assert(rows.exists(_.getAs[Long]("first_doc_offset") > 0L),
      "fixture produced no mid-document continuation")
    rows.foreach { r =>
      val nTok = r.getAs[Int]("n_tokens")
      val starts = r.getSeq[Long](r.fieldIndex("doc_starts"))
      val fdo = r.getAs[Long]("first_doc_offset")
      val exact = r.getSeq[Int](r.fieldIndex("exact"))
      val approx = r.getSeq[Int](r.fieldIndex("approx"))
      // a sequence beginning a fresh doc has offset 0 and exact ==
      // approximate everywhere; a continuation shifts ONLY the leading
      // segment by fdo
      if (starts.headOption.contains(0L)) assert(fdo == 0L)
      val firstStart =
        starts.headOption.map(_.toInt).getOrElse(nTok)
      exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
        if (i >= nTok) assert(e == 0 && a == 0)
        else if (i < firstStart) assert(e == a + fdo,
          s"leading segment cell $i: exact $e vs approx $a + fdo $fdo")
        else assert(e == a, s"cell $i diverged with no continuation")
      }
      // the continuation's first position IS its in-document offset
      if (nTok > 0) assert(exact.head == fdo)
    }
    // cross-sequence coherence: within a shard, a spanning document's
    // positions continue across the boundary (…, k, k+1 | k+2, …)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, seqs) =>
      val ordered = seqs.sortBy(_.getAs[Long]("seq"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val fdoB = b.getAs[Long]("first_doc_offset")
          if (fdoB > 0) {
            // the previous sequence's LAST in-doc position + 1 == fdoB
            val aTok = a.getAs[Int]("n_tokens")
            val lastPos = a.getSeq[Int](a.fieldIndex("exact"))(aTok - 1)
            assert(lastPos + 1 == fdoB,
              s"positions break across the boundary: $lastPos → $fdoB")
          }
        case _ =>
      }
    }
  }
}
