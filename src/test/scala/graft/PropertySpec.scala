package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sinks.{InsertOrUpdate, UpsertConfig}

/** ScalaCheck properties over the upsert merge (SURVEY.md §7.2 step 7):
  * the reference's implicit at-least-once contract — re-applying a batch
  * must converge — plus the column-intersection laws. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling harness (scalatestplus bridge is not on the
    * offline classpath; plain ScalaCheck generators sampled over fixed
    * seeds give the same coverage reproducibly). */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (0 until 25).foreach { i =>
      val a = ga.apply(Gen.Parameters.default, Seed(42L + i)).get
      val b = gb.apply(Gen.Parameters.default, Seed(1000L + i)).get
      body(a, b)
    }

  private val cfg = UpsertConfig(
    clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))

  private val rowsGen: Gen[List[(Int, String)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 15)
      v <- Gen.alphaStr.map(_.take(6))
    } yield (id, v))
  } yield rows

  private def dedupByKey(rows: List[(Int, String)]): List[(Int, String)] =
    rows.groupBy(_._1).map { case (_, vs) => vs.head }.toList

  test("property: upsert is idempotent — merge(merge(t,u),u) == merge(t,u)") {
    forAll(rowsGen, rowsGen) { (t0, u0) =>
      val target = dedupByKey(t0).toDF("id", "value")
      val updates = dedupByKey(u0).toDF("id", "value")
      val once = InsertOrUpdate.merge(target, updates, cfg).target
      val twice = InsertOrUpdate.merge(once, updates, cfg).target
      val a = once.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      val b = twice.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      a shouldBe b
    }
  }

  test("property: merged key set = target keys ∪ update keys; update wins on overlap") {
    forAll(rowsGen, rowsGen) { (t0, u0) =>
      val t = dedupByKey(t0)
      val u = dedupByKey(u0)
      val merged = InsertOrUpdate
        .merge(t.toDF("id", "value"), u.toDF("id", "value"), cfg).target
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
      merged.keySet shouldBe (t.map(_._1).toSet ++ u.map(_._1).toSet)
      val um = u.toMap
      merged.foreach { case (k, v) =>
        if (um.contains(k)) v shouldBe um(k)
        else v shouldBe t.toMap.apply(k)
      }
    }
  }

  test("property: written-rows output = the update batch's effect, errors empty " +
    "when both operations allowed") {
    forAll(rowsGen, rowsGen) { (t0, u0) =>
      val t = dedupByKey(t0)
      val u = dedupByKey(u0)
      val res = InsertOrUpdate.merge(t.toDF("id", "value"), u.toDF("id", "value"), cfg)
      res.written.count() shouldBe u.size.toLong
      res.errors.count() shouldBe 0L
    }
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 12L)
      b <- Gen.choose(0L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  /** Driver-side union-find as the specification for Dedup.clusters. */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = component minimum (root chains always end minimal
    // because unions always point the larger root at the smaller)
    nodes.map(n => n -> find(n)).toMap
  }

  test("property: Dedup.clusters == union-find on random graphs") {
    forAll(edgesGen, Gen.const(())) { (edges, _) =>
      val expected = unionFind(edges)
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else operators.Dedup.clusters(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
      got shouldBe expected
    }
  }

  // Small-vocab corpora so shingle overlaps actually occur; 3–10 tokens so
  // every doc has at least one 3-gram shingle.
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 15)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(3, 10)
      ws <- Gen.listOfN(len,
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: decontaminate removes every in-corpus eval doc and is " +
    "monotone in minOverlap (fewer samples: each run is eager)") {
    (0 until 8).foreach { i =>
      val rows = corpusGen(Gen.Parameters.default, Seed(7L + i)).get
      val corpus = rows.toDF("doc_id", "text")
      val evalSet = corpus.filter(col("doc_id") % 3 === 0)
      def kept(minOverlap: Long) = operators.Dedup
        .decontaminate(corpus, evalSet, "text", "doc_id",
          shingleSize = 3, minOverlap = minOverlap)
        .select("doc_id").as[Long].collect().toSet
      val k1 = kept(1L)
      // every eval doc shares all of its own shingles with itself
      k1.intersect(rows.map(_._1).filter(_ % 3 == 0).toSet) shouldBe Set.empty
      // a stricter overlap requirement can only keep MORE documents
      k1.subsetOf(kept(3L)) shouldBe true
    }
  }

  test("property: token-budget selection never exceeds the budget per " +
    "stratum and is monotone in the budget") {
    val rowGen: Gen[List[(Long, String, Double, Long)]] = for {
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("a", "b", "c")
        score <- Gen.choose(0, 100)
        tok <- Gen.choose(1L, 40L)
      } yield (s, score / 100.0, tok))
    } yield rows.zipWithIndex.map { case ((s, sc, t), i) => (i.toLong, s, sc, t) }
    (0 until 8).foreach { i =>
      val rows = rowGen(Gen.Parameters.default, Seed(99L + i)).get
      val df = rows.toDF("id", "stratum", "score", "n_tokens")
      def sel(budget: Long) = operators.Selection
        .tokenBudgetPerStratum(df, "stratum", "n_tokens", budget,
          rankBy = Seq(col("score").desc, col("id")))
      val s60 = sel(60L)
      s60.groupBy("stratum").agg(sum("n_tokens").as("t"))
        .as[(String, Long)].collect().foreach(_._2 should be <= 60L)
      val ids60 = s60.select("id").as[Long].collect().toSet
      val ids90 = sel(90L).select("id").as[Long].collect().toSet
      ids60.subsetOf(ids90) shouldBe true
    }
  }

  test("property: packSequences == the sequential next-fit reference model " +
    "on random corpora (any shard layout, any token mix incl. 0 and " +
    "oversize)") {
    val rowGen: Gen[List[(Long, Long, Int)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        tok <- Gen.oneOf(Gen.choose(0L, 12L), Gen.choose(30L, 60L)) // incl. oversize
        sh <- Gen.choose(0, 3)
      } yield (tok, sh))
    } yield rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
    def model(rows: List[(Long, Long, Int)], cap: Long): Map[Long, (Int, Long)] =
      rows.groupBy(_._3).flatMap { case (sh, grp) =>
        var seq = 0L; var fill = 0L
        grp.sortBy(_._1).map { case (id, n, _) =>
          if (fill > 0 && fill + n > cap) { seq += 1; fill = 0L }
          fill += n
          id -> (sh, seq)
        }
      }
    (0 until 12).foreach { i =>
      val rows = rowGen(Gen.Parameters.default, Seed(7L + i)).get
      val got = operators.Packing.packSequences(
          rows.toDF("id", "ntok", "shard"), "id", "ntok", 25L, "shard")
        .as[(Long, Int, Long)].collect()
        .map { case (id, sh, seq) => id -> (sh, seq) }.toMap
      got shouldBe model(rows, 25L)
    }
  }

  test("property: sampleStrata == the md5-threshold reference model row " +
    "for row") {
    val rowGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.oneOf("en", "fr", "zh").map(identity))
    } yield rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val rates = Map("en" -> 0.7, "fr" -> 0.2)
    def md5hex8(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    def model(rows: List[(Long, String)]): Set[Long] = rows.collect {
      case (id, s) if md5hex8(id.toString) <
        f"${(rates.getOrElse(s, 0.4) * 4294967296.0).toLong}%08x" => id
    }.toSet
    (0 until 12).foreach { i =>
      val rows = rowGen(Gen.Parameters.default, Seed(31L + i)).get
      val got = operators.Selection.sampleStrata(
          rows.toDF("id", "g"), "g", "id", rates, defaultRate = 0.4)
        .select("id").as[Long].collect().toSet
      got shouldBe model(rows)
    }
  }

  test("property: BPE encoding is LOSSLESS under ARBITRARY merge tables " +
    "(chained, overlapping, duplicate pairs — not just the disjoint " +
    "closed-form regime), and never exceeds the character count") {
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 6)
      words <- Gen.listOfN(n, Gen.listOfN(5, Gen.oneOf('a', 'b', 'c'))
        .map(_.mkString))
    } yield words.mkString(" ")
    // pairs over a 3-letter alphabet plus CHAINED symbols (merged tokens
    // as left sides) — the regime where greedy rank-priority order matters
    val mergesGen: Gen[Seq[(String, String)]] = for {
      m <- Gen.choose(0, 6)
      ms <- Gen.listOfN(m, for {
        l <- Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "aa")
        r <- Gen.oneOf("a", "b", "c")
      } yield (l, r))
    } yield ms
    forAll(textGen, mergesGen) { (text, merges) =>
      val out = Seq(text).toDF("t")
        .select(operators.Bpe.encode(col("t"), merges).as("toks"))
        .as[Seq[String]].head()
      val chars = text.replaceAll("\\s+", "")
      withClue(s"text='$text' merges=$merges: ") {
        out.mkString("") shouldBe chars // lossless for ANY table
        out.length should be <= chars.length
        out.foreach(_ should not be empty)
      }
    }
  }

  test("property: BYTE-LEVEL BPE is lossless over arbitrary Unicode — " +
    "including non-BMP surrogate-pair text the char mode would split — " +
    "for arbitrary merge tables over byte symbols") {
    def bc(i: Int): String = String.valueOf(i.toChar) // byte-symbol literal
    val wordGen: Gen[String] = Gen.listOfN(4, Gen.oneOf(
      Gen.oneOf('a', 'é', '中', 'ß').map(_.toString),
      Gen.oneOf("😀", "🤖", "𝔘"))) // non-BMP: emoji, math
      .map(_.mkString)
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 4)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    // merges over the UTF-8 lead/continuation bytes those chars produce,
    // plus chained two-byte symbols — crossing character boundaries on
    // purpose (byte-level merges may and do)
    val byteGen = Gen.oneOf(
      Seq(0x61, 0x9f, 0xc3, 0xa9, 0xe4, 0xb8, 0xad, 0xf0, 0x98, 0x80)
        .map(bc) ++ Seq(bc(0xf0) + bc(0x9f), bc(0xc3) + bc(0xa9)))
    val mergesGen: Gen[Seq[(String, String)]] = for {
      m <- Gen.choose(0, 6)
      ms <- Gen.listOfN(m, Gen.zip(byteGen, byteGen))
    } yield ms
    forAll(textGen, mergesGen) { (text, merges) =>
      val out = Seq(text).toDF("t")
        .select(operators.Bpe.encode(col("t"), merges, byteLevel = true)
          .as("toks"))
        .as[Seq[String]].head()
      // expected: each word's UTF-8 bytes as Latin-1 chars, concatenated
      val expected = text.trim.split("\\s+").filter(_.nonEmpty).map { w =>
        new String(w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => (b & 0xff).toChar))
      }.mkString
      withClue(s"text='$text' merges=$merges: ") {
        out.mkString("") shouldBe expected
        // and the byte→char mapping inverts to the ORIGINAL utf-8 text
        new String(out.mkString("").toCharArray.map(_.toByte),
          java.nio.charset.StandardCharsets.UTF_8) shouldBe
          text.trim.split("\\s+").filter(_.nonEmpty).mkString
      }
    }
  }
}
