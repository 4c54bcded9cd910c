package graft

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.formats.TarShards

/** WebDataset-style tar-shard I/O: entry/sample semantics, binary
  * fidelity, adjacency grouping, and the adversarial-input caps.
  */
class TarShardsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory("graft-tar").toString

  private def writeRawTar(path: String,
                          entries: Seq[(String, Array[Byte])]): Unit = {
    val out = new TarArchiveOutputStream(
      new java.io.FileOutputStream(path))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
  }

  test("samples: adjacency grouping, multi-field, binary-exact; a " +
      "duplicate field within a sample refuses loudly") {
    val dir = tmpDir()
    val img = Array[Byte](0, -1, 127, -128, 42) // non-UTF8 bytes
    writeRawTar(s"$dir/shard-00000.tar", Seq(
      "000.jpg" -> img,
      "000.txt" -> "hello".getBytes("UTF-8"),
      "000.cls.json" -> """{"y":1}""".getBytes("UTF-8"),
      "001.txt" -> "world".getBytes("UTF-8")))
    val got = TarShards.samples(spark, s"$dir/*.tar")
      .orderBy("key")
      .select($"key", $"fields")
      .as[(String, Map[String, Array[Byte]])].collect()
    assert(got.length == 2)
    assert(got(0)._1 == "000" &&
      got(0)._2.keySet == Set("jpg", "txt", "cls.json"))
    assert(got(0)._2("jpg").toSeq == img.toSeq) // byte-exact
    assert(new String(got(0)._2("txt"), "UTF-8") == "hello")
    assert(got(1)._1 == "001" &&
      new String(got(1)._2("txt"), "UTF-8") == "world")

    val dup = tmpDir()
    writeRawTar(s"$dup/shard-00000.tar", Seq(
      "7.txt" -> "a".getBytes, "7.txt" -> "b".getBytes))
    val e = intercept[Exception] {
      TarShards.samples(spark, s"$dup/*.tar").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate field"))
  }

  test("entries: directory entries skip; an entry DECLARING a size " +
      "beyond the cap refuses before allocation; a truncated " +
      "archive names the shard") {
    val dir = tmpDir()
    writeRawTar(s"$dir/shard-00000.tar",
      Seq("a.txt" -> "x".getBytes))
    assert(TarShards.entries(spark, s"$dir/*.tar").count() == 1)
    // cap refusal: the declared size alone must trip it
    val e = intercept[Exception] {
      TarShards.entries(spark, s"$dir/*.tar", maxEntryBytes = 0)
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("cap"))
    // truncated shard: cut a tar mid-entry-DATA (the header is one
    // full 512 B block; a 1000 B entry cut at 600 leaves a complete
    // header whose declared content is missing — the shape a partial
    // object-store download produces)
    val big = tmpDir()
    writeRawTar(s"$big/shard-00000.tar",
      Seq("big.bin" -> Array.fill[Byte](1000)(7)))
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$big/shard-00000.tar"))
    val cut = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$cut/shard-00000.tar"),
      java.util.Arrays.copyOf(full, 600))
    val e2 = intercept[Exception] {
      TarShards.entries(spark, s"$cut/*.tar").collect()
    }
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs2.contains("corrupt tar shard") ||
      msgs2.contains("shard-00000.tar"))
  }

  test("tar shards compose with the multimodal decode path: PNG " +
      "bytes written into shards decode back with exact dims and " +
      "pixel stats") {
    import graft.operators.Multimodal
    val src = spark.range(4).select($"id",
      concat(lit("caption "), $"id").as("txt"),
      Multimodal.encodeTestImage(lit("png"),
        (lit(8) + $"id").cast("int"), lit(6),
        (lit(40) + $"id" * 10).cast("int")).as("img"))
    val dir = tmpDir() + "/wds"
    TarShards.write(src, "id", Seq("txt" -> "txt", "png" -> "img"),
      dir)
    val decoded = Multimodal.decodeImagePartitions(
      TarShards.samples(spark, s"$dir/*.tar")
        .select($"key".cast("long").as("id"),
          element_at($"fields", "png").as("blob")),
      "blob", "id")
      .orderBy("id")
      .select($"id", $"format", $"width", $"height")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(decoded == (0L until 4L).map(i =>
      (i, "png", 8 + i.toInt, 6)))
  }

  test("samplesStream: new shard files arrive as sample rows, each " +
      "shard processed exactly once") {
    val dir = tmpDir()
    writeRawTar(s"$dir/shard-00000.tar", Seq(
      "0.txt" -> "a".getBytes, "1.txt" -> "b".getBytes))
    val q = TarShards.samplesStream(spark, dir)
      .selectExpr("key", "cast(fields['txt'] as string) AS txt")
      .writeStream.outputMode("append").format("memory")
      .queryName("tar_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tar_stream_out").orderBy("key")
        .as[(String, String)].collect().toSeq ==
        Seq("0" -> "a", "1" -> "b"))
      // a SECOND shard lands mid-stream: only its samples append
      writeRawTar(s"$dir/shard-00001.tar",
        Seq("2.txt" -> "c".getBytes))
      q.processAllAvailable()
      assert(spark.table("tar_stream_out").orderBy("key")
        .as[(String, String)].collect().toSeq ==
        Seq("0" -> "a", "1" -> "b", "2" -> "c"))
    } finally q.stop()
  }

  test("write: one shard per partition, null fields skip their " +
      "entry, round trip is identity on mixed binary/text fields") {
    val df = Seq(
      (1L, "alpha", Some(Array[Byte](1, 2, 3))),
      (2L, "beta", None),
      (3L, "gamma", Some(Array[Byte](-1, 0, 1))))
      .toDF("id", "txt", "blob")
    val dir = tmpDir() + "/out"
    TarShards.write(df.repartition(2), "id",
      Seq("txt" -> "txt", "bin" -> "blob"), dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(shards.length == 2, shards.mkString(","))
    val back = TarShards.samples(spark, s"$dir/*.tar")
      .select($"key".cast("long").as("id"),
        element_at($"fields", "txt").cast("string").as("txt"),
        element_at($"fields", "bin").as("blob"))
      .orderBy("id")
      .as[(Long, String, Option[Array[Byte]])].collect()
    assert(back.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(back(0)._3.get.toSeq == Seq[Byte](1, 2, 3))
    assert(back(1)._3.isEmpty) // null field wrote no entry
    assert(back(2)._3.get.toSeq == Seq[Byte](-1, 0, 1))
    // a second write into the same dir must refuse, never silently
    // mix shard generations (the errorifexists discipline every
    // graft artifact writer follows)
    val e = intercept[Exception] {
      TarShards.write(df.repartition(2), "id",
        Seq("txt" -> "txt"), dir)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("exist"))
  }

  private def chainMsgs(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("write is task-retry idempotent: an attempt that dies " +
      "mid-write leaves NO tar at the final name (only a cleaned " +
      "temp), and the retry attempt commits a bit-identical round " +
      "trip") {
    val dir = tmpDir() + "/retry"
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).mkdirs()
    val rows = Seq(
      ("10", Seq("alpha".getBytes("UTF-8"), Array[Byte](1, 2, 3))),
      ("11", Seq("beta".getBytes("UTF-8"), Array[Byte](-1, 0, 1))))
    val exts = Seq("txt", "bin")
    // attempt 1 dies after the first row (the executor-kill shape)
    def dyingIt: Iterator[(String, Seq[Array[Byte]])] =
      rows.iterator.map { r =>
        if (r._1 == "11") throw new RuntimeException("executor died")
        r
      }
    intercept[RuntimeException] {
      TarShards.writeShard(conf, dir, pid = 0, attemptId = 1L, exts,
        dyingIt)
    }
    val after1 = new java.io.File(dir).listFiles().toSeq.map(_.getName)
    assert(!after1.exists(_.endsWith(".tar")),
      s"a dying attempt must not leave a final tar: $after1")
    // attempt 2 (the retry) commits; round trip is bit-identical
    TarShards.writeShard(conf, dir, pid = 0, attemptId = 2L, exts,
      rows.iterator)
    val back = TarShards.samples(spark, s"$dir/*.tar")
      .select($"key", element_at($"fields", "txt").as("txt"),
        element_at($"fields", "bin").as("bin"))
      .orderBy("key")
      .as[(String, Array[Byte], Array[Byte])].collect()
    assert(back.length == 2)
    assert(back(0)._1 == "10" &&
      new String(back(0)._2, "UTF-8") == "alpha" &&
      back(0)._3.toSeq == Seq[Byte](1, 2, 3))
    assert(back(1)._1 == "11" &&
      new String(back(1)._2, "UTF-8") == "beta" &&
      back(1)._3.toSeq == Seq[Byte](-1, 0, 1))
    // a THIRD attempt over the committed final (speculative twin /
    // driver-level retry of the whole stage) replaces, not collides
    TarShards.writeShard(conf, dir, pid = 0, attemptId = 3L, exts,
      rows.iterator)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tar")) == 1)
    assert(TarShards.samples(spark, s"$dir/*.tar").count() == 2)
  }

  test("write fidelity guards: a key containing '.' or '/' refuses " +
      "(the read side splits on the first dot), and an all-null-" +
      "fields row refuses (it would vanish from samples())") {
    val dotted = Seq(("1.5", Some("x"))).toDF("id", "txt")
    val d1 = tmpDir() + "/dot"
    val e1 = intercept[Exception] {
      TarShards.write(dotted, "id", Seq("txt" -> "txt"), d1)
    }
    assert(chainMsgs(e1).contains("FIRST dot"))
    val allNull = Seq(("7", None: Option[String])).toDF("id", "txt")
    val d2 = tmpDir() + "/nulls"
    val e2 = intercept[Exception] {
      TarShards.write(allNull, "id", Seq("txt" -> "txt"), d2)
    }
    assert(chainMsgs(e2).contains("all-null"))
  }

  test("executor-side FS resolution carries the DRIVER's Hadoop " +
      "conf: SerializableHadoopConf round-trips session settings " +
      "through Java serialization") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.s3a.endpoint", "https://example-endpoint")
    conf.set("graft.test.marker", "42")
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(new graft.formats.SerializableHadoopConf(conf))
    oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
    val got = in.readObject()
      .asInstanceOf[graft.formats.SerializableHadoopConf].value
    assert(got.get("fs.s3a.endpoint") == "https://example-endpoint")
    assert(got.get("graft.test.marker") == "42")
  }

  test("writeSized: byte-targeted shards — shard count from the " +
      "exact entry-cost estimate, balanced sizes, lossless round " +
      "trip, shard-id naming robust to repartition hash collisions") {
    // 240 samples × (512 header + 512 padded content) ≈ 240 KiB;
    // target 64 KiB → 4 shards
    val rows = (0 until 240).map { i =>
      (f"k$i%04d", ("x" * (100 + i % 50)).getBytes("UTF-8"))
    }
    val df = rows.toDF("id", "payload").repartition(7)
    val dir = tmpDir() + "/sized"
    val n = TarShards.writeSized(df, "id",
      Seq("bin" -> "payload"), dir, targetShardBytes = 64L << 10)
    assert(n == 4, s"expected 4 shards, got $n")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("shard-\\d{5}\\.tar")).sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      (0 until n).map(i => f"shard-$i%05d.tar"))
    // balance: every shard within ±20% of the mean archive size
    val sizes = files.map(_.length())
    val mean = sizes.sum.toDouble / sizes.length
    sizes.foreach { s =>
      assert(math.abs(s - mean) / mean < 0.2,
        s"unbalanced shard sizes ${sizes.toSeq}")
    }
    // round trip: every sample back, bytes exact
    val back = TarShards.samples(spark, s"$dir/*.tar")
      .select(col("key"), col("fields").getItem("bin").as("b"))
      .as[(String, Array[Byte])].collect()
      .map { case (k, b) => k -> new String(b, "UTF-8") }.toMap
    assert(back.size == 240)
    rows.foreach { case (k, payload) =>
      assert(back(k) == new String(payload, "UTF-8"))
    }
  }

  test("writeSized: deterministic across runs and input " +
      "partitionings (byte-identical archives); refusals — empty " +
      "input, sub-64KiB target, stale shards") {
    val rows = (0 until 60).map(i => (s"d$i", s"text-$i" * 20))
    val d1 = tmpDir() + "/a"
    val d2 = tmpDir() + "/b"
    TarShards.writeSized(rows.toDF("id", "txt").repartition(3),
      "id", Seq("txt" -> "txt"), d1, targetShardBytes = 64L << 10)
    TarShards.writeSized(rows.toDF("id", "txt").repartition(11),
      "id", Seq("txt" -> "txt"), d2, targetShardBytes = 64L << 10)
    def digests(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .map { f =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        f.getName -> md.digest(
          java.nio.file.Files.readAllBytes(f.toPath)).toSeq
      }.toSeq
    assert(digests(d1) == digests(d2),
      "partitioning changed the written archives")

    val empty = rows.toDF("id", "txt").filter(lit(false))
    val e1 = intercept[IllegalArgumentException] {
      TarShards.writeSized(empty, "id", Seq("txt" -> "txt"),
        tmpDir() + "/e", targetShardBytes = 64L << 10)
    }
    assert(e1.getMessage.contains("empty input"))
    val e2 = intercept[IllegalArgumentException] {
      TarShards.writeSized(rows.toDF("id", "txt"), "id",
        Seq("txt" -> "txt"), tmpDir() + "/f",
        targetShardBytes = 1024L)
    }
    assert(e2.getMessage.contains("64 KiB"))
    val e3 = intercept[IllegalArgumentException] {
      TarShards.writeSized(rows.toDF("id", "txt"), "id",
        Seq("txt" -> "txt"), d1, targetShardBytes = 64L << 10)
    }
    assert(e3.getMessage.contains("shard generations"))
  }
}
