package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.file.Files
import java.util.UUID
import java.util.zip.CRC32

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Byte-level conformance of the deletion-vector serialization
  * against the published Delta format (PROTOCOL.md "Deletion Vector
  * Format"): sidecar framing, checksums, the portable
  * RoaringBitmapArray layout, Base85/UUID naming, and the read
  * path's plan shape (per-file probe, no row-scale exchange). */
class DeletionVectorFormatSpec extends SparkSpec {

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------
  // Base85 (RFC 1924 character set)
  // ---------------------------------------------------------------

  test("base85 alphabet is exactly the RFC 1924 set, digits first") {
    val expected =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
        "!#$%&()*+-;<=>?@^_`{|}~"
    // encoding the block value i (0 <= i < 85) yields "0000" + alphabet(i)
    val observed = (0 until 85).map { i =>
      val s = DeletionVectors.encodeBase85(Array[Byte](0, 0, 0, i.toByte))
      assert(s.take(4) == "0000")
      s.charAt(4)
    }.mkString
    assert(observed == expected)
  }

  test("base85 round-trips arbitrary 4-byte-aligned payloads") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { n =>
      val bytes = Array.fill(4 * n)(rnd.nextInt().toByte)
      val enc = DeletionVectors.encodeBase85(bytes)
      assert(enc.length == 5 * n)
      assert(DeletionVectors.decodeBase85(enc).toSeq == bytes.toSeq)
    }
  }

  test("UUID encodes to exactly 20 characters and round-trips") {
    val u = UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val enc = DeletionVectors.encodeUUID(u)
    assert(enc.length == 20)
    assert(DeletionVectors.decodeUUID(enc) == u)
  }

  // ---------------------------------------------------------------
  // Portable bitmap bytes
  // ---------------------------------------------------------------

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], off: Int): Long =
    (le32(b, off) & 0xffffffffL) | ((le32(b, off + 4) & 0xffffffffL) << 32)

  test("bitmap bytes: little-endian magic 1681511377, bucket count, roaring cookie") {
    val bm = DeletionVectors.emptyBitmap()
    Seq(0L, 1L, 17L, 100000L).foreach(bm.addLong)
    val bytes = DeletionVectors.serializeBitmap(bm)
    assert(le32(bytes, 0) == 1681511377)
    // all values < 2^32 -> exactly one 32-bit bucket, key 0
    assert(le64(bytes, 4) == 1L)
    assert(le32(bytes, 12) == 0)
    // the bucket payload is a standard 32-bit roaring serialization:
    // SERIAL_COOKIE_NO_RUNCONTAINER (12346) or SERIAL_COOKIE (12347)
    val cookie = le32(bytes, 16) & 0xffff
    assert(cookie == 12346 || cookie == 12347)
    val back = DeletionVectors.deserializeBitmap(bytes)
    assert(back.getLongCardinality == 4)
    Seq(0L, 1L, 17L, 100000L).foreach(v => assert(back.contains(v)))
    assert(!back.contains(2L))
  }

  test("bitmap survives a dense run and a >2^32 value (two buckets)") {
    val bm = DeletionVectors.emptyBitmap()
    (0L until 10000L).foreach(bm.addLong)
    bm.addLong(1L << 33)
    val bytes = DeletionVectors.serializeBitmap(bm)
    assert(le64(bytes, 4) == 2L) // two 32-bit buckets
    val back = DeletionVectors.deserializeBitmap(bytes)
    assert(back.getLongCardinality == 10001L)
    assert(back.contains(9999L) && back.contains(1L << 33))
  }

  // ---------------------------------------------------------------
  // Sidecar framing
  // ---------------------------------------------------------------

  test("sidecar: version byte, per-blob [size BE][data][crc32 BE], exact offsets") {
    val dir = Files.createTempDirectory("dvfmt").toString
    val fs = fsOf(dir)
    val p = new Path(dir, "pack.bin")
    val blobA = DeletionVectors.serializeBitmap {
      val b = DeletionVectors.emptyBitmap(); Seq(1L, 5L).foreach(b.addLong); b
    }
    val blobB = DeletionVectors.serializeBitmap {
      val b = DeletionVectors.emptyBitmap(); Seq(2L, 3L, 9L).foreach(b.addLong); b
    }
    val offsets = DeletionVectors.writeSidecar(fs, p, Seq(blobA, blobB))
    assert(offsets == Seq(1, 1 + 4 + blobA.length + 4))
    val raw = Files.readAllBytes(java.nio.file.Paths.get(dir, "pack.bin"))
    assert(raw(0) == 1, "format version byte")
    // big-endian size word at each offset
    def be32(off: Int) = new DataInputStream(
      new ByteArrayInputStream(raw, off, 4)).readInt()
    assert(be32(offsets(0)) == blobA.length)
    assert(be32(offsets(1)) == blobB.length)
    // checksum trailer is CRC-32 of the data bytes
    val crc = new CRC32(); crc.update(blobA)
    assert(be32(offsets(0) + 4 + blobA.length) == crc.getValue.toInt)
    // readBlob verifies and returns the exact data
    assert(DeletionVectors.readBlob(fs, p, offsets(1), blobB.length).toSeq == blobB.toSeq)
  }

  test("a corrupted sidecar byte fails the CRC check") {
    val dir = Files.createTempDirectory("dvcrc").toString
    val fs = fsOf(dir)
    val p = new Path(dir, "pack.bin")
    val blob = DeletionVectors.serializeBitmap {
      val b = DeletionVectors.emptyBitmap(); (0L until 100L).foreach(b.addLong); b
    }
    val off = DeletionVectors.writeSidecar(fs, p, Seq(blob)).head
    val file = java.nio.file.Paths.get(dir, "pack.bin")
    val raw = Files.readAllBytes(file)
    raw(off + 4 + 10) = (raw(off + 4 + 10) ^ 0x40).toByte
    Files.write(file, raw)
    // drop the local FS's own checksum sidecar so the FORMAT's CRC
    // trailer (not hadoop's transport check) is what fires
    fs.delete(new Path(dir, ".pack.bin.crc"), false)
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.readBlob(fs, p, off, blob.length)
    }
    assert(e.getMessage.contains("CRC-32"))
  }

  // ---------------------------------------------------------------
  // End to end: descriptor naming + an external reader's walk of the
  // raw bytes recovers exactly the deleted ids
  // ---------------------------------------------------------------

  test("descriptor decodes to the sidecar path; raw bytes replay the deleted rows") {
    val dir = Files.createTempDirectory("dvext").toString + "/tbl"
    DeltaSource.writeDelta(
      spark.range(0, 500).selectExpr("id", "id % 5 as k"), dir)
    DeltaSource.deleteDelta(spark, dir, col("k") === 2)
    val fs = fsOf(dir)
    // walk the commit like a third-party reader: parse descriptors
    val log = {
      val in = fs.open(new Path(dir, f"_delta_log/${1L}%020d.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val descs = log.linesIterator.filter(_.nonEmpty).map(mapper.readTree)
      .filter(_.path("add").isObject)
      .map(_.path("add"))
      .filter(_.path("deletionVector").isObject)
      .map { a => (a.path("path").asText(), a.path("deletionVector")) }
      .toSeq
    assert(descs.nonEmpty)
    var replayedDeleted = 0L
    descs.foreach { case (dataFile, d) =>
      assert(d.path("storageType").asText() == "u")
      val enc = d.path("pathOrInlineDv").asText()
      val uuid = DeletionVectors.decodeUUID(enc.takeRight(20))
      val sidecar = new Path(dir, s"deletion_vector_$uuid.bin")
      assert(fs.exists(sidecar), "UUID naming rule resolves to the sidecar on disk")
      val blob = DeletionVectors.readBlob(fs, sidecar,
        d.path("offset").asInt(1), d.path("sizeInBytes").asInt())
      val bm = DeletionVectors.deserializeBitmap(blob)
      assert(bm.getLongCardinality == d.path("cardinality").asLong())
      // the deleted row indexes point at rows with k == 2 in THAT file
      val fileRows = spark.read.parquet(new Path(dir, dataFile).toString)
        .selectExpr("id", "k").collect().map(r => (r.getLong(0), r.getLong(1)))
      val it = bm.getLongIterator
      while (it.hasNext) {
        val ri = it.next()
        assert(fileRows(ri.toInt)._2 == 2L,
          s"row index $ri of $dataFile should hold a deleted (k=2) row")
        replayedDeleted += 1
      }
    }
    assert(replayedDeleted == 100L) // ids ≡ 2 (mod 5) in [0, 500)
  }

  // ---------------------------------------------------------------
  // Read-path shape: per-file probe, no row-scale exchange; the
  // shuffled fallback takes over above the broadcast ceiling
  // ---------------------------------------------------------------

  test("DV read plan has NO broadcast/join — a scan-side probe only") {
    val dir = Files.createTempDirectory("dvplan").toString + "/tbl"
    DeltaSource.writeDelta(
      spark.range(0, 2000).selectExpr("id", "id % 3 as k"), dir)
    DeltaSource.deleteDelta(spark, dir, col("k") === 1)
    val df = DeltaSource.readDelta(spark, dir)
    assert(df.count() == 2000 - 667)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "DV application must not broadcast a row-per-deleted-row relation")
    assert(!plan.contains("Join"), "DV application is a scan filter, not a join")
  }

  test("above the broadcast ceiling the shuffled anti-join fallback is used, same rows") {
    val dir = Files.createTempDirectory("dvfall").toString + "/tbl"
    DeltaSource.writeDelta(
      spark.range(0, 2000).selectExpr("id", "id % 3 as k"), dir)
    DeltaSource.deleteDelta(spark, dir, col("k") === 1)
    val prior = DeltaSource.DvBroadcastMaxFiles
    try {
      DeltaSource.DvBroadcastMaxFiles = 0
      val df = DeltaSource.readDelta(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), "fallback applies DVs via an anti-join")
      assert(df.count() == 2000 - 667)
      assert(df.where(col("k") === 1).count() == 0)
    } finally DeltaSource.DvBroadcastMaxFiles = prior
  }
}
