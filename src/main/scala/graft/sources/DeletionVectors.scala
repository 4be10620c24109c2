package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** The Delta protocol's deletion-vector serialization — the open
  * format delta-rs / Delta Lake / DuckDB's delta extension read, so
  * a graft table that has taken a merge-on-read DELETE stays
  * consumable by external engines (the reference stack writes its
  * zones with delta-rs, /root/reference/airflow/dags/etl.py:110-120).
  *
  * On-disk sidecar layout (PROTOCOL.md "Deletion Vector Format"):
  *
  *   byte 0:        format version (1)
  *   per vector:    [dataSize: int32 big-endian]
  *                  [data: `dataSize` bytes]
  *                  [checksum: CRC-32 of `data`, int32 big-endian]
  *
  * The descriptor's `offset` points at the vector's dataSize word;
  * `sizeInBytes` is `dataSize` (data only, excluding the length word
  * and the checksum). `data` itself is the PORTABLE RoaringBitmapArray
  * serialization: a 4-byte little-endian magic number (1681511377)
  * followed by the 64-bit roaring bitmap portable spec (8-byte
  * little-endian bitmap count, then per 32-bit bucket a 4-byte
  * little-endian key and the bucket's standard 32-bit roaring
  * serialization) — exactly what `Roaring64NavigableMap
  * .serializePortable` / `.deserializePortable` produce and consume.
  *
  * Descriptor naming (`storageType` "u"): `pathOrInlineDv` is an
  * optional random prefix followed by the 20-character Base85
  * encoding of the sidecar's UUID, using the RFC 1924 character set
  * (Delta's `Base85Codec`); the sidecar lives at
  * `<table>/<prefix>/deletion_vector_<canonical-uuid>.bin`.
  * "p" carries a path verbatim (absolute URI or table-relative);
  * "i" inlines the Base85-encoded bitmap data in the descriptor.
  */
object DeletionVectors {

  /** Portable RoaringBitmapArray magic number (Delta PROTOCOL.md). */
  val PortableMagic: Int = 1681511377

  /** DV sidecar file format version byte. */
  val FormatVersion: Int = 1

  // ---------------------------------------------------------------
  // Base85, RFC 1924 alphabet (4-byte blocks -> 5 characters)
  // ---------------------------------------------------------------

  private val Alphabet: Array[Char] =
    (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z')).toArray ++
      "!#$%&()*+-;<=>?@^_`{|}~".toCharArray
  private val DecodeMap: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def encodeBase85(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"base85 encodes 4-byte blocks, got ${bytes.length}")
    val out = new Array[Char](bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var k = 4
      val base = i / 4 * 5
      while (k >= 0) { out(base + k) = Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      i += 4
    }
    new String(out)
  }

  def decodeBase85(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 decodes 5-char blocks, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) DecodeMap(c.toInt) else -1
        require(d >= 0, s"invalid base85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val base = i / 5 * 4
      var k = 3
      while (k >= 0) { out(base + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    out
  }

  /** 20-character Base85 form of a UUID (16 bytes, big-endian). */
  def encodeUUID(u: UUID): String = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    encodeBase85(bb.array())
  }

  def decodeUUID(s: String): UUID = {
    val bb = java.nio.ByteBuffer.wrap(decodeBase85(s))
    new UUID(bb.getLong, bb.getLong)
  }

  // ---------------------------------------------------------------
  // Bitmap <-> portable bytes
  // ---------------------------------------------------------------

  /** Fresh bitmap with the spec's unsigned long ordering. */
  def emptyBitmap(): Roaring64NavigableMap = new Roaring64NavigableMap(false)

  /** Serialize to the spec's `data` bytes: magic (LE) + portable
    * 64-bit roaring. Run-optimizes first (smallest wire form). */
  def serializeBitmap(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(PortableMagic)) // little-endian
    bm.serializePortable(out)
    out.flush()
    bos.toByteArray
  }

  def deserializeBitmap(data: Array[Byte]): Roaring64NavigableMap = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val magic = Integer.reverseBytes(in.readInt())
    require(magic == PortableMagic,
      s"not a portable deletion-vector bitmap (magic $magic, expected $PortableMagic)")
    val bm = emptyBitmap()
    bm.deserializePortable(in)
    bm
  }

  // ---------------------------------------------------------------
  // Sidecar file IO
  // ---------------------------------------------------------------

  /** Write a packed sidecar holding one blob per deletion vector.
    * Returns each blob's descriptor offset (position of its dataSize
    * word). Fails if `path` exists (sidecars are immutable; every
    * DELETE commit writes a fresh one). */
  def writeSidecar(fs: FileSystem, path: Path, blobs: Seq[Array[Byte]]): Seq[Int] = {
    val out = new DataOutputStream(fs.create(path, /* overwrite = */ false))
    try {
      out.writeByte(FormatVersion)
      blobs.map { b =>
        val off = out.size()
        out.writeInt(b.length)
        out.write(b)
        val crc = new CRC32()
        crc.update(b)
        out.writeInt(crc.getValue.toInt)
        off
      }
    } finally out.close()
  }

  /** Read one vector's `data` bytes at `offset`, verifying the
    * length word against the descriptor and the CRC-32 trailer. */
  def readBlob(fs: FileSystem, path: Path, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val in = fs.open(path)
    try {
      in.seek(offset.toLong)
      val dis = new DataInputStream(in)
      val sz = dis.readInt()
      require(sz == sizeInBytes,
        s"deletion vector at $path:$offset declares $sz bytes, descriptor says $sizeInBytes")
      val data = new Array[Byte](sz)
      dis.readFully(data)
      val stored = dis.readInt()
      val crc = new CRC32()
      crc.update(data)
      require(crc.getValue.toInt == stored,
        s"deletion vector at $path:$offset failed its CRC-32 check")
      data
    } finally in.close()
  }
}
