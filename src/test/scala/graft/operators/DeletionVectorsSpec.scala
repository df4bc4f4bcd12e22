package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the deletion-vector codec against the public format's fixed
  * points: the Z85 spec vector, array/bitmap container round-trips,
  * multi-key (>2^32 row index) handling, and a hand-crafted
  * run-container blob (our writer never emits runs, but stock writers
  * do — the read path must handle all three container kinds).
  */
class DeletionVectorsSpec extends AnyFunSuite {

  test("z85 round-trips and matches the ZeroMQ spec vector") {
    // the Z85 reference vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // encodes to "HelloWorld"
    val spec = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(DeletionVectors.z85Encode(spec) === "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq === spec.toSeq)
    val rnd = new scala.util.Random(12)
    val bytes = Array.fill(64)(rnd.nextInt(256).toByte)
    assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(bytes)).toSeq === bytes.toSeq)
  }

  test("serialize/deserialize round-trips array and bitmap containers") {
    // sparse (array container) + one dense 16-bit block (> 4096 values
    // forces the bitmap container path on both sides)
    val sparse = Array[Long](0, 1, 5, 4095, 65536, 131071)
    val dense = (0L until 5000L).map(_ * 2 + (3L << 16)).toArray
    val rows = (sparse ++ dense).sorted
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(rows)).toSeq === rows.toSeq)
  }

  test("row indexes above 2^32 land in keyed bitmaps") {
    val rows = Array[Long](7, (1L << 32) + 3, (1L << 32) + 4096, (5L << 32))
    assert(DeletionVectors.deserialize(DeletionVectors.serialize(rows)).toSeq === rows.toSeq)
  }

  test("reads stock run containers (cookie 12347 + run flag)") {
    // hand-craft: one bitmap (key 0) with a single run container
    // covering 10..14 — the SERIAL_COOKIE layout with n=1 (< the
    // offset-header threshold, so no offset index)
    val bm = ByteBuffer.allocate(4 + 1 + 4 + 2 + 4).order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | (0 << 16)) // n-1 = 0 in the high 16 bits
    bm.put(1.toByte)             // run flag bitset: container 0 is a run
    bm.putShort(0.toShort)       // key
    bm.putShort(4.toShort)       // cardinality - 1 (5 values)
    bm.putShort(1.toShort)       // nRuns
    bm.putShort(10.toShort)      // run start
    bm.putShort(4.toShort)       // run length (inclusive)
    val blob = ByteBuffer.allocate(4 + 8 + 4 + bm.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    blob.putInt(DeletionVectors.Magic).putLong(1L).putInt(0)
    blob.put(bm.array())
    assert(DeletionVectors.deserialize(blob.array()).toSeq ===
      Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("framed file write + u-descriptor load round-trip with CRC") {
    val dir = java.nio.file.Files.createTempDirectory("dvspec")
    try {
      val rows = Array[Long](2, 3, 9, 1000)
      val (pathOrInline, offset) = DeletionVectors.writeFile(dir, rows)
      assert(pathOrInline.length === 20) // z85 uuid, no prefix
      val out = DeletionVectors.load(dir.toString, "u", pathOrInline,
        Some(offset), DeletionVectors.serialize(rows).length, rows.length)
      assert(out.toSeq === rows.toSeq)
      // corrupt one data byte: the CRC check must refuse
      val listing = java.nio.file.Files.list(dir)
      val f = try {
        import scala.collection.JavaConverters._
        listing.iterator().asScala.next()
      } finally listing.close()
      val bytes = java.nio.file.Files.readAllBytes(f)
      bytes(6) = (bytes(6) ^ 0x01).toByte
      java.nio.file.Files.write(f, bytes)
      intercept[IllegalArgumentException] {
        DeletionVectors.load(dir.toString, "u", pathOrInline,
          Some(offset), DeletionVectors.serialize(rows).length, rows.length)
      }
    } finally {
      import scala.collection.JavaConverters._
      val l = java.nio.file.Files.list(dir)
      try l.iterator().asScala.toSeq.foreach(java.nio.file.Files.delete)
      finally l.close()
      java.nio.file.Files.delete(dir)
    }
  }
}
