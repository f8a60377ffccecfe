package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The deletion-vector codecs at BYTE level — expected layouts are
  * hand-assembled from the public Delta PROTOCOL.md / RoaringFormatSpec,
  * so the serializer and deserializer cannot cancel a shared bug — plus
  * the sidecar-file framing (version byte, BE size, CRC-32) and Z85. */
class DeletionVectorsSpec extends SparkSpec {

  test("Z85 reference vector (ZeroMQ spec): HelloWorld") {
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").sameElements(bytes))
  }

  test("portable RoaringBitmapArray: serialize matches the hand-assembled " +
    "spec layout and deserializes back (array containers, two 32-bit keys)") {
    val values = Array(1L, 5L, 7L, (1L << 32) | 1L)
    val expected = {
      // magic + count, then per key: key + 32-bit bitmap (cookie 12346)
      val b1 = 4 + 4 + 4 + 4 + 6  // [1,5,7]: headers + offset + 3 shorts
      val b2 = 4 + 4 + 4 + 4 + 2  // [1]
      val bb = ByteBuffer.allocate(4 + 8 + (4 + b1) + (4 + b2))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377); bb.putLong(2L)
      bb.putInt(0)                 // key 0
      bb.putInt(12346); bb.putInt(1)        // cookie, 1 container
      bb.putShort(0); bb.putShort(2)        // container key, card-1
      bb.putInt(16)                          // offset to container
      bb.putShort(1); bb.putShort(5); bb.putShort(7)
      bb.putInt(1)                 // key 1
      bb.putInt(12346); bb.putInt(1)
      bb.putShort(0); bb.putShort(0)
      bb.putInt(16)
      bb.putShort(1)
      bb.array()
    }
    assert(DeletionVectors.serialize(values).sameElements(expected),
      "serializer must produce the spec byte layout exactly")
    assert(DeletionVectors.deserialize(expected).toSeq == values.toSeq)
  }

  test("deserializer accepts the RUN-container cookie (12347) a foreign " +
    "writer emits — run flags, no offsets below the threshold") {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 4 + 1 + 4 + 2 + 6)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377); bb.putLong(1L)
    bb.putInt(0)                        // array key 0
    bb.putInt((0 << 16) | 12347)        // SERIAL_COOKIE, 1 container
    bb.put(1.toByte)                    // run flag: container 0 is runs
    bb.putShort(0); bb.putShort(4)      // key 0, card-1 = 4
    bb.putShort(1)                      // 1 run
    bb.putShort(3); bb.putShort(4)      // [3, 3+4]
    assert(DeletionVectors.deserialize(bb.array()).toSeq ==
      Seq(3L, 4L, 5L, 6L, 7L))
  }

  test("bitmap-container tier (cardinality > 4096) round-trips") {
    val values = (0L until 5000L).toArray
    val bytes = DeletionVectors.serialize(values)
    assert(DeletionVectors.deserialize(bytes).toSeq == values.toSeq)
    // 8192-byte container, not 10000 bytes of array entries
    assert(bytes.length < 9000, s"expected a bitmap container, ${bytes.length}B")
  }

  test("sidecar DV file: spec framing (version byte, BE size, CRC-32), " +
    "UUID path resolution, and corruption fails loud") {
    val dir = tmpDir("dv_file")
    val bm1 = Array(1L, 3L)
    val bm2 = Array(0L, 2L, 4L)
    val (enc, spans) = DeletionVectors.writeDvFile(dir, Seq(bm1, bm2))
    // the file exists under the spec name derived from the z85 UUID
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(files.exists(_.contains("deletion_vector_")), files.mkString(","))
    val d1 = DeletionVectors.Descriptor("u", enc,
      Some(spans(0)._1), spans(0)._2, 2L)
    val d2 = DeletionVectors.Descriptor("u", enc,
      Some(spans(1)._1), spans(1)._2, 3L)
    assert(DeletionVectors.load(dir, d1).toSeq == bm1.toSeq)
    assert(DeletionVectors.load(dir, d2).toSeq == bm2.toSeq)
    // wrong cardinality → loud
    val bad = d1.copy(cardinality = 7L)
    assert(intercept[IllegalArgumentException] {
      DeletionVectors.load(dir, bad)
    }.getMessage.contains("cardinality"))
    // flip one data byte → checksum mismatch
    val f = Paths.get(files.find(_.contains("deletion_vector_")).get)
    val bytes = Files.readAllBytes(f)
    bytes(spans(0)._1 + 4 + 2) = (bytes(spans(0)._1 + 4 + 2) ^ 0x01).toByte
    Files.write(f, bytes)
    assert(intercept[IllegalArgumentException] {
      DeletionVectors.load(dir, d1)
    }.getMessage.contains("checksum"))
  }

  test("inline DV ('i' storage): z85 payload with zero-pad tail") {
    val bm = Array(2L, 9L, 11L)
    val data = DeletionVectors.serialize(bm)
    val padded = data ++ Array.fill((4 - data.length % 4) % 4)(0.toByte)
    val d = DeletionVectors.Descriptor("i",
      DeletionVectors.z85Encode(padded), None, data.length, 3L)
    assert(DeletionVectors.load("/nonexistent", d).toSeq == bm.toSeq)
  }

  test("seeded fuzz: serialize/deserialize round-trips arbitrary sorted " +
    "sets across container tiers and 32-bit key boundaries") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val size = 1 + rnd.nextInt(9000)
      val values = Iterator.continually {
        val tier = rnd.nextInt(4)
        val base = tier match {
          case 0 => 0L
          case 1 => 0xFFFFL                   // container boundary
          case 2 => 0xFFFFFFFFL               // 32-bit key boundary
          case 3 => (rnd.nextInt(3).toLong << 32)
        }
        base + rnd.nextInt(1 << 17)
      }.take(size).toArray.distinct.sorted
      val back = DeletionVectors.deserialize(
        DeletionVectors.serialize(values))
      assert(back.toSeq == values.toSeq, s"trial $trial size $size")
    }
  }
}
