package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.zarr.{Blosc, Zarr, ZarrMeta}

/** The blosc chunk codec ([[graft.sources.zarr.Blosc]]) — the numcodecs
  * default for zarr v2 stores, so the compressor a real xarray-written
  * store (the reference's NASA POWER store) actually uses.
  *
  * The decoder is verified two independent ways: (a) HAND-CRAFTED golden
  * frames built byte-by-byte from the public c-blosc container spec —
  * including a hand-assembled raw-LZ4 sequence stream — so decode
  * correctness does not rest on inverting our own encoder; (b) encoder
  * round trips across block/split/leftover/memcpy geometries, which
  * prove both sides derive the UNSTORED `nsplits` the same way (a
  * disagreement cannot decode: split sizes stop lining up).
  */
class BloscSpec extends SparkTestBase {

  private def header(flags: Int, typesize: Int, nbytes: Int, blocksize: Int,
      cbytes: Int): Array[Byte] = {
    val h = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    h.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    h.putInt(nbytes).putInt(blocksize).putInt(cbytes)
    h.array()
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  // flags: bit0 shuffle, bit1 memcpy, bit2 bitshuffle, bits5-7 codec id
  private val Lz4Shuffled = 0x01 | (1 << 5)

  test("golden frame: hand-assembled LZ4 sequence stream decodes (spec, not our encoder)") {
    // 32 zero doubles = 256 zero bytes. Raw LZ4 block, built by hand:
    //   seq1: token 0x1F (1 literal, matchlen ext), lit 0x00,
    //         offset 1, ext 231 -> match of 4+15+231 = 250
    //   seq2: token 0x50 -> 5 trailing literals (end-of-block rule)
    val lz4Stream = Array[Byte](0x1F, 0x00, 0x01, 0x00, 0xE7.toByte,
      0x50, 0x00, 0x00, 0x00, 0x00, 0x00)
    val frame = header(Lz4Shuffled, 8, 256, 256, 16 + 4 + 4 + lz4Stream.length) ++
      le32(20) ++ le32(lz4Stream.length) ++ lz4Stream
    val raw = Blosc.decompress(frame)
    assert(raw.length == 256 && raw.forall(_ == 0))
  }

  test("golden frame: stored split + byte shuffle round an independent shuffle definition") {
    // doubles 0..31; shuffled layout computed HERE from first principles
    // (plane j byte i <- source byte i*8+j), stored uncompressed
    // (csize == neblock). typesize 8, blocksize 256: 256/8=32 < 128 so
    // nsplits must resolve to 1 even with the dont-split bit CLEAR.
    val src = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 32).foreach(i => src.putDouble(i.toDouble))
    val plain = src.array()
    val shuffled = new Array[Byte](256)
    for (j <- 0 until 8; i <- 0 until 32) shuffled(j * 32 + i) = plain(i * 8 + j)
    val frame = header(Lz4Shuffled, 8, 256, 256, 16 + 4 + 4 + 256) ++
      le32(20) ++ le32(256) ++ shuffled
    assert(Blosc.decompress(frame).toSeq == plain.toSeq)
  }

  test("golden frame: memcpy frames return the raw payload verbatim") {
    val payload = Array.tabulate[Byte](64)(i => (i * 37 % 251).toByte)
    val frame = header(0x02 | (1 << 5), 8, 64, 64, 16 + 64) ++ payload
    assert(Blosc.decompress(frame).toSeq == payload.toSeq)
  }

  test("unsupported frames fail LOUDLY: zstd, snappy, blosclz, bitshuffle, truncation") {
    val stored = le32(20) ++ le32(16) ++ Array.fill[Byte](16)(1)
    def frame(flags: Int) = header(flags, 8, 16, 16, 40) ++ stored
    val zstd = intercept[IllegalArgumentException](Blosc.decompress(frame(4 << 5)))
    assert(zstd.getMessage.contains("zstd"), zstd.getMessage)
    val snappy = intercept[IllegalArgumentException](Blosc.decompress(frame(2 << 5)))
    assert(snappy.getMessage.contains("snappy"), snappy.getMessage)
    val blosclz = intercept[IllegalArgumentException](Blosc.decompress(frame(0)))
    assert(blosclz.getMessage.contains("blosclz"), blosclz.getMessage)
    val bitshuf = intercept[IllegalArgumentException](Blosc.decompress(frame(0x04 | (1 << 5))))
    assert(bitshuf.getMessage.contains("bit-shuffle"), bitshuf.getMessage)
    // cbytes past the end of the actual buffer
    val trunc = intercept[IllegalArgumentException](
      Blosc.decompress(frame(1 << 5).dropRight(10)))
    assert(trunc.getMessage.contains("inconsistent"), trunc.getMessage)
  }

  test("encoder round trip across geometries: blocks, splits, leftovers, tails") {
    // > 64 KiB payloads exercise multi-block frames; lz4 + typesize 8 +
    // full blocks exercise the 8-way split path; sizes chosen to hit
    // leftover blocks and sub-typesize tails
    val sizes = Seq(8, 256, 1024, 65536, 65536 + 128, 131072 + 8, 65537, 100)
    for {
      n <- sizes
      cname <- Seq("lz4", "zlib")
      typesize <- Seq(4, 8)
      shuffle <- Seq(true, false)
    } {
      // compressible but non-constant
      val raw = Array.tabulate[Byte](n)(i => (i / 64).toByte)
      val frame = Blosc.compress(raw, cname, typesize, shuffle)
      assert(Blosc.decompress(frame).toSeq == raw.toSeq,
        s"n=$n cname=$cname typesize=$typesize shuffle=$shuffle")
      assert(frame.length <= raw.length + 16, s"n=$n grew past the memcpy bound")
    }
  }

  test("encoder split/dont-split flags mirror c-blosc forward-compat mode") {
    val raw = Array.tabulate[Byte](65536)(i => (i % 7).toByte)
    // lz4, typesize 8, blocksize/typesize = 8192 >= 128 -> split: bit 4 clear
    assert((Blosc.compress(raw, "lz4", 8)(2) & 0x10) == 0)
    // zlib never splits in forward-compat mode: bit 4 set
    assert((Blosc.compress(raw, "zlib", 8)(2) & 0x10) != 0)
  }

  test("incompressible input falls back to a memcpy frame that round-trips") {
    // xorshift-ish deterministic noise (no Random: replay-stable)
    var x = 0x9E3779B97F4A7C15L
    val raw = Array.fill[Byte](4096) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; (x & 0xff).toByte
    }
    val frame = Blosc.compress(raw, "lz4", 8)
    assert((frame(2) & 0x02) != 0, "expected memcpy fallback") // bit1 memcpy
    assert(frame.length == raw.length + 16)
    assert(Blosc.decompress(frame).toSeq == raw.toSeq)
  }

  test("a hand-built blosc(lz4) STORE reads through the scan: metadata to values") {
    val dir = graft.sources.IO.tmp("graft_blosc_store_") + "/v"
    Files.createDirectories(Paths.get(dir))
    // numcodecs-shaped compressor document, as zarr-python writes it
    Files.writeString(Paths.get(dir, ".zarray"),
      """{"zarr_format":2,"shape":[32],"chunks":[32],"dtype":"<f8",
        |"compressor":{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0},
        |"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    Files.writeString(Paths.get(dir, ".zattrs"), """{"_ARRAY_DIMENSIONS":["t"]}""")
    val buf = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 32).foreach(i => buf.putDouble(i * 1.5))
    Files.write(Paths.get(dir, "0"), Blosc.compress(buf.array(), "lz4", 8))
    val got = Zarr.readArray(spark, dir).orderBy(col("t")).collect().map(_.getDouble(1))
    assert(got.toSeq == (0 until 32).map(_ * 1.5))
  }

  test("multi-block blosc chunks read through the scan (chunk bytes > one blosc block)") {
    val base = graft.sources.IO.tmp("graft_blosc_big_")
    // 16400 doubles/chunk = 131,200 B: two full 64 KiB blocks + leftover
    val f = (i: Array[Long]) => math.sin(i(0).toDouble) * 10
    Seq("blosc:lz4", "blosc:zlib", "zlib").zipWithIndex.foreach { case (c, k) =>
      Zarr.writeArray(s"$base/a$k", Array(32800L), Array(16400),
        Array("t"), Some(c), 0.0, f)
    }
    val rows = (0 to 2).map(k => Zarr.readArray(spark, s"$base/a$k")
      .agg(sum("value"), count("*"), sum(col("t") * col("value")))
      .collect().head.toSeq)
    assert(rows(0) == rows(2) && rows(1) == rows(2), rows.mkString(" vs "))
  }

  test("blosc metadata gate: lz4hc accepted, bit-shuffle and unknown cnames refused") {
    val base = graft.sources.IO.tmp("graft_blosc_meta_")
    def store(name: String, comp: String): String = {
      val d = Paths.get(base, name)
      Files.createDirectories(d)
      Files.writeString(d.resolve(".zarray"),
        s"""{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8",
           |"compressor":$comp,"fill_value":0,"order":"C","filters":null}""".stripMargin)
      d.toString
    }
    val hc = store("hc", """{"id":"blosc","cname":"lz4hc","clevel":9,"shuffle":1}""")
    assert(ZarrMeta.read(hc).compressor.contains("blosc:lz4"))
    val zl = store("zl", """{"id":"blosc","cname":"zlib","clevel":5,"shuffle":0}""")
    assert(ZarrMeta.read(zl).compressor.contains("blosc:zlib"))
    val bit = store("bit", """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":2}""")
    val e1 = intercept[IllegalArgumentException](ZarrMeta.read(bit))
    assert(e1.getMessage.contains("bit-shuffle"), e1.getMessage)
    val zs = store("zs", """{"id":"blosc","cname":"zstd","clevel":5,"shuffle":1}""")
    val e2 = intercept[IllegalArgumentException](ZarrMeta.read(zs))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
  }
}
