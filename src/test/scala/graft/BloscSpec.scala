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

  test("unsupported frames fail LOUDLY: snappy, blosclz, both-shuffle-flags, truncation") {
    val stored = le32(20) ++ le32(16) ++ Array.fill[Byte](16)(1)
    def frame(flags: Int) = header(flags, 8, 16, 16, 40) ++ stored
    val snappy = intercept[IllegalArgumentException](Blosc.decompress(frame(2 << 5)))
    assert(snappy.getMessage.contains("snappy"), snappy.getMessage)
    val blosclz = intercept[IllegalArgumentException](Blosc.decompress(frame(0)))
    assert(blosclz.getMessage.contains("blosclz"), blosclz.getMessage)
    // a frame claiming BOTH byte- and bit-shuffle is malformed
    val both = intercept[IllegalArgumentException](
      Blosc.decompress(frame(0x01 | 0x04 | (1 << 5))))
    assert(both.getMessage.contains("both"), both.getMessage)
    // cbytes past the end of the actual buffer
    val trunc = intercept[IllegalArgumentException](
      Blosc.decompress(frame(1 << 5).dropRight(10)))
    assert(trunc.getMessage.contains("inconsistent"), trunc.getMessage)
  }

  test("golden frame: hand-assembled ZSTD raw-block frame decodes (spec, not our encoder)") {
    // zstd frame built byte-by-byte from RFC 8878: magic, single-segment
    // frame header (FCS = 1 byte), one raw last-block, 16 literal bytes
    val payload = Array.tabulate[Byte](16)(i => (i * 11 + 3).toByte)
    val zstdFrame = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte, // magic
      0x20, 16, // FHD: single-segment + 1-byte FCS; content size 16
      0x81.toByte, 0x00, 0x00) ++ payload // block header (16<<3)|raw|last
    val frame = header(4 << 5, 8, 16, 16,
      16 + 4 + 4 + zstdFrame.length) ++
      le32(20) ++ le32(zstdFrame.length) ++ zstdFrame
    assert(Blosc.decompress(frame).toSeq == payload.toSeq)
  }

  test("golden frame: zstd RLE-block frame decodes") {
    // RLE last-block: 32 copies of 0xAB from a single stored byte
    val zstdFrame = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0x20, 32, // FCS = 32
      0x03, 0x01, 0x00, // block header (32<<3)|(RLE<<1)|last = 0x103
      0xAB.toByte)
    val frame = header(4 << 5, 8, 32, 32,
      16 + 4 + 4 + zstdFrame.length) ++
      le32(20) ++ le32(zstdFrame.length) ++ zstdFrame
    assert(Blosc.decompress(frame).toSeq == Seq.fill(32)(0xAB.toByte))
  }

  test("golden frames: bit-shuffle orientation pinned by hand-derived vectors") {
    // stored-stream frames (csize == neblock) so only the filter runs.
    // typesize 1, 8 elements: the [8 x 8] bit matrix transposes; the
    // identity matrix (element i = 1<<i) is its own transpose, so the
    // shuffled payload EQUALS the plain one — any orientation or bit-
    // endianness mistake breaks this fixture.
    def bitFrame(shuffled: Array[Byte], typesize: Int, nbytes: Int) =
      header(0x04 | (1 << 5), typesize, nbytes, nbytes,
        16 + 4 + 4 + shuffled.length) ++
        le32(20) ++ le32(shuffled.length) ++ shuffled
    val ident = Array[Byte](1, 2, 4, 8, 16, 32, 64, 128.toByte)
    assert(Blosc.decompress(bitFrame(ident, 1, 8)).toSeq == ident.toSeq)
    // element 0 = 0xFF, rest 0: every bit plane holds exactly bit 0
    // -> shuffled = [1,1,1,1,1,1,1,1], plain = [0xFF,0,...]
    val ones = Array.fill[Byte](8)(1)
    val want = Array[Byte](0xFF.toByte, 0, 0, 0, 0, 0, 0, 0)
    assert(Blosc.decompress(bitFrame(ones, 1, 8)).toSeq == want.toSeq)
    // typesize 2, 8 elements (16 bytes): element 3 byte 1 bit 2 lives
    // in plane 8*1+2 = 10, byte 0, bit 3 -> shuffled[10] = 0x08
    val shuf2 = new Array[Byte](16)
    shuf2(10) = 0x08
    val want2 = new Array[Byte](16)
    want2(3 * 2 + 1) = 0x04
    assert(Blosc.decompress(bitFrame(shuf2, 2, 16)).toSeq == want2.toSeq)
    // MIRROR-BREAKING vector (typesize 1): plain element 0 = bit 1 only.
    // Our convention puts it at plane 1, byte 0, bit 0 -> shuffled[1] =
    // 0x01. A reversed PLANE order would read shuffled[6]; a reversed
    // BIT order within the plane byte would need 0x80 — either mirror
    // decodes this fixture to the wrong plain bytes (unlike the identity
    // fixture, which is invariant under simultaneous row/col reversal).
    val asym = new Array[Byte](8)
    asym(1) = 0x01
    val wantAsym = new Array[Byte](8)
    wantAsym(0) = 0x02
    assert(Blosc.decompress(bitFrame(asym, 1, 8)).toSeq == wantAsym.toSeq)
  }

  // EXTERNAL-GOLDEN note: the one remaining cross-validation this suite
  // cannot provide is a frame produced by real c-blosc/numcodecs
  // (Blosc(cname='zstd', shuffle=BITSHUFFLE)) — this container has no
  // numcodecs and zero egress, so it cannot be generated here. The
  // mirror-breaking vectors above pin the DOCUMENTED convention
  // asymmetrically (plane p = byte j·8 + bit k LSB-first; element i at
  // plane-byte i/8 bit i%8), and the naive-transpose cross-check below
  // pins the implementation against an independent formulation of that
  // convention; commit a numcodecs fixture when an environment allows.
  test("bit-shuffle matches an independent naive bit-matrix transpose") {
    // Naive reference written from the transform's DEFINITION (the
    // [n x 8·typesize] bit matrix transposes), via an explicit boolean
    // matrix — structurally unrelated to Blosc.scala's plane loop.
    def naive(raw: Array[Byte], typesize: Int): Array[Byte] = {
      val n = (raw.length / typesize) & ~7
      val cols = 8 * typesize
      val m = Array.ofDim[Boolean](n, cols)
      for (i <- 0 until n; c <- 0 until cols)
        m(i)(c) = ((raw(i * typesize + c / 8) >> (c % 8)) & 1) == 1
      val out = raw.clone()
      java.util.Arrays.fill(out, 0, n * typesize, 0.toByte)
      for (c <- 0 until cols; i <- 0 until n if m(i)(c)) {
        val o = c * (n / 8) + i / 8
        out(o) = (out(o) | (1 << (i % 8))).toByte
      }
      out
    }
    def bitFrame(shuffled: Array[Byte], typesize: Int, nbytes: Int) =
      header(0x04 | (1 << 5), typesize, nbytes, nbytes,
        16 + 4 + 4 + shuffled.length) ++
        le32(20) ++ le32(shuffled.length) ++ shuffled
    val rnd = new scala.util.Random(20260815L)
    for (typesize <- Seq(1, 2, 4, 8); nElems <- Seq(8, 24, 29)) {
      val nbytes = typesize * nElems
      val raw = Array.fill[Byte](nbytes)(rnd.nextInt(256).toByte)
      val shuffled = naive(raw, typesize)
      assert(Blosc.decompress(bitFrame(shuffled, typesize, nbytes)).toSeq ==
        raw.toSeq, s"typesize=$typesize nElems=$nElems")
    }
  }

  test("encoder round trip across geometries: blocks, splits, leftovers, tails") {
    // > 64 KiB payloads exercise multi-block frames; lz4 + typesize 8 +
    // full blocks exercise the 8-way split path; sizes chosen to hit
    // leftover blocks and sub-typesize tails
    val sizes = Seq(8, 256, 1024, 65536, 65536 + 128, 131072 + 8, 65537, 100)
    for {
      n <- sizes
      cname <- Seq("lz4", "zlib", "zstd")
      typesize <- Seq(4, 8)
      shuffle <- Seq(Blosc.ShuffleNone, Blosc.ShuffleByte, Blosc.ShuffleBit)
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
    // zlib and zstd never split in forward-compat mode: bit 4 set
    assert((Blosc.compress(raw, "zlib", 8)(2) & 0x10) != 0)
    assert((Blosc.compress(raw, "zstd", 8)(2) & 0x10) != 0)
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

  test("a hand-built blosc(zstd, bit-shuffle) STORE reads through the scan") {
    // the common non-default numcodecs configuration in the wild:
    // Blosc(cname='zstd', shuffle=Blosc.BITSHUFFLE)
    val dir = graft.sources.IO.tmp("graft_blosc_zstd_store_") + "/v"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, ".zarray"),
      """{"zarr_format":2,"shape":[48],"chunks":[48],"dtype":"<f8",
        |"compressor":{"id":"blosc","cname":"zstd","clevel":5,"shuffle":2,"blocksize":0},
        |"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    Files.writeString(Paths.get(dir, ".zattrs"), """{"_ARRAY_DIMENSIONS":["t"]}""")
    val buf = ByteBuffer.allocate(48 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 48).foreach(i => buf.putDouble(i * 0.25 - 3.0))
    Files.write(Paths.get(dir, "0"),
      Blosc.compress(buf.array(), "zstd", 8, Blosc.ShuffleBit))
    val got = Zarr.readArray(spark, dir).orderBy(col("t")).collect().map(_.getDouble(1))
    assert(got.toSeq == (0 until 48).map(_ * 0.25 - 3.0))
  }

  test("blosc metadata gate: lz4hc/zstd/bit-shuffle accepted, unknown cnames refused") {
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
    assert(ZarrMeta.read(bit).compressor.contains("blosc:lz4"))
    val zs = store("zs", """{"id":"blosc","cname":"zstd","clevel":5,"shuffle":1}""")
    assert(ZarrMeta.read(zs).compressor.contains("blosc:zstd"))
    val sn = store("sn", """{"id":"blosc","cname":"snappy","clevel":5,"shuffle":1}""")
    val e2 = intercept[IllegalArgumentException](ZarrMeta.read(sn))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
  }
}
