package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User surface of the zarr connector ([[ZarrDataSource]]) plus the
  * deterministic fixture the registered queries read (the harness has
  * no real zarr store; the fixture writer doubles as the write-side
  * proof that the reader decodes the format, not just its own bytes —
  * raw, zlib and gzip chunks all round-trip, ZarrSpec).
  */
object Zarr {

  /** One zarr array as a flat DataFrame: index columns named by
    * `_ARRAY_DIMENSIONS` + `value`. */
  def readArray(s: SparkSession, dir: String): DataFrame =
    s.read.format(classOf[ZarrDataSource].getName).load(dir)

  /** xarray `to_dataframe` analog over a zarr GROUP: the variable's
    * index columns are swapped for coordinate VALUES via broadcast
    * joins against the group's 1-D coordinate arrays (tiny by
    * construction — one value per index), exactly how the reference's
    * `ds.to_dataframe()` flattens (time, lat, lon) onto each row.
    * Dims with no stored coordinate array keep their integer index. */
  def toDataFrame(s: SparkSession, groupDir: String, varName: String): DataFrame = {
    val meta = ZarrMeta.read(s"$groupDir/$varName")
    joinCoords(s, groupDir, meta,
      readArray(s, s"$groupDir/$varName").withColumnRenamed("value", varName), varName)
  }

  /** MULTI-variable `to_dataframe` — xarray's actual flatten shape
    * (every data variable of the Dataset lands as a column on one
    * (dims..., var1, var2, …) table): same-dimensioned variables
    * equi-join on their INDEX columns before the coordinate join, so
    * the join keys are exact integers and the coords join once. At
    * scale each side is a chunk-partitioned scan and the index join
    * sort-merges; variables must share the lead variable's dims
    * EXACTLY (xarray broadcasts mismatched dims — this engine rejects
    * them loudly instead of silently exploding rows). */
  def toDataFrame(s: SparkSession, groupDir: String,
      varNames: Seq[String]): DataFrame = {
    require(varNames.nonEmpty, "toDataFrame: no variables named")
    val metas = varNames.map(v => v -> ZarrMeta.read(s"$groupDir/$v"))
    val lead = metas.head._2
    metas.foreach { case (v, m) =>
      require(m.dims.sameElements(lead.dims),
        s"toDataFrame($groupDir): variable '$v' has dims " +
          s"[${m.dims.mkString(",")}] != lead [${lead.dims.mkString(",")}] — " +
          "mismatched-dim variables need separate flattens (this engine " +
          "does not silently broadcast)")
    }
    val joined = metas.map { case (v, _) =>
      readArray(s, s"$groupDir/$v").withColumnRenamed("value", v)
    }.reduce(_.join(_, lead.dims.toSeq))
    joinCoordsMulti(s, groupDir, lead, joined, varNames)
  }

  /** Swap each index column for the group's stored coordinate values
    * (dims with no coordinate array keep their integer index). */
  private def joinCoords(s: SparkSession, groupDir: String, meta: ZarrMeta.Meta,
      in: DataFrame, varName: String): DataFrame =
    joinCoordsMulti(s, groupDir, meta, in, Seq(varName))

  private def joinCoordsMulti(s: SparkSession, groupDir: String,
      meta: ZarrMeta.Meta, in: DataFrame, varNames: Seq[String]): DataFrame = {
    var df = in
    meta.dims.foreach { dim =>
      if (ZarrMeta.hasArray(groupDir, dim)) {
        val coordDir = s"$groupDir/$dim"
        val idxCol = ZarrMeta.read(coordDir).dims.head
        val coord = readArray(s, coordDir)
          .select(col(idxCol).as(s"__${dim}_idx"), col("value").as(s"__${dim}_val"))
        df = df.join(broadcast(coord), df(dim) === coord(s"__${dim}_idx"))
          .drop(dim).drop(s"__${dim}_idx")
          .withColumnRenamed(s"__${dim}_val", dim)
      }
    }
    df.select(meta.dims.map(col).toSeq ++ varNames.map(col): _*)
  }

  /** Coordinate-VALUE slice, the reference's `sel(time=filtered_times)`
    * / filter-then-read (precipitation_pipeline.py:91-101): resolve the
    * [loVal, hiVal] range to an INDEX range through the dim's 1-D
    * coordinate array (tiny by construction — read once, driver-side,
    * exactly like xarray's index lookup), then apply it as an index
    * predicate on the variable scan so CHUNK PRUNING engages. Returns
    * the flattened frame of [[toDataFrame]] restricted to the slice;
    * only chunks intersecting the index range are ever read (pinned in
    * ZarrSpec via the partition count). */
  def sliceByCoord(s: SparkSession, groupDir: String, varName: String,
      dim: String, loVal: Double, hiVal: Double): DataFrame =
    sliceByCoordImpl(s, groupDir, varName, dim, lit(loVal), lit(hiVal))

  /** [[sliceByCoord]] over a TIMESTAMP-typed coordinate (a datetime64
    * or CF-units time axis): the reference's filter-times-THEN-read
    * (`sel(time=filtered_times)` after `pd.to_datetime`,
    * precipitation_pipeline.py:91-101) against the store's own time
    * encoding — the index range resolves through the decoded
    * coordinate, chunk pruning engages identically. */
  def sliceByTime(s: SparkSession, groupDir: String, varName: String,
      dim: String, loVal: java.time.Instant, hiVal: java.time.Instant): DataFrame =
    sliceByCoordImpl(s, groupDir, varName, dim,
      lit(java.sql.Timestamp.from(loVal)), lit(java.sql.Timestamp.from(hiVal)))

  private def sliceByCoordImpl(s: SparkSession, groupDir: String,
      varName: String, dim: String,
      loVal: org.apache.spark.sql.Column,
      hiVal: org.apache.spark.sql.Column): DataFrame = {
    val meta = ZarrMeta.read(s"$groupDir/$varName")
    val d = meta.dims.indexOf(dim)
    require(d >= 0, s"dim '$dim' not in ${meta.dims.mkString(",")}")
    val coordDir = s"$groupDir/$dim"
    require(ZarrMeta.hasArray(groupDir, dim),
      s"no coordinate array for dim '$dim'")
    val idxCol = ZarrMeta.read(coordDir).dims.head
    // the coord array is one value per index — driver-collecting the
    // matching index RANGE is the xarray .sel lookup, not a data read
    val bounds = readArray(s, coordDir)
      .filter(col("value") >= loVal && col("value") <= hiVal)
      .agg(min(col(idxCol)).as("lo"), max(col(idxCol)).as("hi")).head()
    if (bounds.isNullAt(0))
      return toDataFrame(s, groupDir, varName).limit(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    joinCoords(s, groupDir, meta,
      readArray(s, s"$groupDir/$varName")
        .filter(col(dim) >= lo && col(dim) <= hi) // pushes → chunk pruning
        .withColumnRenamed("value", varName), varName)
      // residual VALUE filter: the [lo,hi] index span is only exact on a
      // monotonic coordinate array; on a non-monotonic or sparse one the
      // span over-covers, so re-check the joined coordinate value — the
      // same rows xarray's sel(dim=filtered) would keep
      .filter(col(dim) >= loVal && col(dim) <= hiVal)
  }

  // ---------------------------------------------------------------- fixture

  /** Write one zarr v2 array: padded C-order chunks of `f(globalIdx)`,
    * `.zarray` + `.zattrs` metadata. `<f8` only (the fixture dtype);
    * ZarrSpec writes the other dtypes by hand. */
  private[graft] def writeArray(dir: String, shape: Array[Long], chunks: Array[Int],
      dims: Array[String], compressor: Option[String], fillValue: Double,
      f: Array[Long] => Double): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val compJson = ZarrCodec.json(compressor)
    Files.writeString(d.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
         |"chunks":[${chunks.mkString(",")}],"dtype":"<f8",
         |"compressor":$compJson,"fill_value":$fillValue,
         |"order":"C","filters":null}""".stripMargin)
    Files.writeString(d.resolve(".zattrs"),
      s"""{"_ARRAY_DIMENSIONS":[${dims.map("\"" + _ + "\"").mkString(",")}]}""")
    val n = shape.length
    val counts = shape.zip(chunks).map { case (s0, c) => ((s0 + c - 1) / c).toInt }
    val chunkElems = chunks.map(_.toLong).product.toInt
    def writeChunk(cc: Array[Int]): Unit = {
      val buf = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](n)
      (0 until chunkElems).foreach { p =>
        var rem = p.toLong
        var inBounds = true
        var dd = n - 1
        while (dd >= 0) {
          idx(dd) = cc(dd).toLong * chunks(dd) + rem % chunks(dd)
          rem /= chunks(dd)
          if (idx(dd) >= shape(dd)) inBounds = false
          dd -= 1
        }
        buf.putDouble(if (inBounds) f(idx) else fillValue) // padded edge
      }
      Files.write(d.resolve(cc.mkString(".")),
        ZarrCodec.compress(buf.array(), compressor))
      ()
    }
    def expand(dd: Int, acc: Array[Int]): Unit =
      if (dd == n) writeChunk(acc)
      else (0 until counts(dd)).foreach(c => expand(dd + 1, acc :+ c))
    expand(0, Array.empty)
  }

  /** Fixture-grade TYPED zarr v2 array writer: any supported dtype
    * (incl. `<M8[unit]` datetime64 and big-endian twins) plus extra
    * `.zattrs` entries (CF `units`/`calendar` — values are JSON
    * literals, pre-quoted by the caller). `f` returns the element as
    * a Double — exact for every fixture magnitude used (datetime64
    * counts in minutes/hours/seconds stay far below 2^53). A NaN
    * `fillValue` writes JSON null (NaT for datetime64). */
  private[graft] def writeArrayTyped(dir: String, shape: Array[Long],
      chunks: Array[Int], dims: Array[String], compressor: Option[String],
      dtype: String, fillValue: Double, f: Array[Long] => Double,
      extraAttrs: Map[String, String] = Map.empty): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val big = dtype.head == '>'
    val kind = if (dtype.drop(1).startsWith("M8")) "M8" else dtype.drop(1)
    val esize = kind match {
      case "M8" | "i8" | "f8" => 8
      case "f4" | "i4" => 4
      case "i2" => 2
      case "i1" | "u1" | "b1" => 1
    }
    def put(buf: ByteBuffer, off: Int, v: Double): Unit = kind match {
      case "f8" => buf.putDouble(off, v)
      case "f4" => buf.putFloat(off, v.toFloat)
      case "i8" | "M8" => buf.putLong(off, v.toLong)
      case "i4" => buf.putInt(off, v.toInt)
      case "i2" => buf.putShort(off, v.toShort)
      case "i1" => buf.put(off, v.toByte)
      case "u1" => buf.put(off, (v.toInt & 0xFF).toByte)
      case "b1" => buf.put(off, if (v != 0.0) 1.toByte else 0.toByte)
    }
    val fillJson = if (fillValue.isNaN) "null" else fillValue.toString
    Files.writeString(d.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
         |"chunks":[${chunks.mkString(",")}],"dtype":"$dtype",
         |"compressor":${ZarrCodec.json(compressor)},"fill_value":$fillJson,
         |"order":"C","filters":null}""".stripMargin)
    val attrs = (s""""_ARRAY_DIMENSIONS":[${dims.map("\"" + _ + "\"").mkString(",")}]""" +:
      extraAttrs.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" })
      .mkString(",")
    Files.writeString(d.resolve(".zattrs"), s"{$attrs}")
    val n = shape.length
    val counts = shape.zip(chunks).map { case (s0, c) => ((s0 + c - 1) / c).toInt }
    val chunkElems = chunks.map(_.toLong).product.toInt
    def writeChunk(cc: Array[Int]): Unit = {
      val buf = ByteBuffer.allocate(chunkElems * esize)
        .order(if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](n)
      (0 until chunkElems).foreach { p =>
        var rem = p.toLong
        var inBounds = true
        var dd = n - 1
        while (dd >= 0) {
          idx(dd) = cc(dd).toLong * chunks(dd) + rem % chunks(dd)
          rem /= chunks(dd)
          if (idx(dd) >= shape(dd)) inBounds = false
          dd -= 1
        }
        put(buf, p * esize, if (inBounds) f(idx) else 0.0) // padded edge
      }
      Files.write(d.resolve(cc.mkString(".")),
        ZarrCodec.compress(buf.array(), compressor, esize))
      ()
    }
    def expand(dd: Int, acc: Array[Int]): Unit =
      if (dd == n) writeChunk(acc)
      else (0 until counts(dd)).foreach(c => expand(dd + 1, acc :+ c))
    expand(0, Array.empty)
  }

  /** Fixture-grade zarr FORMAT 3 array writer (`zarr.json`, `default`
    * c/-prefixed chunk keys, `bytes`+optional bytes→bytes codec chain,
    * `dimension_names`) — enough surface to build v3 stores the READ
    * path is graded against (q_scan_zarr_v3 + the ZarrSpec goldens);
    * production writes stay v2 ([[writeArrayDistributed]]), which
    * zarr-python 2 AND 3 both read. Chunk encoding shares
    * [[ZarrCodec]] with the v2 writer, so the two formats cannot
    * drift. */
  private[graft] def writeArrayV3(dir: String, shape: Array[Long],
      chunks: Array[Int], dims: Array[String], compressor: Option[String],
      fillValue: Double, f: Array[Long] => Double,
      order: Option[Array[Int]] = None, checksum: Boolean = false): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val tp = order.map(o =>
      s"""{"name":"transpose","configuration":{"order":[${o.mkString(",")}]}},""")
      .getOrElse("")
    val bb = compressor match {
      case None => ""
      case Some("gzip") => """,{"name":"gzip","configuration":{"level":5}}"""
      case Some("zstd") =>
        """,{"name":"zstd","configuration":{"level":5,"checksum":false}}"""
      case Some("blosc:zstd") =>
        """,{"name":"blosc","configuration":{"cname":"zstd","clevel":5,""" +
          """"shuffle":"bitshuffle","typesize":8,"blocksize":0}}"""
      case Some(other) =>
        throw new IllegalArgumentException(s"v3 fixture codec $other")
    }
    val cs = if (checksum) """,{"name":"crc32c"}""" else ""
    Files.writeString(d.resolve("zarr.json"),
      s"""{"zarr_format":3,"node_type":"array",
         |"shape":[${shape.mkString(",")}],"data_type":"float64",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${chunks.mkString(",")}]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillValue,
         |"codecs":[$tp{"name":"bytes","configuration":{"endian":"little"}}$bb$cs],
         |"dimension_names":[${dims.map("\"" + _ + "\"").mkString(",")}],
         |"attributes":{}}""".stripMargin)
    val n = shape.length
    val counts = shape.zip(chunks).map { case (s0, c) => ((s0 + c - 1) / c).toInt }
    val chunkElems = chunks.map(_.toLong).product.toInt
    def writeChunk(cc: Array[Int]): Unit = {
      val buf = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](n)
      val off = new Array[Int](n)
      (0 until chunkElems).foreach { p =>
        var rem = p.toLong
        var inBounds = true
        var dd = n - 1
        while (dd >= 0) {
          off(dd) = (rem % chunks(dd)).toInt
          idx(dd) = cc(dd).toLong * chunks(dd) + off(dd)
          rem /= chunks(dd)
          if (idx(dd) >= shape(dd)) inBounds = false
          dd -= 1
        }
        // transpose codec: the stored buffer is the chunk permuted by
        // `order` — element (off) lands at the C-order position of
        // the permuted offsets over the permuted chunk shape
        val sp = order match {
          case None => p.toLong
          case Some(o) =>
            var bp = 0L
            var k = 0
            while (k < n) { bp = bp * chunks(o(k)) + off(o(k)); k += 1 }
            bp
        }
        buf.putDouble((sp * 8).toInt, if (inBounds) f(idx) else fillValue)
      }
      val enc0 = ZarrCodec.compress(buf.array(), compressor)
      // crc32c codec: 4-byte little-endian checksum trailer over the
      // encoded payload
      val enc = if (!checksum) enc0 else {
        val crc = new java.util.zip.CRC32C()
        crc.update(enc0, 0, enc0.length)
        val out = java.util.Arrays.copyOf(enc0, enc0.length + 4)
        ByteBuffer.wrap(out, enc0.length, 4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(crc.getValue.toInt)
        out
      }
      // v3 "default" keys nest: c/0/1/2 is a directory path
      val p = d.resolve("c/" + cc.mkString("/"))
      Files.createDirectories(p.getParent)
      Files.write(p, enc)
      ()
    }
    def expand(dd: Int, acc: Array[Int]): Unit =
      if (dd == n) writeChunk(acc)
      else (0 until counts(dd)).foreach(c => expand(dd + 1, acc :+ c))
    expand(0, Array.empty)
  }

  /** Fixture-grade zarr v3 `sharding_indexed` array writer: each
    * stored object is a SHARD of `shardShape` elements packing its
    * inner `chunks`-shaped chunks C-order-contiguously, followed by
    * the uint64 little-endian (offset, nbytes) index + crc32c
    * trailer (`index_location: end`, `index_codecs: [bytes, crc32c]`
    * — what zarr-python 3.x writes by default for large arrays).
    * Inner chunks listed in `omit` are left unwritten: their index
    * entries hold the all-ones sentinel and every element reads as
    * the fill value — the shard-level sparse-store contract. */
  private[graft] def writeArrayV3Sharded(dir: String, shape: Array[Long],
      shardShape: Array[Int], chunks: Array[Int], dims: Array[String],
      compressor: Option[String], fillValue: Double,
      f: Array[Long] => Double, omit: Set[Seq[Int]] = Set.empty): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val n = shape.length
    require(shardShape.length == n && chunks.length == n)
    shardShape.indices.foreach(i => require(shardShape(i) % chunks(i) == 0,
      s"shard ${shardShape.mkString("x")} not a multiple of inner " +
        s"chunk ${chunks.mkString("x")}"))
    val bb = compressor match {
      case None => ""
      case Some("gzip") => """,{"name":"gzip","configuration":{"level":5}}"""
      case Some("zstd") =>
        """,{"name":"zstd","configuration":{"level":5,"checksum":false}}"""
      case Some(other) =>
        throw new IllegalArgumentException(s"v3 shard fixture codec $other")
    }
    Files.writeString(d.resolve("zarr.json"),
      s"""{"zarr_format":3,"node_type":"array",
         |"shape":[${shape.mkString(",")}],"data_type":"float64",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${shardShape.mkString(",")}]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillValue,
         |"codecs":[{"name":"sharding_indexed","configuration":{
         |"chunk_shape":[${chunks.mkString(",")}],
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}}$bb],
         |"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
         |"index_location":"end"}}],
         |"dimension_names":[${dims.map("\"" + _ + "\"").mkString(",")}],
         |"attributes":{}}""".stripMargin)
    val shardCounts =
      shape.zip(shardShape).map { case (s0, c) => ((s0 + c - 1) / c).toInt }
    val cps = shardShape.zip(chunks).map { case (s0, c) => s0 / c } // chunks/shard per dim
    val nEntries = cps.map(_.toLong).product.toInt
    val chunkElems = chunks.map(_.toLong).product.toInt
    def innerBytes(sc: Array[Int], ic: Array[Int]): Array[Byte] = {
      val buf = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](n)
      (0 until chunkElems).foreach { p =>
        var rem = p.toLong
        var inBounds = true
        var dd = n - 1
        while (dd >= 0) {
          idx(dd) = sc(dd).toLong * shardShape(dd) +
            ic(dd).toLong * chunks(dd) + rem % chunks(dd)
          rem /= chunks(dd)
          if (idx(dd) >= shape(dd)) inBounds = false
          dd -= 1
        }
        buf.putDouble(if (inBounds) f(idx) else fillValue)
      }
      ZarrCodec.compress(buf.array(), compressor)
    }
    def writeShard(sc: Array[Int]): Unit = {
      val data = new java.io.ByteArrayOutputStream()
      val index = ByteBuffer.allocate(nEntries * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      def innerExpand(dd: Int, acc: Array[Int]): Unit =
        if (dd == n) {
          val globalInner = acc.indices.map(i => sc(i) * cps(i) + acc(i))
          if (omit(globalInner)) { index.putLong(-1L); index.putLong(-1L) }
          else {
            val enc = innerBytes(sc, acc)
            index.putLong(data.size().toLong)
            index.putLong(enc.length.toLong)
            data.write(enc)
          }
        } else (0 until cps(dd)).foreach(c => innerExpand(dd + 1, acc :+ c))
      innerExpand(0, Array.empty)
      val crc = new java.util.zip.CRC32C()
      crc.update(index.array(), 0, nEntries * 16)
      val trailer = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(crc.getValue.toInt)
      val p = d.resolve("c/" + sc.mkString("/"))
      Files.createDirectories(p.getParent)
      val out = new java.io.ByteArrayOutputStream()
      out.write(data.toByteArray)
      out.write(index.array())
      out.write(trailer.array())
      Files.write(p, out.toByteArray)
      ()
    }
    def expand(dd: Int, acc: Array[Int]): Unit =
      if (dd == n) writeShard(acc)
      else (0 until shardCounts(dd)).foreach(c => expand(dd + 1, acc :+ c))
    expand(0, Array.empty)
  }

  /** Test instrumentation for the sink's memory bound: live chunk
    * buffers across all sink tasks in this JVM (meaningful on
    * local[n], where tasks share the process). The flush-on-key-change
    * writer holds at most ONE buffer per task, so the high-water mark
    * is bounded by the number of concurrently RUNNING tasks — never by
    * chunks owned (pinned in ZarrSpec). OFF by default: production
    * writes pay one boolean read per chunk, nothing else; only the
    * spec flips `instrumentSink` on (so a failed task can't leak a
    * count into anyone else's measurement either). */
  private[graft] val instrumentSink = new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val liveBuffers = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] val liveBuffersHighWater = new java.util.concurrent.atomic.AtomicInteger(0)

  /** DISTRIBUTED zarr sink — the write side of the connector, chunked
    * the same way the read side parallelizes: every row is keyed by
    * its chunk coordinate, rows repartition so each chunk's rows land
    * in ONE task AND sort within the task by chunk key, so the task
    * streams chunk-by-chunk: materialize one fill-initialized buffer,
    * fill it, flush it through the shared [[ZarrCodec]] when the key
    * changes, reuse nothing. One shuffle (the sort rides the shuffle's
    * spill machinery, no extra exchange), chunk = write unit = the
    * store's own layout, task memory bounded by ONE chunk buffer
    * regardless of how many chunks hash to the task.
    *
    * Each chunk file is written to a task-attempt-unique temp name and
    * atomically renamed into place, so a zombie or speculative task
    * attempt can never interleave bytes with the committed writer —
    * last rename wins with a complete chunk either way.
    *
    * `df` must carry `dims` columns of integral indices in
    * [0, shape_d) plus a `value` column castable to double (the
    * shuffle carries doubles; the task encodes to `dtype` at put
    * time with LOUD range/integrality checks — exact for f8 and for
    * every integer dtype within double's 2^53 integer range, which
    * the i8 check enforces). Files land on the task's filesystem —
    * correct on local[n]; a multi-node deployment points `dir` at
    * shared storage, a config (not code) change, same as every file
    * sink here. */
  def writeArrayDistributed(df: DataFrame, dir: String, shape: Array[Long],
      chunks: Array[Int], dims: Array[String], compressor: Option[String] = Some("zlib"),
      fillValue: Double = 0.0, dtype: String = "<f8"): Unit = {
    require(dims.length == shape.length && shape.length == chunks.length,
      s"rank mismatch: dims=${dims.length} shape=${shape.length} chunks=${chunks.length}")
    val kind = dtype.drop(1)
    require(dtype.head == '<' &&
        Set("f8", "f4", "i8", "i4", "i2", "i1", "u1", "b1")(kind),
      s"sink dtype '$dtype' unsupported (<f8/<f4/<i8/<i4/<i2/<i1/<u1/<b1)")
    val esize = ZarrMeta.elemSizeOf(dtype)
    require(chunks.map(_.toLong).product * esize <= Int.MaxValue,
      s"chunk of ${chunks.mkString("x")} $dtype elements exceeds the 2^31-1 " +
        "byte buffer bound; pick smaller chunks")
    val d = Paths.get(dir)
    Files.createDirectories(d)
    // sweep temp files orphaned by a PREVIOUS write's hard-killed task
    // attempts (a task dying between createTempFile and the atomic
    // move never runs its finally) — without this an overwritten store
    // accumulates `.<key>.<rand>.tmp` junk forever. Files.list holds a
    // directory handle — close it or leak one fd per write job.
    val tmpListing = Files.list(d)
    try tmpListing.iterator().asScala
      .filter { p =>
        val nm = p.getFileName.toString
        nm.startsWith(".") && nm.endsWith(".tmp")
      }
      .foreach(p => Files.deleteIfExists(p))
    finally tmpListing.close()
    val compJson = ZarrCodec.json(compressor)
    // 1-byte dtypes carry numpy's '|' order char in stored metadata
    val dtypeJson = if (esize == 1) "|" + kind else dtype
    Files.writeString(d.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
         |"chunks":[${chunks.mkString(",")}],"dtype":"$dtypeJson",
         |"compressor":$compJson,"fill_value":$fillValue,
         |"order":"C","filters":null}""".stripMargin)
    Files.writeString(d.resolve(".zattrs"),
      s"""{"_ARRAY_DIMENSIONS":[${dims.map("\"" + _ + "\"").mkString(",")}]}""")
    // chunk key: "c0.c1...." — nonneg indices, so `div` IS floor
    val chunkKey = concat_ws(".",
      dims.zip(chunks).map { case (dm, c) =>
        expr(s"CAST(`$dm` AS BIGINT) div $c").cast("string") }: _*)
    val n = shape.length
    val (shapeC, chunksC, dimsC, dirC, compC, fillC) =
      (shape, chunks, dims, dir, compressor, fillValue)
    val (kindC, esizeC) = (kind, esize)
    df.select(dims.map(c => col(c).cast("long").as(c)) :+
        col("value").cast("double").as("value"): _*)
      .withColumn("_chunk", chunkKey)
      .repartition(col("_chunk"))
      .sortWithinPartitions("_chunk")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val chunkElems = chunksC.map(_.toLong).product.toInt
        // dtype encoder: double → stored element, LOUD on any value
        // the dtype cannot hold exactly (silent truncation is the one
        // unacceptable outcome on the write side too)
        def checkInt(v: Double, lo: Double, hi: Double): Long = {
          require(v == math.rint(v) && v >= lo && v <= hi,
            s"value $v not an exact $kindC integer in [$lo, $hi]")
          v.toLong
        }
        def putAt(buf: ByteBuffer, off: Int, v: Double): Unit = kindC match {
          case "f8" => buf.putDouble(off, v)
          case "f4" => buf.putFloat(off, v.toFloat)
          case "i8" => // double holds integers exactly only to 2^53
            buf.putLong(off, checkInt(v, -9007199254740992.0, 9007199254740992.0))
          case "i4" => buf.putInt(off, checkInt(v, Int.MinValue, Int.MaxValue).toInt)
          case "i2" => buf.putShort(off, checkInt(v, Short.MinValue, Short.MaxValue).toShort)
          case "i1" => buf.put(off, checkInt(v, Byte.MinValue, Byte.MaxValue).toByte)
          case "u1" => buf.put(off, checkInt(v, 0, 255).toByte)
          case "b1" => buf.put(off, checkInt(v, 0, 1).toByte)
        }
        // captured ONCE per task: a write straddling the spec's on/off
        // window must pair its increment and decrement consistently
        val instrumented = instrumentSink.get
        var key: String = null
        var buf: ByteBuffer = null
        def flush(): Unit = if (buf != null) {
          val target = Paths.get(dirC, key)
          val tmp = Files.createTempFile(target.getParent, s".$key.", ".tmp")
          // a failure between the temp create and the move (codec
          // error, disk full, task kill that still unwinds the stack)
          // must not strand the temp file; after a successful move the
          // delete is a no-op on an absent path
          try {
            Files.write(tmp, ZarrCodec.compress(buf.array(), compC, esizeC))
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } finally Files.deleteIfExists(tmp)
          buf = null
          if (instrumented) liveBuffers.decrementAndGet()
          ()
        }
        rows.foreach { r =>
          val k = r.getString(n + 1)
          if (k != key) { // sorted by key: each chunk appears exactly once
            flush()
            key = k
            buf = ByteBuffer.allocate(chunkElems * esizeC)
              .order(ByteOrder.LITTLE_ENDIAN)
            var i = 0
            while (i < chunkElems) { putAt(buf, i * esizeC, fillC); i += 1 }
            if (instrumented) {
              val live = liveBuffers.incrementAndGet()
              var hw = liveBuffersHighWater.get()
              while (live > hw && !liveBuffersHighWater.compareAndSet(hw, live))
                hw = liveBuffersHighWater.get()
            }
          }
          // C-order position of the row within its chunk
          var p = 0L
          var dd = 0
          while (dd < n) {
            val idx = r.getLong(dd)
            require(idx >= 0 && idx < shapeC(dd),
              s"${dimsC(dd)}=$idx outside [0, ${shapeC(dd)})")
            p = p * chunksC(dd) + (idx % chunksC(dd))
            dd += 1
          }
          putAt(buf, (p * esizeC).toInt, r.getDouble(n))
        }
        flush()
      }
  }

  /** DISTRIBUTED zarr v3 SHARDED sink — the write side of
    * `sharding_indexed`, the layout zarr-python 3.x emits for large
    * arrays (so the 100 TB cube a user writes through this engine is
    * the same object the rest of their v3 tooling reads). Rows key by
    * SHARD coordinate and repartition so each shard lands in one
    * task, sorted by (shard, inner-chunk) so the task streams: one
    * fill-initialized INNER-chunk buffer at a time, each compressed
    * inner chunk APPENDED straight to the shard file as it closes —
    * the shard is never materialized in memory (the exact mirror of
    * the read side's range-read posture, so shards may exceed the
    * 2^31-1 single-buffer bound that still guards the inner chunk).
    * Task memory = one inner-chunk buffer + the 16-byte/entry index.
    *
    * Inner chunks with no rows keep the all-ones sentinel in the
    * index (readers serve fill); shards with no rows are never
    * created (absent key = fill, per spec). The index is written at
    * `index_location=end` behind its crc32c, `bytes`+`crc32c` index
    * codecs — byte-compatible with [[writeArrayV3Sharded]]'s goldens
    * and zarr-python's default shard layout. Each shard builds in a
    * task-attempt-unique temp file and atomically renames into place
    * (zombie/speculative attempts can't interleave bytes).
    *
    * OVERWRITE semantics (non-destructive, r17): rewriting an
    * EXISTING store (a `zarr.json` is present) stages the complete
    * new store into a sibling `<dir>.__rewrite.tmp` directory and
    * swaps it in only once fully written — a failed rewrite leaves
    * the PRIOR store readable and untouched (the tmp-staging posture
    * the non-sharded sink already had, now store-wide). The swap is
    * two atomic renames (old → `<dir>.__old.tmp`, staged → `<dir>`);
    * a crash exactly between them leaves the prior store intact
    * under `.__old.tmp` — recoverable by hand, and a vanishingly
    * smaller window than the whole distributed write. Stale staging
    * dirs from an aborted earlier attempt are swept up front. A
    * FRESH write (no prior `zarr.json`) writes in place and
    * publishes `zarr.json` only after every shard lands, so a
    * mid-write crash reads as "no store" — never as fill-valued
    * data (v3 treats absent shards as fill, so premature metadata
    * over missing shards would serve WRONG values silently). */
  def writeArrayV3ShardedDistributed(df: DataFrame, dir: String,
      shape: Array[Long], shardShape: Array[Int], chunks: Array[Int],
      dims: Array[String], compressor: Option[String] = Some("zstd"),
      fillValue: Double = 0.0): Unit = {
    val n = shape.length
    require(dims.length == n && shardShape.length == n && chunks.length == n,
      s"rank mismatch: dims=${dims.length} shape=$n " +
        s"shard=${shardShape.length} chunks=${chunks.length}")
    shardShape.indices.foreach(i => require(shardShape(i) % chunks(i) == 0,
      s"shard ${shardShape.mkString("x")} not a multiple of inner " +
        s"chunk ${chunks.mkString("x")}"))
    require(chunks.map(_.toLong).product * 8 <= Int.MaxValue,
      s"inner chunk of ${chunks.mkString("x")} f8 elements exceeds the " +
        "2^31-1 byte buffer bound; pick smaller inner chunks")
    val cps = shardShape.zip(chunks).map { case (s0, c) => s0 / c }
    val nEntries = cps.map(_.toLong).product
    require(nEntries * 16 <= Int.MaxValue,
      s"$nEntries inner chunks per shard need a ${nEntries * 16}-byte " +
        "index buffer; pick a smaller shard/inner-chunk ratio")
    val d = Paths.get(dir)
    if (Files.exists(d.resolve("zarr.json"))) {
      // REWRITE path: build the replacement store COMPLETELY in a
      // sibling staging dir (recursing hits the fresh-write path
      // there), then swap. Any failure before the swap leaves the
      // prior store byte-untouched.
      val name = d.getFileName.toString
      val staged = d.resolveSibling(name + ".__rewrite.tmp")
      val old = d.resolveSibling(name + ".__old.tmp")
      graft.sources.IO.rmTree(staged.toString) // stale aborted attempt
      graft.sources.IO.rmTree(old.toString)
      try writeArrayV3ShardedDistributed(df, staged.toString, shape,
        shardShape, chunks, dims, compressor, fillValue)
      catch { case e: Throwable =>
        // the prior store was never touched; drop the partial staging
        graft.sources.IO.rmTree(staged.toString)
        throw e
      }
      Files.move(d, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      try Files.move(staged, d, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case e: Throwable =>
        // restore the prior store before surfacing the failure
        Files.move(old, d, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        throw e
      }
      graft.sources.IO.rmTree(old.toString)
      return
    }
    Files.createDirectories(d)
    // sweep temp files orphaned by a previous write's hard-killed
    // attempts (same hygiene as the v2 sink)
    val tmpListing = Files.list(d)
    try tmpListing.iterator().asScala
      .filter { p =>
        val nm = p.getFileName.toString
        nm.startsWith(".") && nm.endsWith(".tmp")
      }
      .foreach(p => Files.deleteIfExists(p))
    finally tmpListing.close()
    val bb = compressor match {
      case None => ""
      case Some("gzip") => """,{"name":"gzip","configuration":{"level":5}}"""
      case Some("zstd") =>
        """,{"name":"zstd","configuration":{"level":5,"checksum":false}}"""
      case Some(other) => throw new IllegalArgumentException(
        s"v3 sharded sink supports gzip/zstd/none inner codecs, not $other")
    }
    // v3 treats an ABSENT shard as fill, so a store whose zarr.json
    // exists before the data does reads back "successfully" with fill
    // where unwritten shards belong — a mid-write crash would be
    // indistinguishable from a complete write. Store-level commit
    // discipline to match the per-shard temp+atomic-rename: build the
    // metadata string now, write it only AFTER the foreachPartition
    // action below returns (every shard renamed into place). Until
    // then the directory has no zarr.json and readers refuse it; a
    // stale zarr.json from an aborted earlier attempt is removed
    // up front for the same reason.
    Files.deleteIfExists(d.resolve("zarr.json"))
    val metaJson =
      s"""{"zarr_format":3,"node_type":"array",
         |"shape":[${shape.mkString(",")}],"data_type":"float64",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${shardShape.mkString(",")}]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fillValue,
         |"codecs":[{"name":"sharding_indexed","configuration":{
         |"chunk_shape":[${chunks.mkString(",")}],
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}}$bb],
         |"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
         |"index_location":"end"}}],
         |"dimension_names":[${dims.map("\"" + _ + "\"").mkString(",")}],
         |"attributes":{}}""".stripMargin
    // shard key "s0/s1/..." (names the file under c/); inner-chunk
    // C-order linear index within the shard (groups + orders the
    // stream inside each shard). Nonneg indices, so `div` IS floor.
    val shardKey = concat_ws("/",
      dims.zip(shardShape).map { case (dm, c) =>
        expr(s"CAST(`$dm` AS BIGINT) div $c").cast("string") }: _*)
    val innerExprSql = dims.indices.map { i =>
      s"((CAST(`${dims(i)}` AS BIGINT) % ${shardShape(i)}) div ${chunks(i)})"
    }.zipWithIndex.map { case (e, i) =>
      val mult = (i + 1 until n).map(j => cps(j).toLong).product
      s"$e * ${mult}L"
    }.mkString(" + ")
    val (shapeC, chunksC, dimsC, dirC, compC, fillC) =
      (shape, chunks, dims, dir, compressor, fillValue)
    val nEntriesI = nEntries.toInt
    df.select(dims.map(c => col(c).cast("long").as(c)) :+
        col("value").cast("double").as("value"): _*)
      .withColumn("_shard", shardKey)
      .withColumn("_inner", expr(innerExprSql))
      .repartition(col("_shard"))
      .sortWithinPartitions("_shard", "_inner")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val chunkElems = chunksC.map(_.toLong).product.toInt
        val dRoot = Paths.get(dirC)
        var curShard: String = null
        var tmp: java.nio.file.Path = null
        var ch: java.nio.channels.FileChannel = null
        var index: ByteBuffer = null
        var written = 0L
        var curInner = -1L
        var buf: ByteBuffer = null
        def flushInner(): Unit = if (buf != null) {
          val enc = ZarrCodec.compress(buf.array(), compC)
          index.putLong((curInner * 16).toInt, written)
          index.putLong((curInner * 16 + 8).toInt, enc.length.toLong)
          val w = ch.write(ByteBuffer.wrap(enc))
          require(w == enc.length, s"short write: $w of ${enc.length}")
          written += enc.length
          buf = null
        }
        def finalizeShard(): Unit = if (ch != null) {
          try {
            flushInner()
            val crc = new java.util.zip.CRC32C()
            crc.update(index.array(), 0, nEntriesI * 16)
            // index_location=end: a short write here silently corrupts
            // the layout readers seek to — guard like the inner chunks
            val wi = ch.write(ByteBuffer.wrap(index.array()))
            require(wi == nEntriesI * 16,
              s"short index write: $wi of ${nEntriesI * 16}")
            val trailer = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            trailer.putInt(crc.getValue.toInt)
            trailer.flip()
            val wt = ch.write(trailer)
            require(wt == 4, s"short crc32c trailer write: $wt of 4")
            ch.close()
            ch = null
            val target = dRoot.resolve("c/" + curShard)
            Files.createDirectories(target.getParent)
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } finally {
            if (ch != null) { ch.close(); ch = null }
            if (tmp != null) { Files.deleteIfExists(tmp); tmp = null }
          }
        }
        try {
          rows.foreach { r =>
            val sk = r.getString(dimsC.length + 1)
            val ik = r.getLong(dimsC.length + 2)
            if (sk != curShard) { // sorted: each shard appears exactly once
              finalizeShard()
              curShard = sk
              curInner = -1L
              written = 0L
              tmp = Files.createTempFile(dRoot,
                s".${sk.replace('/', '.')}.", ".tmp")
              ch = java.nio.channels.FileChannel.open(tmp,
                java.nio.file.StandardOpenOption.WRITE,
                java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
              index = ByteBuffer.allocate(nEntriesI * 16)
                .order(ByteOrder.LITTLE_ENDIAN)
              java.util.Arrays.fill(index.array(), 0xFF.toByte) // sentinel
            }
            if (ik != curInner) { // sorted: each inner chunk appears once
              flushInner()
              curInner = ik
              buf = ByteBuffer.allocate(chunkElems * 8)
                .order(ByteOrder.LITTLE_ENDIAN)
              var i = 0
              while (i < chunkElems) { buf.putDouble(i * 8, fillC); i += 1 }
            }
            // C-order position of the row within its INNER chunk
            var p = 0L
            var dd = 0
            while (dd < dimsC.length) {
              val idx = r.getLong(dd)
              require(idx >= 0 && idx < shapeC(dd),
                s"${dimsC(dd)}=$idx outside [0, ${shapeC(dd)})")
              p = p * chunksC(dd) + (idx % chunksC(dd))
              dd += 1
            }
            buf.putDouble((p * 8).toInt, r.getDouble(dimsC.length))
          }
          finalizeShard()
        } finally {
          // a failure mid-shard must not strand the temp file or fd
          if (ch != null) { ch.close(); ch = null }
          if (tmp != null) Files.deleteIfExists(tmp)
        }
      }
    // every shard atomically renamed into place — only now publish
    // the store (the store-level half of the commit discipline)
    Files.writeString(d.resolve("zarr.json"), metaJson)
  }

  /** GROUP-level distributed sink — the write shape of the reference's
    * store (variable array + one 1-D coordinate array per dim +
    * consolidated metadata, precipitation_pipeline.py:79-86), i.e. the
    * xarray `Dataset.to_zarr(consolidated=True)` analog: `df` carries
    * coordinate VALUE columns (what a flattened to_dataframe frame
    * looks like), and this sink factorizes each dim into its sorted
    * distinct values (the index — tiny by construction, one value per
    * index, the same driver-side footprint as xarray's index objects),
    * writes the coordinate arrays, maps rows to integer indices via
    * broadcast joins against those same values, streams the variable
    * through [[writeArrayDistributed]] (one shuffle, one chunk buffer
    * per task), and consolidates `.zmetadata`. Round trip:
    * [[toDataFrame]] over the written group returns `df` exactly
    * (pinned by the q_sink_zarr_group oracle). */
  def writeGroupDistributed(df: DataFrame, groupDir: String, varName: String,
      dims: Seq[String], chunks: Array[Int], compressor: Option[String] = Some("zlib"),
      fillValue: Double = 0.0, maxIndexSize: Int = 1 << 22): Unit = {
    val s = df.sparkSession
    // TIME-typed dims round-trip: a TimestampType dim factorizes on
    // its epoch-MICROS value (exact in double through year ~2255 —
    // guarded below) and its coordinate array writes as `<M8[us]`
    // datetime64, so toDataFrame over the written group returns the
    // same TimestampType column — never a silently-retyped double
    val isTs: Map[String, Boolean] = dims.map(dm =>
      dm -> (df.schema(dm).dataType == org.apache.spark.sql.types.TimestampType)).toMap
    def keyExpr(dm: String): org.apache.spark.sql.Column =
      if (isTs(dm)) unix_micros(col(dm)).cast("double")
      else col(dm).cast("double")
    // CARDINALITY pre-flight: the factorized index is one value per
    // distinct coordinate (the xarray index object — driver-resident
    // and broadcast). A non-grid column (a measurement mistyped as a
    // dim) has corpus-scale cardinality and would OOM the driver in
    // the collect_set pass below; a cheap approx_count_distinct pass
    // (narrow scan, tiny result) fails loudly FIRST. The 5% HLL error
    // is irrelevant at the bound's magnitude; default 2^22 values/dim
    // (~32 MB of f8 per coordinate array) is far beyond any real grid
    // axis and still broadcast-safe.
    val cards = df.agg(
      approx_count_distinct(col(dims.head)).as(dims.head),
      dims.tail.map(dm => approx_count_distinct(col(dm)).as(dm)): _*).head()
    dims.zipWithIndex.foreach { case (dm, i) =>
      val c = cards.getLong(i)
      require(c <= maxIndexSize,
        s"writeGroupDistributed($groupDir): dim '$dm' has ~$c distinct " +
          s"values (> maxIndexSize=$maxIndexSize) — a coordinate axis this " +
          "large is almost certainly a measurement column mistyped as a " +
          "dim; a factorized index must stay driver/broadcast-sized")
    }
    // ONE factorization pass for every dim (collect_set per dim in a
    // single aggregate), not one distinct-scan per dim — at 100 TB the
    // input is read three times total (cardinality pre-flight,
    // factorize, write), never 2 + rank times. Driver footprint
    // identical to per-dim distinct: one value per index, the xarray
    // index object, bounded by the pre-flight above.
    // the same pass also counts rows and per-dim nulls: collect_set
    // silently DROPS null elements, so an unguarded null coordinate
    // would sail through factorization and die much later in the
    // drift check with a misleading "non-deterministic input" message;
    // an empty input would reach writeArray with a zero-length shape
    // and throw a raw arithmetic error. Both fail loudly here instead.
    // the null count is over the CAST value — a string dim whose value
    // casts to null (e.g. "2020-01") must trip this guard too, not
    // just a literal null in the source column
    val aggs = dims.map(dm => collect_set(keyExpr(dm)).as(dm)) ++
      dims.map(dm =>
        count(when(keyExpr(dm).isNull, 1)).as(s"__nulls_$dm")) :+
      count(lit(1)).as("__n")
    val sets = df.agg(aggs.head, aggs.tail: _*).head()
    require(sets.getLong(2 * dims.length) > 0,
      s"writeGroupDistributed($groupDir): empty input — no rows to factorize " +
        "coordinates from; a zarr group needs at least one cell")
    dims.zipWithIndex.foreach { case (dm, i) =>
      val nulls = sets.getLong(dims.length + i)
      require(nulls == 0,
        s"writeGroupDistributed($groupDir): dim '$dm' has $nulls null coordinate " +
          "value(s) — a null cannot be factorized into a coordinate index; " +
          "filter or fill nulls before the sink")
    }
    val coordVals: Map[String, Array[Double]] = dims.zipWithIndex.map {
      case (dm, i) => dm -> sets.getSeq[Double](i).toArray.sorted
    }.toMap
    dims.foreach { dm =>
      val vals = coordVals(dm)
      if (isTs(dm)) {
        // epoch-micros exactness bound for the double-keyed factorize
        require(vals.forall(v => math.abs(v) < 9007199254740992.0),
          s"writeGroupDistributed($groupDir): dim '$dm' carries a timestamp " +
            "beyond ±2^53 µs (~year 2255) — the double-keyed factorization " +
            "would round it")
        writeArrayTyped(s"$groupDir/$dm", Array(vals.length.toLong),
          Array(vals.length), Array(dm), None, "<M8[us]", Double.NaN,
          i => vals(i(0).toInt))
      } else
        writeArray(s"$groupDir/$dm", Array(vals.length.toLong),
          Array(vals.length), Array(dm), None, 0.0, i => vals(i(0).toInt))
    }
    var indexed = df.select(
      dims.map(dm => keyExpr(dm).as(dm)) :+
        col("value").cast("double").as("value"): _*)
    dims.foreach { dm =>
      import s.implicits._
      val coord = coordVals(dm).zipWithIndex
        .map { case (v, i) => (v, i.toLong) }.toSeq
        .toDF("__v", "__i") // exact binary equality: values CAME from this column
      // LEFT join + loud null check: this pass is a RE-evaluation of
      // `df` after the factorization collected its values — a
      // non-deterministic source can emit a coordinate value absent
      // from the first pass here, and an inner join would silently
      // DROP that row (the written cell would read back as fill).
      // Same drift class CellMask.fromCellsDistributed guards against.
      indexed = indexed.join(broadcast(coord), indexed(dm) === coord("__v"), "left")
        .withColumn("__i",
          when(col("__i").isNull, raise_error(concat(
            lit(s"coordinate value for dim '$dm' ("), col(dm),
            lit(") absent from the factorization pass: the input is " +
              "non-deterministic across evaluations"))))
            .otherwise(col("__i")))
        .drop(dm).drop("__v").withColumnRenamed("__i", dm)
    }
    writeArrayDistributed(indexed, s"$groupDir/$varName",
      dims.map(dm => coordVals(dm).length.toLong).toArray, chunks,
      dims.toArray, compressor, fillValue)
    // the variable's dim names land in .zattrs via writeArrayDistributed;
    // consolidation makes the group one-metadata-fetch readable
    consolidate(groupDir)
  }

  /** Consolidate a group's per-array metadata into one `.zmetadata`
    * document (zarr_consolidated_format 1 — what xarray's
    * `consolidated=True` reads): after this, arrays resolve through
    * the single group document even if their own `.zarray`/`.zattrs`
    * are absent, the one-metadata-fetch contract remote stores need. */
  def consolidate(groupDir: String): Unit = {
    val g = Paths.get(groupDir)
    val listing = Files.list(g) // close the directory handle — fd leak otherwise
    val entries =
      try listing.iterator().asScala
        .filter(p => Files.isDirectory(p) && Files.exists(p.resolve(".zarray")))
        .flatMap { p =>
          val name = p.getFileName.toString
          val za = s""""$name/.zarray":${Files.readString(p.resolve(".zarray"))}"""
          val at = if (Files.exists(p.resolve(".zattrs")))
            Some(s""""$name/.zattrs":${Files.readString(p.resolve(".zattrs"))}""")
          else None
          Iterator(za) ++ at.iterator
        }.mkString(",")
      finally listing.close()
    Files.writeString(g.resolve(".zmetadata"),
      s"""{"zarr_consolidated_format":1,"metadata":{$entries}}""")
    ()
  }

  /** The fixture VALUE function — shared with the DuckDB oracle, which
    * recomputes it over generate_series. */
  private def precipValue(i: Array[Long]): Double =
    (i(0) * 10000 + i(1) * 100 + i(2)).toDouble

  /** Deterministic climate-shaped zarr group: `precip[time=6, lat=20,
    * lon=30]` in zlib chunks of (2,8,16) — an 18-chunk grid WITH padded
    * edge chunks (20%8, 30%16 ≠ 0) — plus 1-D coordinate arrays per
    * dim, the layout xarray writes. Built once per process. */
  private val built = new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def climateGroup(s: SparkSession): String = {
    val cur = built.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr_")
      writeArray(s"$dir/precip", Array(6L, 20L, 30L), Array(2, 8, 16),
        Array("time", "lat", "lon"), Some("zlib"), 0.0, precipValue)
      writeArray(s"$dir/time", Array(6L), Array(6), Array("time"), None, 0.0,
        i => (i(0) * 3600).toDouble)
      writeArray(s"$dir/lat", Array(20L), Array(20), Array("lat"), None, 0.0,
        i => -90.0 + i(0) * 0.5)
      writeArray(s"$dir/lon", Array(30L), Array(30), Array("lon"), None, 0.0,
        i => -180.0 + i(0) * 0.625)
      if (built.compareAndSet(null, dir)) dir else built.get
    }
  }

  /** The same precip fixture as a zarr FORMAT 3 array (raw-zstd
    * bytes→bytes codec, c/-prefixed nested chunk keys, padded edges) —
    * built once per process for the v3 read-path query. */
  private val builtV3 = new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def climateArrayV3(s: SparkSession): String = {
    val cur = builtV3.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr3_")
      writeArrayV3(s"$dir/precip", Array(6L, 20L, 30L), Array(2, 8, 16),
        Array("time", "lat", "lon"), Some("zstd"), 0.0, precipValue)
      if (builtV3.compareAndSet(null, dir)) dir else builtV3.get
    }
  }

  /** The same precip fixture as a zarr v3 array carrying the full
    * codec-tail chain a real zarr-python 3.x store can declare:
    * `transpose` (order [2,0,1] — lon-major storage) → `bytes` →
    * `zstd` → chunk-level `crc32c` trailer; built once per process
    * for the codec-chain read-path query. */
  private val builtV3Codecs =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def climateArrayV3Codecs(s: SparkSession): String = {
    val cur = builtV3Codecs.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr3c_")
      writeArrayV3(s"$dir/precip", Array(6L, 20L, 30L), Array(2, 8, 16),
        Array("time", "lat", "lon"), Some("zstd"), 0.0, precipValue,
        order = Some(Array(2, 0, 1)), checksum = true)
      if (builtV3Codecs.compareAndSet(null, dir)) dir
      else builtV3Codecs.get
    }
  }

  /** The same precip fixture as a zarr v3 `sharding_indexed` store
    * (2×10×15-element shards of 1×5×15 inner chunks, zstd inner
    * codec, crc32c-trailed end index) — what zarr-python 3.x emits
    * for large arrays; built once per process. */
  private val builtV3Sharded =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def climateArrayV3Sharded(s: SparkSession): String = {
    val cur = builtV3Sharded.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr3s_")
      writeArrayV3Sharded(s"$dir/precip", Array(6L, 20L, 30L),
        Array(2, 10, 15), Array(1, 5, 15), Array("time", "lat", "lon"),
        Some("zstd"), 0.0, precipValue)
      if (builtV3Sharded.compareAndSet(null, dir)) dir
      else builtV3Sharded.get
    }
  }

  /** Time-axis fixture group — the reference's REAL store shape
    * (precipitation_pipeline.py:91: a datetime64 `time` coordinate
    * read via `pd.to_datetime`): `temp[time=50, level=6]` (f8, zlib,
    * padded chunk edges both dims) with a datetime64 `<M8[m]` time
    * coordinate (2020-01-01 in 30-minute steps), a plain f8 `level`
    * coordinate, and `obs_end[time, level]` — an f8 variable carrying
    * CF `units: "hours since 2000-01-01 06:00:00"` with fractional
    * values (the other wild time encoding, xarray decode_cf's input).
    * Built once per process. */
  private val builtTime = new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def timeGroup(s: SparkSession): String = {
    val cur = builtTime.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr_time_")
      writeArray(s"$dir/temp", Array(50L, 6L), Array(16, 4),
        Array("time", "level"), Some("zlib"), 0.0,
        i => (i(0) * 100 + i(1)).toDouble)
      // minutes since 1970 at 2020-01-01T00:00Z = 1577836800 / 60
      writeArrayTyped(s"$dir/time", Array(50L), Array(50), Array("time"),
        None, "<M8[m]", Double.NaN,
        i => (26297280L + 30L * i(0)).toDouble)
      writeArray(s"$dir/level", Array(6L), Array(6), Array("level"), None,
        0.0, i => i(0) * 12.5)
      writeArrayTyped(s"$dir/obs_end", Array(50L, 6L), Array(16, 4),
        Array("time", "level"), Some("zlib"), "<f8", 0.0,
        i => i(0).toDouble + i(1) * 0.25,
        extraAttrs = Map(
          "units" -> "\"hours since 2000-01-01 06:00:00\"",
          "calendar" -> "\"proleptic_gregorian\""))
      if (builtTime.compareAndSet(null, dir)) dir else builtTime.get
    }
  }

  /** Small-dtype fixture group — the mask/QC byte grids a real store
    * carries (the reference probes a boolean land mask,
    * precipitation_pipeline.py:160): bool, uint8 (values past 127 pin
    * the unsigned widen), int16 in BOTH byte orders, int8 — all over
    * a padded-edge chunk grid. Built once per process. */
  private val builtDtypes = new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def dtypeGroup(s: SparkSession): String = {
    val cur = builtDtypes.get
    if (cur != null) cur
    else {
      val dir = graft.sources.IO.tmp("graft_zarr_dt_")
      val dims = Array("y", "x")
      val shape = Array(9L, 14L)
      val chunks = Array(4, 8) // padded edges both dims
      writeArrayTyped(s"$dir/mask", shape, chunks, dims, Some("zlib"), "|b1",
        0.0, i => if ((i(0) + i(1)) % 3 == 0) 1.0 else 0.0)
      writeArrayTyped(s"$dir/qc", shape, chunks, dims, Some("zlib"), "|u1",
        0.0, i => ((i(0) * 31 + i(1) * 7) % 256).toDouble)
      writeArrayTyped(s"$dir/anom", shape, chunks, dims, Some("zlib"), "<i2",
        0.0, i => (i(0) * 100 - i(1) * 50 - 3000).toDouble)
      writeArrayTyped(s"$dir/anom_be", shape, chunks, dims, Some("zlib"), ">i2",
        0.0, i => (i(0) * 100 - i(1) * 50 - 3000).toDouble)
      writeArrayTyped(s"$dir/cat", shape, chunks, dims, Some("zlib"), "|i1",
        0.0, i => ((i(0) * 3 + i(1)) % 200 - 100).toDouble)
      if (builtDtypes.compareAndSet(null, dir)) dir else builtDtypes.get
    }
  }

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // the raw chunked-array scan: every element exact through the
    // zlib chunk grid, padded edges excluded
    "q_scan_zarr" -> ((s, _) =>
      readArray(s, climateGroup(s) + "/precip")
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))),

    // the same element space through a zarr FORMAT 3 store (zarr.json
    // metadata, c/-prefixed nested chunk keys, raw-zstd codec, padded
    // edge chunks) — any v3 metadata/key/codec misread breaks the hash
    "q_scan_zarr_v3" -> ((s, _) =>
      readArray(s, climateArrayV3(s) + "/precip")
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))),

    // the same element space through a v3 store declaring the full
    // codec tail (transpose [2,0,1] → bytes → zstd → chunk crc32c):
    // a wrong permutation direction scrambles every value, a wrong
    // checksum strip corrupts the frame — either breaks the hash
    "q_scan_zarr_codecs" -> ((s, _) =>
      readArray(s, climateArrayV3Codecs(s) + "/precip")
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))),

    // the same element space through a v3 SHARDED store
    // (sharding_indexed: range-read crc32c-trailed shard index, inner
    // chunks decoded one at a time — what zarr-python 3.x writes for
    // large arrays): any index/offset/codec misread breaks the hash
    "q_scan_zarr_sharded" -> ((s, _) =>
      readArray(s, climateArrayV3Sharded(s) + "/precip")
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))),

    // the DISTRIBUTED sink → scan round trip: rows built in Spark,
    // shuffled to their chunks, written through the codec, read back
    // through the connector — any loss in chunk addressing, C-order
    // packing, codec, or fill handling breaks the hash match
    "q_sink_zarr" -> ((s, _) => {
      val out = graft.sources.IO.tmp("graft_zarr_sink_") + "/cube"
      val rows = s.range(0L, 6L * 20 * 30).select(
        expr("id div 600").as("time"),
        expr("(id div 30) % 20").as("lat"),
        expr("id % 30").as("lon"))
        .withColumn("value",
          (col("time") * 10000 + col("lat") * 100 + col("lon")).cast("double"))
      writeArrayDistributed(rows, out, Array(6L, 20L, 30L), Array(2, 8, 16),
        Array("time", "lat", "lon"))
      readArray(s, out)
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))
    }),

    // the SHARDED v3 sink → scan round trip: rows shuffled to their
    // SHARDS, inner chunks streamed through the codec behind a
    // crc32c-trailed index, read back through the connector's
    // range-read path — any loss in shard addressing, inner-chunk
    // packing, index offsets, or edge padding breaks the hash match.
    // Shard (4,8,16) over a 6x20x30 array pads edge shards in every
    // dimension; inner chunks (2,4,8) pad within the edge shards too.
    "q_sink_zarr_sharded" -> ((s, _) => {
      val out = graft.sources.IO.tmp("graft_zarr_shard_sink_") + "/cube"
      val rows = s.range(0L, 6L * 20 * 30).select(
        expr("id div 600").as("time"),
        expr("(id div 30) % 20").as("lat"),
        expr("id % 30").as("lon"))
        .withColumn("value",
          (col("time") * 10000 + col("lat") * 100 + col("lon")).cast("double"))
      writeArrayV3ShardedDistributed(rows, out, Array(6L, 20L, 30L),
        Array(4, 8, 16), Array(2, 4, 8), Array("time", "lat", "lon"))
      readArray(s, out)
        .select(col("time").as("time_idx"), col("lat").as("lat_idx"),
          col("lon").as("lon_idx"), col("value"))
        .orderBy(col("time_idx"), col("lat_idx"), col("lon_idx"))
    }),

    // TIME-AXIS decode — the reference's real store shape
    // (pd.to_datetime over a datetime64 time coordinate,
    // precipitation_pipeline.py:91): the flatten joins a `<M8[m]`
    // datetime64 coordinate (→ TimestampType) onto each row, and the
    // CF-encoded variable ("hours since 2000-01-01 06:00", fractional
    // f8 values) decodes through the chunked scan itself. A wrong
    // unit scale, epoch, or rounding in either path breaks the hash
    // against the oracle's independent interval arithmetic.
    "q_scan_zarr_time" -> ((s, _) => {
      val g = timeGroup(s)
      // multi-variable to_dataframe (xarray's actual flatten): the two
      // variables equi-join on exact INTEGER index columns before the
      // coordinate values join once — at scale that's a sort-merge of
      // two chunk-partitioned scans, no value-typed join keys, no
      // broadcast of a cube-sized side
      toDataFrame(s, g, Seq("temp", "obs_end"))
        .orderBy(col("time"), col("level"))
    }),

    // SMALL-DTYPE matrix (bool / uint8 / int16 LE+BE / int8) through
    // the same padded-edge chunk grid: a wrong width, sign, or byte
    // order shifts or corrupts every value — any of them breaks the
    // hash (uint8 values past 127 pin the unsigned widen; the BE
    // twin of the int16 array pins the byte order)
    "q_scan_zarr_dtypes" -> ((s, _) => {
      val g = dtypeGroup(s)
      def one(name: String) = readArray(s, s"$g/$name")
        .select(lit(name).as("arr"), col("y"), col("x"),
          col("value").cast("long").as("v"))
      Seq("anom", "anom_be", "cat", "mask", "qc").map(one)
        .reduce(_ unionAll _)
        .orderBy(col("arr"), col("y"), col("x"))
    }),

    // the DISTRIBUTED sink → scan round trip across the small-dtype
    // matrix: each array shuffles to its chunks, encodes at its own
    // width (loud on any value the dtype can't hold), reads back
    // through the connector — any loss in the per-dtype encode, fill
    // init, or decode breaks the hash
    "q_sink_zarr_dtypes" -> ((s, _) => {
      val base = graft.sources.IO.tmp("graft_zarr_dt_sink_")
      val rows = s.range(0L, 9L * 14).select(
        expr("id div 14").as("y"), expr("id % 14").as("x"))
      def sink(name: String, dtype: String,
          v: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
        val out = s"$base/$name"
        writeArrayDistributed(rows.withColumn("value", v), out,
          Array(9L, 14L), Array(4, 8), Array("y", "x"), Some("zlib"),
          0.0, dtype)
        readArray(s, out).select(lit(name).as("arr"), col("y"), col("x"),
          col("value").cast("long").as("v"))
      }
      Seq(
        sink("anom", "<i2",
          (col("y") * 100 - col("x") * 50 - 3000).cast("double")),
        sink("cat", "<i1",
          ((col("y") * 3 + col("x")) % 200 - 100).cast("double")),
        sink("mask", "<b1",
          when((col("y") + col("x")) % 3 === 0, 1.0).otherwise(0.0)),
        sink("qc", "<u1",
          ((col("y") * 31 + col("x") * 7) % 256).cast("double")))
        .reduce(_ unionAll _)
        .orderBy(col("arr"), col("y"), col("x"))
    }),

    // the GROUP round trip with a TIMESTAMP dim — the write half of
    // the time-axis story: a flattened frame whose `time` column is
    // TimestampType factorizes on epoch micros, its coordinate array
    // lands as `<M8[us]` datetime64, and the coords-joining read
    // returns the same TimestampType values (never a silently-retyped
    // double). Any loss in the µs factorization, datetime64 encode,
    // or decode breaks the hash against the interval-arithmetic oracle.
    "q_sink_zarr_time" -> ((s, _) => {
      val out = graft.sources.IO.tmp("graft_zarr_time_sink_") + "/group"
      val rows = s.range(0L, 48L * 5).select(
        expr("id div 5").as("t"), expr("id % 5").as("st"))
        .select(
          timestamp_micros(lit(1577836800000000L) +
            col("t") * 1800000000L).as("time"),
          (col("st") * 2.5).as("station"),
          (col("t") * 10 + col("st")).cast("double").as("value"))
      writeGroupDistributed(rows, out, "reading",
        Seq("time", "station"), Array(16, 5))
      toDataFrame(s, out, "reading")
        .orderBy(col("time"), col("station"))
    }),

    // the reference's actual read shape: open group, flatten to a
    // (time, lat, lon, var) table with coordinate VALUES on each row
    // (xr.open_dataset(...).to_dataframe, precipitation_pipeline.py:79-86)
    "q_scan_zarr_coords" -> ((s, _) => {
      val g = climateGroup(s)
      toDataFrame(s, g, "precip")
        .orderBy(col("time"), col("lat"), col("lon"))
    }),

    // the GROUP round trip — the reference's write shape (to_zarr with
    // coords + consolidated metadata) driven from a coordinate-VALUED
    // frame: factorize dims, write coords + variable + .zmetadata, read
    // back through the coords-joining scan. Any loss in the coordinate
    // factorization, index mapping, chunked write, or consolidation
    // breaks the hash match against the regenerated oracle.
    "q_sink_zarr_group" -> ((s, _) => {
      val out = graft.sources.IO.tmp("graft_zarr_group_") + "/group"
      val rows = s.range(0L, 6L * 20 * 30).select(
        expr("id div 600").as("t"),
        expr("(id div 30) % 20").as("y"),
        expr("id % 30").as("x"))
        .select(
          (col("t") * 3600).cast("double").as("time"),
          (lit(-90.0) + col("y") * 0.5).as("lat"),
          (lit(-180.0) + col("x") * 0.625).as("lon"),
          (col("t") * 10000 + col("y") * 100 + col("x")).cast("double").as("value"))
      writeGroupDistributed(rows, out, "precip",
        Seq("time", "lat", "lon"), Array(2, 8, 16))
      toDataFrame(s, out, "precip")
        .orderBy(col("time"), col("lat"), col("lon"))
    }),
  )

  val oracle: Map[String, String] = Map(
    // the fixture is a pure function of the index space, so the oracle
    // regenerates it from scratch — full coverage of every element the
    // connector decodes (chunk walk, zlib, edge padding, C order)
    "q_scan_zarr" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_scan_zarr_v3" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_scan_zarr_codecs" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_scan_zarr_sharded" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_sink_zarr" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_sink_zarr_sharded" ->
      """SELECT t.g AS time_idx, y.g AS lat_idx, x.g AS lon_idx,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS value
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_scan_zarr_time" ->
      """SELECT TIMESTAMP '2020-01-01 00:00:00' + t.g * 30 * INTERVAL '1 minute' AS time,
        |       l.g * 12.5 AS level,
        |       CAST(t.g * 100 + l.g AS DOUBLE) AS temp,
        |       TIMESTAMP '2000-01-01 06:00:00'
        |         + to_microseconds(CAST((t.g + l.g * 0.25) * 3600000000 AS BIGINT)) AS obs_end
        |FROM generate_series(0, 49) t(g), generate_series(0, 5) l(g)
        |ORDER BY 1, 2""".stripMargin,
    "q_scan_zarr_dtypes" ->
      """WITH g AS (SELECT y.g AS y, x.g AS x
        |           FROM generate_series(0, 8) y(g), generate_series(0, 13) x(g))
        |SELECT arr, y, x, v FROM (
        |  SELECT 'anom' AS arr, y, x, CAST(y*100 - x*50 - 3000 AS BIGINT) AS v FROM g
        |  UNION ALL SELECT 'anom_be', y, x, CAST(y*100 - x*50 - 3000 AS BIGINT) FROM g
        |  UNION ALL SELECT 'cat', y, x, CAST((y*3 + x) % 200 - 100 AS BIGINT) FROM g
        |  UNION ALL SELECT 'mask', y, x, CAST(CASE WHEN (y+x) % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM g
        |  UNION ALL SELECT 'qc', y, x, CAST((y*31 + x*7) % 256 AS BIGINT) FROM g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_sink_zarr_dtypes" ->
      """WITH g AS (SELECT y.g AS y, x.g AS x
        |           FROM generate_series(0, 8) y(g), generate_series(0, 13) x(g))
        |SELECT arr, y, x, v FROM (
        |  SELECT 'anom' AS arr, y, x, CAST(y*100 - x*50 - 3000 AS BIGINT) AS v FROM g
        |  UNION ALL SELECT 'cat', y, x, CAST((y*3 + x) % 200 - 100 AS BIGINT) FROM g
        |  UNION ALL SELECT 'mask', y, x, CAST(CASE WHEN (y+x) % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) FROM g
        |  UNION ALL SELECT 'qc', y, x, CAST((y*31 + x*7) % 256 AS BIGINT) FROM g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_sink_zarr_time" ->
      """SELECT TIMESTAMP '2020-01-01 00:00:00' + t.g * 30 * INTERVAL '1 minute' AS time,
        |       s.g * 2.5 AS station,
        |       CAST(t.g * 10 + s.g AS DOUBLE) AS reading
        |FROM generate_series(0, 47) t(g), generate_series(0, 4) s(g)
        |ORDER BY 1, 2""".stripMargin,
    "q_scan_zarr_coords" ->
      """SELECT CAST(t.g * 3600 AS DOUBLE) AS time,
        |       -90 + y.g * 0.5 AS lat,
        |       -180 + x.g * 0.625 AS lon,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS precip
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_sink_zarr_group" ->
      """SELECT CAST(t.g * 3600 AS DOUBLE) AS time,
        |       -90 + y.g * 0.5 AS lat,
        |       -180 + x.g * 0.625 AS lon,
        |       CAST(t.g * 10000 + y.g * 100 + x.g AS DOUBLE) AS precip
        |FROM generate_series(0, 5) t(g), generate_series(0, 19) y(g),
        |     generate_series(0, 29) x(g)
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
