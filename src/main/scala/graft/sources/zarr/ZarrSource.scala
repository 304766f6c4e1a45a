package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Zarr v2 chunked-array reader as a Spark DataSource V2 — the
  * reference's NATIVE source format (xr.open_dataset(engine="zarr"),
  * precipitation_pipeline.py:79-86), exposed the way xarray's
  * to_dataframe flattens it: one row per array element, index columns
  * named by the `_ARRAY_DIMENSIONS` attribute (the xarray convention)
  * plus a `value` column of the array dtype.
  *
  * Scope: zarr format 2 (the subset the reference exercises) AND
  * format 3 reads (`zarr.json` — zarr-python 3.x's default output;
  * the wild is migrating): C order, `<f8 <f4 <i8 <i4 <i2 <i1 <u1 <b1`
  * (multi-byte types also in big-endian `>`, 1-byte in numpy's `|`) /
  * `float64 float32 int64 int32 int16 int8 uint8 bool` in either
  * byte order, TIME AXES decoded to TimestampType — numpy datetime64
  * (v2 `<M8[unit]` dtypes, v3's `numpy.datetime64` extension
  * data_type; NaT → null) and CF-convention numeric coordinates
  * (`units: "<unit> since <epoch>"` attributes, the encoding xarray's
  * decode_cf reads; the reference's NASA POWER store carries exactly
  * this shape, precipitation_pipeline.py:91) —
  * compressor `null`/zlib/gzip/blosc
  * (lz4, lz4hc, zlib, zstd inner codecs, byte- and bit-shuffle
  * filters — see [[Blosc]]) plus v3's raw-zstd bytes→bytes codec,
  * v3's `transpose` array→array codec (permuted buffer walk, no
  * re-copy) and chunk-level `crc32c` checksum codec (verified and
  * stripped before decompression),
  * `.`- or `/`-separated chunk keys in both v2 and v3-`default`
  * (`c/`-prefixed) encodings, v2 `.zmetadata` and v3 inline
  * `consolidated_metadata` group documents, missing chunks = fill
  * value. Anything else fails LOUDLY at schema inference — silent
  * misreads of an unsupported codec are the one unacceptable outcome.
  *
  * Scale design — the two properties that make zarr viable at 100 TB:
  *  - CHUNK = PARTITION: one InputPartition per stored chunk, so the
  *    scan parallelizes exactly like the store is laid out and a task
  *    decodes one chunk buffer (bounded memory, no re-chunking).
  *  - CHUNK PRUNING: index-range predicates push down and intersect
  *    against each chunk's index box before anything is read — the
  *    engine-side analog of the reference's "filter time THEN read"
  *    (its time_filter applies before extraction). A time-sliced query
  *    reads only the chunks whose time range intersects (ZarrSpec pins
  *    the pruned partition count). Pruning is chunk-granular; Spark
  *    re-evaluates the row-level residual, so results are exact.
  */
object ZarrMeta {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Zarr v3 `sharding_indexed` layout: the STORED object is a shard
    * of `shardChunks` elements holding a C-order-indexed pack of inner
    * chunks (the Meta's `chunks`); the uint64 (offset, nbytes) index
    * sits at the shard's start or end, `bytes`-coded little-endian
    * with an optional trailing crc32c. Inner-chunk codecs live in the
    * Meta's `compressor` — the shard itself is never decompressed as
    * a unit (it is read by RANGE, so a shard may exceed the 2 GiB
    * single-buffer bound that still applies to each inner chunk). */
  final case class ShardInfo(shardChunks: Array[Int], indexAtEnd: Boolean,
      indexCrc32c: Boolean) extends Serializable

  /** Time semantics of an array's values — the two ways a real store
    * encodes a time axis (the reference's NASA POWER store carries a
    * datetime64 `time` coordinate, precipitation_pipeline.py:91):
    *  - numpy datetime64 dtype (v2 `<M8[unit]`, v3's numpy.datetime64
    *    extension): int64 counts of `unitNanos` since the 1970 epoch,
    *    Long.MinValue = NaT → null;
    *  - CF-convention numeric coords (`units: "<unit> since <epoch>"`
    *    attribute on an int/float array).
    * Values decode to TimestampType micros:
    * `epochMicros + raw * unitNanos / 1000` (exact integer arithmetic
    * for integral dtypes; rounded for CF float values, whose µs
    * magnitudes are exact in double for any realistic axis). */
  final case class TimeInfo(unitNanos: Long, epochMicros: Long)
      extends Serializable

  final case class Meta(shape: Array[Long], chunks: Array[Int], dtype: String,
      compressor: Option[String], fillValue: Double, dimSeparator: String,
      dims: Array[String], keyPrefix: String = "",
      shard: Option[ShardInfo] = None,
      // v3 `transpose` array→array codec: the stored decode unit is
      // the chunk permuted by `order` (numpy transpose semantics) —
      // the buffer walk applies the permutation, nothing re-copies
      order: Option[Array[Int]] = None,
      // v3 `crc32c` bytes→bytes codec: the stored decode unit carries
      // a 4-byte little-endian CRC32C trailer over the preceding
      // bytes — verified and stripped before decompression
      checksum: Boolean = false,
      // element byte order (v2 `>f8`-style dtypes / v3 `bytes` codec
      // endian "big"): dtype is NORMALIZED to the `<`-prefixed form,
      // this flag alone flips the decode buffer's order
      bigEndian: Boolean = false,
      // time semantics: datetime64 dtype or CF units attr — when set,
      // `value` decodes to TimestampType (nullable: NaT/NaN → null)
      time: Option[TimeInfo] = None) extends Serializable {
    def nDims: Int = shape.length
    /** Store key of a chunk: v2 keys are bare separator-joined coords;
      * zarr v3's "default" chunk-key encoding prefixes `c<sep>`. For a
      * sharded array the stored object is the SHARD, so the key is
      * taken over shard-grid coords (the caller divides). */
    def chunkKey(cc: Array[Int]): String =
      keyPrefix + cc.mkString(dimSeparator)
    def chunkCounts: Array[Int] =
      shape.zip(chunks).map { case (s, c) => ((s + c - 1) / c).toInt }
    def elemSize: Int = ZarrMeta.elemSizeOf(dtype)
    def valueType: DataType =
      if (time.isDefined) TimestampType
      else dtype match {
        case "<f8" => DoubleType
        case "<f4" => FloatType
        case "<i8" => LongType
        case "<i4" => IntegerType
        case "<i2" => ShortType
        case "<i1" => ByteType
        case "<u1" => ShortType // unsigned byte widened (Spark has no u8)
        case "<b1" => BooleanType
      }
    def schema: StructType = StructType(
      dims.map(d => StructField(d, LongType, nullable = false)) :+
        // a time axis can carry NaT (datetime64 Long.MinValue) / NaN
        // (CF float) — both decode to null, so only then is it nullable
        StructField("value", valueType, nullable = time.isDefined))
  }

  private[zarr] def elemSizeOf(dtype: String): Int = dtype match {
    case "<f8" | "<i8" | "<M8" => 8
    case "<f4" | "<i4" => 4
    case "<i2" => 2
    case "<i1" | "<u1" | "<b1" => 1
  }

  /** Array metadata: the per-array `.zarray`/`.zattrs` documents, or —
    * when the array directory carries none — the parent group's
    * CONSOLIDATED `.zmetadata` (the document xarray's
    * `consolidated=True` reads, one metadata fetch for the whole group
    * instead of one per key: the flag the reference passes,
    * precipitation_pipeline.py:83). */
  def read(dir: String): Meta = {
    val v3 = Paths.get(dir, "zarr.json")
    val local = Paths.get(dir, ".zarray")
    if (Files.exists(v3)) buildV3(mapper.readTree(Files.readString(v3)))
    else if (Files.exists(local)) {
      val attrsPath = Paths.get(dir, ".zattrs")
      val attrs = if (Files.exists(attrsPath))
        Some(mapper.readTree(Files.readString(attrsPath))) else None
      build(mapper.readTree(Files.readString(local)), attrs)
    } else {
      val arrayDir = Paths.get(dir).toAbsolutePath.normalize
      val name = arrayDir.getFileName.toString
      val zm = arrayDir.getParent.resolve(".zmetadata")
      val gv3 = arrayDir.getParent.resolve("zarr.json")
      if (Files.exists(zm)) {
        val doc = mapper.readTree(Files.readString(zm))
        require(doc.path("zarr_consolidated_format").asInt == 1,
          "unsupported zarr_consolidated_format")
        val md = doc.path("metadata")
        val za = md.path(s"$name/.zarray")
        require(!za.isMissingNode, s"'$name/.zarray' absent from consolidated metadata")
        val at = md.path(s"$name/.zattrs")
        build(za, if (at.isMissingNode) None else Some(at))
      } else if (Files.exists(gv3)) {
        // zarr v3 consolidation: the GROUP's zarr.json carries an
        // inline `consolidated_metadata` map of child metadata
        // documents (what zarr-python 3 writes for consolidated=True)
        val doc = mapper.readTree(Files.readString(gv3))
        val cm = doc.path("consolidated_metadata")
        require(!cm.isMissingNode && !cm.isNull,
          s"no array metadata in $dir and the group's zarr.json carries " +
            "no consolidated_metadata")
        val md = cm.path("metadata").path(name)
        require(!md.isMissingNode,
          s"'$name' absent from the group's consolidated_metadata")
        buildV3(md)
      } else throw new IllegalArgumentException(
        s"no zarr.json or .zarray in $dir and no consolidated metadata " +
          "(.zmetadata / group zarr.json) in its group")
    }
  }

  /** Does the group contain array `name` — by its own `zarr.json` /
    * `.zarray`, or by an entry in the group's consolidated metadata
    * (v2 `.zmetadata` or v3 group `zarr.json`)? */
  def hasArray(groupDir: String, name: String): Boolean =
    Files.exists(Paths.get(groupDir, name, ".zarray")) ||
    Files.exists(Paths.get(groupDir, name, "zarr.json")) || {
      val zm = Paths.get(groupDir, ".zmetadata")
      Files.exists(zm) && mapper.readTree(Files.readString(zm))
        .path("metadata").has(s"$name/.zarray")
    } || {
      val gv3 = Paths.get(groupDir, "zarr.json")
      Files.exists(gv3) && mapper.readTree(Files.readString(gv3))
        .path("consolidated_metadata").path("metadata").has(name)
    }

  /** Fixed-length datetime64 / CF time units → nanoseconds. Y/M are
    * calendar-dependent and rejected loudly (the CF recommendation). */
  private def unitNanosOf(u: String): Long = u match {
    case "W" | "weeks" | "week" => 604800000000000L
    case "D" | "days" | "day" | "d" => 86400000000000L
    case "h" | "hours" | "hour" | "hr" | "hrs" => 3600000000000L
    case "m" | "minutes" | "minute" | "min" | "mins" => 60000000000L
    case "s" | "seconds" | "second" | "sec" | "secs" => 1000000000L
    case "ms" | "milliseconds" | "millisecond" => 1000000L
    case "us" | "microseconds" | "microsecond" => 1000L
    case "ns" | "nanoseconds" | "nanosecond" => 1L
    case other => throw new IllegalArgumentException(
      s"time unit '$other' unsupported (fixed-length units only — " +
        "years/months are calendar-dependent)")
  }

  /** Epoch of a CF `units` attribute → micros since 1970 (UTC):
    * `YYYY-MM-DD[ T]HH:MM:SS[.f][Z|+HH:MM]` or a bare date. */
  private[zarr] def parseEpochMicros(s0: String): Long = {
    val s = s0.trim.stripSuffix("Z").stripSuffix("UTC").trim
    val norm = if (s.contains('T') || !s.contains(' ')) s
      else s.replaceFirst(" ", "T")
    val inst =
      try {
        if (!norm.contains('T'))
          java.time.LocalDate.parse(norm).atStartOfDay
            .toInstant(java.time.ZoneOffset.UTC)
        else
          try java.time.LocalDateTime.parse(norm)
            .toInstant(java.time.ZoneOffset.UTC)
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.OffsetDateTime.parse(norm).toInstant }
      } catch { case e: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"CF epoch '$s0' unparseable (ISO date[time][offset] only)", e)
      }
    Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
      (inst.getNano / 1000).toLong)
  }

  private val CfSinceRe = """(?i)^\s*([a-z]+)\s+since\s+(.+?)\s*$""".r

  /** CF time decode from an array's attributes: a `units` attribute of
    * the form "<unit> since <epoch>" makes a NUMERIC array a time
    * axis (what xarray's decode_cf reads). Non-time units strings
    * ("mm", "kg m-2") pass through as None; a "since" attr with an
    * unsupported unit, epoch, or calendar fails loudly — silent
    * misreads of a time axis are the one unacceptable outcome. */
  private def cfTime(attrsOpt: Option[com.fasterxml.jackson.databind.JsonNode],
      dtype: String): Option[TimeInfo] = attrsOpt.flatMap { attrs =>
    val u = attrs.path("units")
    if (!u.isTextual) None
    else u.asText match {
      case CfSinceRe(unit, epoch) =>
        val cal = attrs.path("calendar")
        require(!cal.isTextual || Set("standard", "gregorian",
            "proleptic_gregorian")(cal.asText.toLowerCase),
          s"CF calendar '${cal.asText}' unsupported (standard/gregorian/" +
            "proleptic_gregorian map to timestamps; others cannot)")
        require(dtype != "<M8",
          "datetime64 dtype with CF 'units since' attrs is ambiguous — " +
            "a datetime64 axis is already absolute")
        require(Set("<f8", "<f4", "<i8", "<i4", "<i2")(dtype),
          s"CF time units on dtype '$dtype' unsupported (numeric f8/f4/" +
            "i8/i4/i2 only)")
        Some(TimeInfo(unitNanosOf(unit.toLowerCase), parseEpochMicros(epoch)))
      case _ => None // a plain physical-units attr, not a time axis
    }
  }

  private val M8Re = """^([<>])M8\[([A-Za-z]+)\]$""".r

  /** v2 dtype string → (normalized `<`-prefixed dtype, big-endian,
    * datetime64 TimeInfo). 1-byte types use numpy's `|` order char
    * (order-irrelevant); datetime64 normalizes to `<M8` with its
    * bracket unit carried in TimeInfo (epoch 1970). */
  private def normalizeDtype(raw: String): (String, Boolean, Option[TimeInfo]) =
    raw match {
      case M8Re(ord, unit) =>
        ("<M8", ord == ">", Some(TimeInfo(unitNanosOf(unit), 0L)))
      case _ =>
        require(raw.length == 3 && "<>|".contains(raw.head),
          s"dtype '$raw' unsupported")
        val kind = raw.drop(1)
        require(Set("f8", "f4", "i8", "i4", "i2", "i1", "u1", "b1")(kind),
          s"dtype '$raw' unsupported (f8/f4/i8/i4/i2/i1/u1/b1/M8[unit] " +
            "in either byte order)")
        ("<" + kind, raw.head == '>' && elemSizeOf("<" + kind) > 1, None)
    }

  private def build(zarray: com.fasterxml.jackson.databind.JsonNode,
      attrsOpt: Option[com.fasterxml.jackson.databind.JsonNode]): Meta = {
    require(zarray.path("zarr_format").asInt == 2,
      s"zarr_format ${zarray.path("zarr_format")} unsupported (need 2)")
    require(zarray.path("order").asText == "C",
      s"order '${zarray.path("order").asText}' unsupported (need C)")
    require(zarray.path("filters").isNull,
      "zarr filters are unsupported")
    val rawDtype = zarray.path("dtype").asText
    val (dtype, bigEndian, m8Time) = normalizeDtype(rawDtype)
    // time semantics: the dtype itself (datetime64) or a CF units attr
    // on a numeric array — a store carrying both would be ambiguous
    val cf = cfTime(attrsOpt, dtype)
    require(m8Time.isEmpty || cf.isEmpty,
      "datetime64 dtype with CF 'units since' attrs is ambiguous — " +
        "a datetime64 axis is already absolute")
    val time = m8Time.orElse(cf)
    val comp = zarray.path("compressor")
    val compressor =
      if (comp.isNull) None
      else comp.path("id").asText match {
        case id @ ("zlib" | "gzip") => Some(id)
        case "blosc" =>
          // numcodecs Blosc config; the frame header names the actual
          // inner codec, but reject unreadable configs HERE so the
          // failure lands at schema inference, not mid-scan
          val cname = comp.path("cname").asText
          require(Set("lz4", "lz4hc", "zlib", "zstd")(cname),
            s"blosc cname '$cname' unsupported (lz4/lz4hc/zlib/zstd only)")
          Some(cname match {
            case "zlib" => "blosc:zlib"
            case "zstd" => "blosc:zstd"
            case _ => "blosc:lz4"
          })
        case other =>
          throw new IllegalArgumentException(
            s"compressor '$other' unsupported (null/zlib/gzip/blosc only)")
      }
    val shape = zarray.path("shape").elements.asScala.map(_.asLong).toArray
    val chunks = zarray.path("chunks").elements.asScala.map(_.asInt).toArray
    require(shape.nonEmpty && shape.length == chunks.length,
      s"shape/chunks rank mismatch: ${shape.length} vs ${chunks.length}")
    require(shape.forall(_ >= 1) && chunks.forall(_ >= 1),
      s"non-positive shape/chunks: ${shape.mkString(",")} / ${chunks.mkString(",")}")
    // chunk buffers address with int offsets (ByteBuffer's own bound):
    // a >2 GB chunk would silently truncate — refuse it at metadata
    // read, on BOTH the read and write paths (no sane store uses
    // chunks anywhere near this; zarr guidance is ~1-100 MB)
    require(chunks.map(_.toLong).product * elemSizeOf(dtype) <= Int.MaxValue,
      s"chunk of ${chunks.mkString("x")} ${dtype} elements exceeds the 2^31-1 " +
        "byte buffer bound; re-chunk the store")
    val fillNode = zarray.path("fill_value")
    val fill =
      // a datetime64 axis's null fill is NaT (reads as null), not 0
      if (fillNode.isNull) { if (dtype == "<M8") Double.NaN else 0.0 }
      else if (fillNode.isTextual) fillNode.asText match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case t => t.toDouble
      }
      else fillNode.asDouble
    val sep = {
      val n = zarray.path("dimension_separator")
      if (n.isMissingNode || n.isNull) "." else n.asText
    }
    val dims: Array[String] = attrsOpt match {
      case Some(attrs) =>
        val ad = attrs.path("_ARRAY_DIMENSIONS")
        if (ad.isArray) ad.elements.asScala.map(_.asText).toArray
        else shape.indices.map(i => s"i$i").toArray
      case None => shape.indices.map(i => s"i$i").toArray
    }
    require(dims.length == shape.length,
      s"_ARRAY_DIMENSIONS rank ${dims.length} != shape rank ${shape.length}")
    Meta(shape, chunks, dtype, compressor, fill, sep, dims,
      bigEndian = bigEndian, time = time)
  }

  /** Zarr FORMAT 3 array metadata (`zarr.json` — what zarr-python 3.x
    * writes by default). Same loud-rejection posture as v2: the
    * supported subset is regular chunk grids, an optional `transpose`
    * array→array codec, the `bytes` (little-endian) array→bytes
    * codec (little OR big endian), at most one compression codec of
    * gzip / zstd (RFC 8878 raw frame) / blosc, and an optional
    * trailing `crc32c` checksum codec; `default` and `v2` chunk-key
    * encodings; `dimension_names` (or the xarray attribute) for dim
    * naming. Anything outside that chain shape fails at schema
    * inference, never mid-scan. */
  private def buildV3(node: com.fasterxml.jackson.databind.JsonNode): Meta = {
    require(node.path("zarr_format").asInt == 3,
      s"zarr_format ${node.path("zarr_format")} unsupported (need 3)")
    require(node.path("node_type").asText == "array",
      s"node_type '${node.path("node_type").asText}' is not an array")
    val dtNode = node.path("data_type")
    // data_type is a name string for core types, or an extension
    // object — zarr-python 3 writes numpy datetime64 columns as
    // {"name":"numpy.datetime64","configuration":{"unit":…,"scale_factor":…}}
    val (dtype, m8Time) =
      if (dtNode.isObject) dtNode.path("name").asText match {
        case "numpy.datetime64" =>
          val cfg = dtNode.path("configuration")
          val unit = cfg.path("unit").asText
          val sf = if (cfg.path("scale_factor").isMissingNode) 1L
            else cfg.path("scale_factor").asLong
          require(sf >= 1, s"numpy.datetime64 scale_factor $sf invalid")
          ("<M8", Some(TimeInfo(
            Math.multiplyExact(unitNanosOf(unit), sf), 0L)))
        case other => throw new IllegalArgumentException(
          s"extension data_type '$other' unsupported (numpy.datetime64 only)")
      }
      else (dtNode.asText match {
        case "float64" => "<f8"
        case "float32" => "<f4"
        case "int64" => "<i8"
        case "int32" => "<i4"
        case "int16" => "<i2"
        case "int8" => "<i1"
        case "uint8" => "<u1"
        case "bool" => "<b1"
        case other => throw new IllegalArgumentException(
          s"data_type '$other' unsupported (float64/float32/int64/int32/" +
            "int16/int8/uint8/bool/numpy.datetime64 only)")
      }, None)
    // CF units attr on a numeric v3 array — same decode as v2
    val attrsNode = node.path("attributes")
    val cf = cfTime(if (attrsNode.isObject) Some(attrsNode) else None, dtype)
    require(m8Time.isEmpty || cf.isEmpty,
      "datetime64 data_type with CF 'units since' attrs is ambiguous — " +
        "a datetime64 axis is already absolute")
    val time = m8Time.orElse(cf)
    val shape = node.path("shape").elements.asScala.map(_.asLong).toArray
    val cg = node.path("chunk_grid")
    require(cg.path("name").asText == "regular",
      s"chunk_grid '${cg.path("name").asText}' unsupported (regular only)")
    // the GRID chunk: for a plain array this is the decode unit; for
    // a sharded array it is the shard shape (the stored object) and
    // the decode unit is the inner chunk_shape parsed below
    val shardChunks = cg.path("configuration").path("chunk_shape")
      .elements.asScala.map(_.asInt).toArray
    require(shape.nonEmpty && shape.length == shardChunks.length,
      s"shape/chunk_shape rank mismatch: ${shape.length} vs ${shardChunks.length}")
    require(shape.forall(_ >= 1) && shardChunks.forall(_ >= 1),
      s"non-positive shape/chunks: ${shape.mkString(",")} / ${shardChunks.mkString(",")}")
    // chunk-key encoding: "default" prefixes c<sep> (sep default "/"),
    // "v2" uses bare coords (sep default ".")
    val cke = node.path("chunk_key_encoding")
    val (sep, prefix) =
      if (cke.isMissingNode || cke.isNull) ("/", "c/")
      else {
        val nm = cke.path("name").asText
        val cfgSep = cke.path("configuration").path("separator")
        nm match {
          case "default" =>
            val s = if (cfgSep.isMissingNode) "/" else cfgSep.asText
            (s, "c" + s)
          case "v2" =>
            val s = if (cfgSep.isMissingNode) "." else cfgSep.asText
            (s, "")
          case other => throw new IllegalArgumentException(
            s"chunk_key_encoding '$other' unsupported (default/v2 only)")
        }
      }
    // codec chain: exactly one array->bytes codec — "bytes" (little
    // endian) or "sharding_indexed" (whose inner chain recurses into
    // the same parse) — then at most one supported bytes->bytes codec
    val codecs = node.path("codecs")
    require(codecs.isArray && codecs.size >= 1,
      "zarr v3 array carries no codecs list")
    val names = codecs.elements.asScala.map(_.path("name").asText).toSeq
    val (chunks, (compressor, checksum, order, bigEndian), shard) =
      if (names.head == "sharding_indexed") {
        require(names.size == 1,
          s"codec chain [${names.mkString(", ")}] unsupported (codecs " +
            "after sharding_indexed are not read by this scan)")
        val cfg = codecs.get(0).path("configuration")
        val innerShape = cfg.path("chunk_shape")
        require(innerShape.isArray && innerShape.size == shape.length,
          "sharding_indexed configuration carries no rank-matching " +
            "chunk_shape — unsupported/malformed shard codec")
        val inner = innerShape.elements.asScala.map(_.asInt).toArray
        require(inner.forall(_ >= 1), s"non-positive inner chunk_shape: " +
          inner.mkString(","))
        shardChunks.indices.foreach { d =>
          require(shardChunks(d) % inner(d) == 0,
            s"shard shape ${shardChunks.mkString("x")} not a multiple of " +
              s"inner chunk_shape ${inner.mkString("x")} (dim $d) — " +
              "unsupported/malformed shard codec")
        }
        val innerCodecs = cfg.path("codecs")
        require(innerCodecs.isArray && innerCodecs.size >= 1,
          "sharding_indexed carries no inner codecs list")
        val innerNames =
          innerCodecs.elements.asScala.map(_.path("name").asText).toSeq
        require(innerNames.head != "sharding_indexed",
          "nested sharding_indexed unsupported")
        val comp = parseByteChain(innerCodecs, innerNames, shape.length)
        // index codecs: "bytes" (little) + optional trailing crc32c —
        // what zarr-python 3 writes; anything else is rejected
        val idxCodecs = cfg.path("index_codecs")
        val idxNames =
          if (idxCodecs.isArray)
            idxCodecs.elements.asScala.map(_.path("name").asText).toSeq
          else Seq("bytes")
        require(idxNames == Seq("bytes") || idxNames == Seq("bytes", "crc32c"),
          s"shard index_codecs [${idxNames.mkString(", ")}] unsupported " +
            "(bytes [+ crc32c] only)")
        if (idxCodecs.isArray) {
          val e = idxCodecs.get(0).path("configuration").path("endian")
          require(e.isMissingNode || e.asText == "little",
            s"shard index endian '${e.asText}' unsupported (little only)")
        }
        val loc = cfg.path("index_location")
        val atEnd = loc.isMissingNode || loc.isNull || loc.asText == "end"
        require(atEnd || loc.asText == "start",
          s"index_location '${loc.asText}' unsupported (start/end only)")
        (inner, comp,
          Some(ShardInfo(shardChunks, atEnd, idxNames.size == 2)))
      } else (shardChunks, parseByteChain(codecs, names, shape.length), None)
    val fillNode = node.path("fill_value")
    val fill =
      if (fillNode.isMissingNode || fillNode.isNull) {
        if (dtype == "<M8") Double.NaN else 0.0 // datetime null fill = NaT
      }
      else if (fillNode.isBoolean) { if (fillNode.asBoolean) 1.0 else 0.0 }
      else if (fillNode.isTextual) fillNode.asText match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case t => t.toDouble
      }
      else fillNode.asDouble
    val dn = node.path("dimension_names")
    val ad = node.path("attributes").path("_ARRAY_DIMENSIONS")
    val dims: Array[String] =
      if (dn.isArray) dn.elements.asScala.map(_.asText).toArray
      else if (ad.isArray) ad.elements.asScala.map(_.asText).toArray
      else shape.indices.map(i => s"i$i").toArray
    require(dims.length == shape.length,
      s"dimension_names rank ${dims.length} != shape rank ${shape.length}")
    // the 2^31-1 single-buffer bound applies to the DECODE unit (the
    // inner chunk for a sharded array — the shard itself is read by
    // range and may be arbitrarily large)
    require(chunks.map(_.toLong).product * elemSizeOf(dtype) <= Int.MaxValue,
      s"chunk of ${chunks.mkString("x")} $dtype elements exceeds the 2^31-1 " +
        "byte buffer bound; re-chunk the store")
    Meta(shape, chunks, dtype, compressor, fill, sep, dims, prefix, shard,
      order, checksum, bigEndian, time)
  }

  /** Codec chain of a plain array or a shard's inner chunks:
    * `[transpose?] bytes [gzip|zstd|blosc]? [crc32c]?` — an optional
    * `transpose` array→array codec, the mandatory `bytes` (little or
    * big endian) array→bytes codec, at most one supported compression
    * codec, and an optional trailing `crc32c` checksum (zarr-python's
    * chunk-level integrity codec). Returns ([[ZarrCodec]] compressor
    * id, crc32c present, transpose order, big-endian). Anything else
    * fails loudly at schema inference — the no-silent-misread
    * contract. */
  private def parseByteChain(codecs: com.fasterxml.jackson.databind.JsonNode,
      names: Seq[String], rank: Int)
      : (Option[String], Boolean, Option[Array[Int]], Boolean) = {
    var i = 0
    // optional leading transpose: order must be a true permutation of
    // 0..rank-1; the identity permutation is dropped (no-op walk)
    val order: Option[Array[Int]] =
      if (names.headOption.contains("transpose")) {
        val o = codecs.get(0).path("configuration").path("order")
        require(o.isArray && o.size == rank,
          s"transpose order rank ${o.size} != array rank $rank")
        val ord = o.elements.asScala.map(_.asInt).toArray
        require(ord.sorted.sameElements(0 until rank),
          s"transpose order [${ord.mkString(",")}] is not a permutation " +
            s"of 0..${rank - 1}")
        i = 1
        if (ord.zipWithIndex.forall { case (v, k) => v == k }) None
        else Some(ord)
      } else None
    require(names.lift(i).contains("bytes"),
      s"codec chain [${names.mkString(", ")}] unsupported (need the " +
        "'bytes' array->bytes codec after an optional transpose)")
    val endian = codecs.get(i).path("configuration").path("endian")
    require(endian.isMissingNode || endian.asText == "little" ||
        endian.asText == "big",
      s"endian '${endian.asText}' unsupported (little/big only)")
    val bigEndian = !endian.isMissingNode && endian.asText == "big"
    i += 1
    val checksum = names.lastOption.contains("crc32c") && names.size > i
    val compNames = names.drop(i).dropRight(if (checksum) 1 else 0)
    require(compNames.size <= 1,
      s"codec chain [${names.mkString(", ")}] unsupported " +
        "(at most one compression codec between bytes and crc32c)")
    val comp = compNames.headOption.map { bb =>
      val cfg = codecs.get(i).path("configuration")
      bb match {
        case "gzip" => "gzip"
        case "zstd" => "zstd"
        case "blosc" =>
          val cname = cfg.path("cname").asText
          require(Set("lz4", "lz4hc", "zlib", "zstd")(cname),
            s"blosc cname '$cname' unsupported (lz4/lz4hc/zlib/zstd only)")
          cname match {
            case "zlib" => "blosc:zlib"
            case "zstd" => "blosc:zstd"
            case _ => "blosc:lz4"
          }
        case other => throw new IllegalArgumentException(
          s"codec '$other' unsupported (gzip/zstd/blosc only)")
      }
    }
    (comp, checksum, order, bigEndian)
  }
}

/** Shared chunk codec: the writer's compress and the reader's
  * decompress must be exact inverses for every supported id. */
private[zarr] object ZarrCodec {
  def compress(raw: Array[Byte], codec: Option[String], typesize: Int = 8): Array[Byte] = codec match {
    case None => raw
    case Some("blosc:lz4") => Blosc.compress(raw, "lz4", typesize)
    case Some("blosc:zlib") => Blosc.compress(raw, "zlib", typesize)
    case Some("blosc:zstd") => Blosc.compress(raw, "zstd", typesize)
    case Some("zlib") =>
      val defl = new java.util.zip.Deflater(5)
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length)
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
      defl.end(); out.toByteArray
    case Some("gzip") =>
      val out = new java.io.ByteArrayOutputStream(raw.length)
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(raw); g.close(); out.toByteArray
    case Some("zstd") => // zarr v3's raw RFC 8878 frame
      com.github.luben.zstd.Zstd.compress(raw, 5)
    case Some(other) => throw new IllegalArgumentException(s"unsupported codec $other")
  }

  /** The `.zarray` compressor document for a codec id — numcodecs-shaped
    * for blosc so zarr-python/xarray can read stores this engine writes. */
  def json(codec: Option[String]): String = codec match {
    case None => "null"
    case Some("blosc:lz4") =>
      """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0}"""
    case Some("blosc:zlib") =>
      """{"id":"blosc","cname":"zlib","clevel":5,"shuffle":1,"blocksize":0}"""
    case Some("blosc:zstd") =>
      """{"id":"blosc","cname":"zstd","clevel":5,"shuffle":1,"blocksize":0}"""
    case Some(id) => s"""{"id":"$id","level":5}"""
  }
}

/** Loads + decodes ONE chunk's bytes: raw/zlib/gzip file → validated
  * little-endian buffer; `None` = missing chunk file (zarr's
  * sparse-store contract — every element reads as the fill value).
  * Shared by the row and columnar readers. */
private[zarr] object ZarrChunkIO {
  def load(path: String, meta: ZarrMeta.Meta, chunkCoords: Array[Int]): Option[ByteBuffer] = meta.shard match {
    case Some(sh) => loadSharded(path, meta, sh, chunkCoords)
    case None =>
      val key = meta.chunkKey(chunkCoords)
      val p = Paths.get(path, key)
      if (!Files.exists(p)) None
      else Some(decode(Files.readAllBytes(p), meta, key))
  }

  /** One INNER chunk out of a `sharding_indexed` shard: resolve the
    * shard object from the shard-grid coords, range-read its uint64
    * (offset, nbytes) index (crc32c-verified when declared), then
    * range-read and decode just this inner chunk — the shard is never
    * materialized whole, so shards may exceed the single-buffer
    * bound. An absent shard, or an unwritten inner chunk (the
    * all-ones index sentinel), reads as the fill value. */
  private def loadSharded(path: String, meta: ZarrMeta.Meta,
      sh: ZarrMeta.ShardInfo, chunkCoords: Array[Int]): Option[ByteBuffer] = {
    val cps = sh.shardChunks.zip(meta.chunks).map { case (s, c) => s / c }
    val shardCoords = chunkCoords.zip(cps).map { case (c, k) => c / k }
    val inner = chunkCoords.zip(cps).map { case (c, k) => c % k }
    val key = meta.chunkKey(shardCoords)
    val p = Paths.get(path, key)
    if (!Files.exists(p)) return None
    val nEntries = cps.map(_.toLong).product
    val idxLen = nEntries * 16 + (if (sh.indexCrc32c) 4L else 0L)
    require(idxLen <= Int.MaxValue,
      s"shard index of $nEntries entries exceeds the 2^31-1 buffer bound")
    val ch = java.nio.channels.FileChannel.open(
      p, java.nio.file.StandardOpenOption.READ)
    try {
      val fsize = ch.size()
      require(fsize >= idxLen,
        s"shard $key: ${fsize} bytes < its $idxLen-byte chunk index")
      val idx = readFully(ch, if (sh.indexAtEnd) fsize - idxLen else 0L,
        idxLen.toInt)
      if (sh.indexCrc32c) {
        val crc = new java.util.zip.CRC32C()
        crc.update(idx.array(), 0, (nEntries * 16).toInt)
        val stored = idx.getInt((nEntries * 16).toInt)
        require(crc.getValue.toInt == stored,
          f"shard $key: index crc32c mismatch (stored 0x$stored%08x, " +
            f"computed 0x${crc.getValue.toInt}%08x)")
      }
      var lin = 0L
      var d = 0
      while (d < cps.length) { lin = lin * cps(d) + inner(d); d += 1 }
      val off = idx.getLong((lin * 16).toInt)
      val len = idx.getLong((lin * 16).toInt + 8)
      if (off == -1L && len == -1L) None // unwritten inner chunk: fill
      else {
        require(off >= 0 && len >= 0 && len <= Int.MaxValue &&
            off + len <= fsize,
          s"shard $key: inner chunk ${inner.mkString(",")} range " +
            s"($off, $len) outside the $fsize-byte shard")
        Some(decode(readFully(ch, off, len.toInt).array(), meta,
          s"$key[${inner.mkString(",")}]"))
      }
    } finally ch.close()
  }

  private def readFully(ch: java.nio.channels.FileChannel, pos: Long,
      len: Int): ByteBuffer = {
    val b = ByteBuffer.allocate(len)
    var p = pos
    while (b.hasRemaining) {
      val k = ch.read(b, p)
      require(k >= 0, s"unexpected EOF at $p reading $len bytes")
      p += k
    }
    b.flip()
    b.order(ByteOrder.LITTLE_ENDIAN)
  }

  /** Decompress + validate one decode unit's bytes → little-endian
    * buffer (shared by plain chunks and a shard's inner chunks). */
  private def decode(raw0: Array[Byte], meta: ZarrMeta.Meta,
      key: String): ByteBuffer = {
    val chunkElems: Long = meta.chunks.map(_.toLong).product
    // v3 crc32c codec: 4-byte little-endian checksum over the
    // preceding payload — verify, then strip before decompression
    val raw = if (!meta.checksum) raw0 else {
      require(raw0.length >= 4,
        s"chunk $key: ${raw0.length} bytes < its 4-byte crc32c trailer")
      val crc = new java.util.zip.CRC32C()
      crc.update(raw0, 0, raw0.length - 4)
      val stored = ByteBuffer.wrap(raw0, raw0.length - 4, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      require(crc.getValue.toInt == stored,
        f"chunk $key: crc32c mismatch (stored 0x$stored%08x, " +
          f"computed 0x${crc.getValue.toInt}%08x)")
      java.util.Arrays.copyOfRange(raw0, 0, raw0.length - 4)
    }
    val bytes = meta.compressor match {
        case None => raw
        case Some(b) if b.startsWith("blosc:") => Blosc.decompress(raw)
        case Some("zlib") =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(raw)
          val out = new java.io.ByteArrayOutputStream(raw.length * 4)
          val tmp = new Array[Byte](8192)
          while (!inf.finished()) {
            val k = inf.inflate(tmp)
            if (k == 0 && !inf.finished())
              throw new java.io.IOException(s"truncated zlib chunk $key")
            out.write(tmp, 0, k)
          }
          inf.end()
          out.toByteArray
        case Some("gzip") =>
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw))
          val out = new java.io.ByteArrayOutputStream(raw.length * 4)
          val tmp = new Array[Byte](8192)
          var k = in.read(tmp)
          while (k >= 0) { out.write(tmp, 0, k); k = in.read(tmp) }
          out.toByteArray
        case Some("zstd") => // zarr v3's raw RFC 8878 frame
          val want = (chunkElems * meta.elemSize).toInt
          val dst = new Array[Byte](want)
          val n = com.github.luben.zstd.Zstd.decompressByteArray(
            dst, 0, want, raw, 0, raw.length)
          require(!com.github.luben.zstd.Zstd.isError(n) && n.toInt == want,
            s"zstd chunk $key decoded ${n} bytes, expected $want")
          dst
        case Some(other) =>
          throw new IllegalStateException(s"unsupported compressor $other")
      }
    require(bytes.length.toLong == chunkElems * meta.elemSize,
      s"chunk $key: ${bytes.length} bytes != $chunkElems elems × ${meta.elemSize}")
    ByteBuffer.wrap(bytes).order(
      if (meta.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
  }
}

/** Raw time counts → Spark TimestampType micros (UTC). Integral counts
  * convert with exact integer arithmetic (multiplyExact fails loudly
  * on the astronomically-far-future overflow instead of wrapping);
  * CF float values round at the µs — exact in double for any
  * realistic axis (µs magnitudes < 2^53 through year ~2255). */
private[zarr] object ZarrTime {
  def microsOfLong(raw: Long, ti: ZarrMeta.TimeInfo): Long =
    Math.addExact(
      Math.floorDiv(Math.multiplyExact(raw, ti.unitNanos), 1000L),
      ti.epochMicros)
  def microsOfDouble(v: Double, ti: ZarrMeta.TimeInfo): Long =
    Math.addExact(Math.round(v * (ti.unitNanos.toDouble / 1000.0)),
      ti.epochMicros)
}

class ZarrDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrMeta.read(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    new ZarrTable(path, ZarrMeta.read(path))
  }
}

class ZarrTable(path: String, meta: ZarrMeta.Meta) extends Table with SupportsRead {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = meta.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, meta)
}

class ZarrScanBuilder(path: String, meta: ZarrMeta.Meta) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = meta.schema
  // per-dim inclusive index bounds, tightened by pushed predicates
  private val lo = Array.fill(meta.nDims)(0L)
  private val hi = meta.shape.map(_ - 1)
  private var pushed: Array[Filter] = Array.empty

  private def dimIndex(name: String): Int = meta.dims.indexOf(name)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    val used = filters.filter {
      case EqualTo(a, v) if dimIndex(a) >= 0 =>
        val d = dimIndex(a)
        asLong(v).exists { x =>
          lo(d) = math.max(lo(d), x); hi(d) = math.min(hi(d), x); true }
      case GreaterThan(a, v) if dimIndex(a) >= 0 =>
        val d = dimIndex(a)
        asLong(v).exists { x => lo(d) = math.max(lo(d), x + 1); true }
      case GreaterThanOrEqual(a, v) if dimIndex(a) >= 0 =>
        val d = dimIndex(a)
        asLong(v).exists { x => lo(d) = math.max(lo(d), x); true }
      case LessThan(a, v) if dimIndex(a) >= 0 =>
        val d = dimIndex(a)
        asLong(v).exists { x => hi(d) = math.min(hi(d), x - 1); true }
      case LessThanOrEqual(a, v) if dimIndex(a) >= 0 =>
        val d = dimIndex(a)
        asLong(v).exists { x => hi(d) = math.min(hi(d), x); true }
      case _ => false
    }
    pushed = used
    // pruning is CHUNK-granular: every filter still needs row-level
    // evaluation above the scan, so all of them come back as residual
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ZarrScan(path, meta, required, lo.clone(), hi.clone())
}

/** One stored chunk. `coords` is the chunk's index in the chunk grid. */
final case class ZarrChunkPartition(coords: Array[Int]) extends InputPartition

class ZarrScan(path: String, meta: ZarrMeta.Meta, required: StructType,
    lo: Array[Long], hi: Array[Long]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val box = meta.dims.indices
      .map(d => s"${meta.dims(d)}∈[${lo(d)},${hi(d)}]").mkString(", ")
    s"graft-zarr $path [$box]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val counts = meta.chunkCounts
    // enumerate the chunk grid; keep chunks whose index box intersects
    // the pushed bounds — the read-only-this-slice contract
    def expand(d: Int, acc: Array[Int]): Iterator[Array[Int]] =
      if (d == meta.nDims) Iterator.single(acc)
      else (0 until counts(d)).iterator.flatMap { c =>
        val cLo = c.toLong * meta.chunks(d)
        val cHi = math.min(cLo + meta.chunks(d), meta.shape(d)) - 1
        if (cHi < lo(d) || cLo > hi(d)) Iterator.empty
        else expand(d + 1, acc :+ c)
      }
    expand(0, Array.empty).map(c => ZarrChunkPartition(c): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(path, meta, required.fieldNames)
}

class ZarrReaderFactory(path: String, meta: ZarrMeta.Meta,
    requiredFields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrChunkReader(path, meta, requiredFields,
      partition.asInstanceOf[ZarrChunkPartition].coords)

  // the chunk buffer is ALREADY a columnar little-endian array, and
  // every supported dtype is a fixed-width primitive — hand Spark
  // ColumnarBatches (vectorized scan → ColumnarToRow stays codegen'd)
  // instead of one boxed GenericInternalRow per element
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new ZarrColumnarChunkReader(path, meta, requiredFields,
      partition.asInstanceOf[ZarrChunkPartition].coords)
}

/** Decodes ONE chunk: raw/zlib/gzip bytes → little-endian buffer →
  * C-order walk emitting in-bounds elements (zarr stores edge chunks
  * padded to full chunk size; padding positions are skipped, never
  * emitted). A missing chunk file yields the fill value everywhere —
  * zarr's sparse-store contract. */
class ZarrChunkReader(path: String, meta: ZarrMeta.Meta,
    requiredFields: Array[String], chunkCoords: Array[Int])
    extends PartitionReader[InternalRow] {

  private val n = meta.nDims
  private val chunkElems = meta.chunks.map(_.toLong).product
  // required-field plan: dim index, or -1 for the value column
  private val fieldPlan: Array[Int] =
    requiredFields.map(f => if (f == "value") -1 else meta.dims.indexOf(f))

  private val buf: Option[ByteBuffer] = ZarrChunkIO.load(path, meta, chunkCoords)

  private var pos = -1L
  private val offsets = new Array[Long](n) // per-dim offset within the chunk
  private val globals = new Array[Long](n) // global indices of current element
  // v3 transpose codec: the buffer is the chunk permuted by `order`,
  // so the element's buffer position is the C-order linear index of
  // the permuted offsets over the permuted chunk shape (identity
  // order was normalized away at parse)
  private val ord: Array[Int] = meta.order.orNull
  private var bufPos = -1L

  private def decodePos(p: Long): Boolean = {
    // C order: last dimension fastest
    var rem = p
    var d = n - 1
    var inBounds = true
    while (d >= 0) {
      offsets(d) = rem % meta.chunks(d)
      rem /= meta.chunks(d)
      globals(d) = chunkCoords(d).toLong * meta.chunks(d) + offsets(d)
      if (globals(d) >= meta.shape(d)) inBounds = false
      d -= 1
    }
    bufPos = if (ord == null) p else {
      var bp = 0L
      var k = 0
      while (k < n) { bp = bp * meta.chunks(ord(k)) + offsets(ord(k)); k += 1 }
      bp
    }
    inBounds
  }

  override def next(): Boolean = {
    pos += 1
    while (pos < chunkElems && !decodePos(pos)) pos += 1
    pos < chunkElems
  }

  // time decode (datetime64 / CF units): values box to TimestampType
  // micros, NaT (Long.MinValue) and CF NaN to null
  private val ti = meta.time.orNull
  private def cfMicros(v: Double): Any =
    if (v.isNaN) null else ZarrTime.microsOfDouble(v, ti)

  private def valueAt(p: Long): Any = buf match {
    case Some(b) => meta.dtype match {
      case "<f8" =>
        val v = b.getDouble((p * 8).toInt)
        if (ti == null) v else cfMicros(v)
      case "<f4" =>
        val v = b.getFloat((p * 4).toInt)
        if (ti == null) v else cfMicros(v.toDouble)
      case "<i8" =>
        val v = b.getLong((p * 8).toInt)
        if (ti == null) v else ZarrTime.microsOfLong(v, ti)
      case "<M8" =>
        val v = b.getLong((p * 8).toInt)
        if (v == Long.MinValue) null else ZarrTime.microsOfLong(v, ti)
      case "<i4" =>
        val v = b.getInt((p * 4).toInt)
        if (ti == null) v else ZarrTime.microsOfLong(v.toLong, ti)
      case "<i2" =>
        val v = b.getShort((p * 2).toInt)
        if (ti == null) v else ZarrTime.microsOfLong(v.toLong, ti)
      case "<i1" => b.get(p.toInt)
      case "<u1" => (b.get(p.toInt) & 0xFF).toShort // unsigned widen
      case "<b1" => b.get(p.toInt) != 0
    }
    case None => fillAny // missing chunk: fill value
  }

  private lazy val fillAny: Any = meta.dtype match {
    case "<f8" =>
      if (ti == null) meta.fillValue else cfMicros(meta.fillValue)
    case "<f4" =>
      if (ti == null) meta.fillValue.toFloat else cfMicros(meta.fillValue)
    case "<i8" =>
      if (ti == null) meta.fillValue.toLong
      else ZarrTime.microsOfLong(meta.fillValue.toLong, ti)
    case "<M8" =>
      if (meta.fillValue.isNaN) null // NaT fill
      else ZarrTime.microsOfLong(meta.fillValue.toLong, ti)
    case "<i4" =>
      if (ti == null) meta.fillValue.toInt
      else ZarrTime.microsOfLong(meta.fillValue.toLong, ti)
    case "<i2" =>
      if (ti == null) meta.fillValue.toShort
      else ZarrTime.microsOfLong(meta.fillValue.toLong, ti)
    case "<i1" => meta.fillValue.toByte
    case "<u1" => meta.fillValue.toInt.toShort
    case "<b1" => meta.fillValue != 0.0
  }

  override def get(): InternalRow = {
    val row = new Array[Any](fieldPlan.length)
    var i = 0
    while (i < fieldPlan.length) {
      row(i) = if (fieldPlan(i) < 0) valueAt(bufPos) else globals(fieldPlan(i))
      i += 1
    }
    new GenericInternalRow(row)
  }

  override def close(): Unit = ()
}

/** Vectorized chunk reader — the native-format hot path. The chunk is
  * already one contiguous columnar little-endian buffer, so elements
  * transfer into `OnHeapColumnVector`s in 4096-row batches with no
  * per-element row allocation; edge-chunk padding positions are
  * skipped, missing chunks vectorize the fill value. Emits exactly the
  * rows [[ZarrChunkReader]] would (ZarrSpec parity + the q_scan_zarr
  * oracle cover both paths through the same plans). */
class ZarrColumnarChunkReader(path: String, meta: ZarrMeta.Meta,
    requiredFields: Array[String], chunkCoords: Array[Int])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val n = meta.nDims
  private val chunkElems = meta.chunks.map(_.toLong).product
  // required-field plan: dim index, or -1 for the value column
  private val fieldPlan: Array[Int] =
    requiredFields.map(f => if (f == "value") -1 else meta.dims.indexOf(f))
  private val buf: Option[ByteBuffer] = ZarrChunkIO.load(path, meta, chunkCoords)

  private val BatchRows = 4096
  private val vectors: Array[OnHeapColumnVector] = fieldPlan.map { p =>
    new OnHeapColumnVector(BatchRows, if (p < 0) meta.valueType else LongType)
  }
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  private var pos = 0L // next chunk position to examine
  private val offsets = new Array[Long](n)
  private val globals = new Array[Long](n)
  // v3 transpose codec: see ZarrChunkReader — buffer position of the
  // current logical element under the stored permutation
  private val ord: Array[Int] = meta.order.orNull
  private var bufPos = 0L

  private def decodePos(p: Long): Boolean = {
    // C order: last dimension fastest
    var rem = p
    var d = n - 1
    var inBounds = true
    while (d >= 0) {
      offsets(d) = rem % meta.chunks(d)
      rem /= meta.chunks(d)
      globals(d) = chunkCoords(d).toLong * meta.chunks(d) + offsets(d)
      if (globals(d) >= meta.shape(d)) inBounds = false
      d -= 1
    }
    bufPos = if (ord == null) p else {
      var bp = 0L
      var k = 0
      while (k < n) { bp = bp * meta.chunks(ord(k)) + offsets(ord(k)); k += 1 }
      bp
    }
    inBounds
  }

  // time decode (datetime64 / CF units): TimestampType vectors are
  // long-backed micros; NaT / CF NaN vectorize as nulls
  private val ti = meta.time.orNull
  private def putCf(v: OnHeapColumnVector, row: Int, x: Double): Unit =
    if (x.isNaN) v.putNull(row)
    else v.putLong(row, ZarrTime.microsOfDouble(x, ti))

  private def putValue(v: OnHeapColumnVector, row: Int, p: Long): Unit = buf match {
    case Some(b) => meta.dtype match {
      case "<f8" =>
        if (ti == null) v.putDouble(row, b.getDouble((p * 8).toInt))
        else putCf(v, row, b.getDouble((p * 8).toInt))
      case "<f4" =>
        if (ti == null) v.putFloat(row, b.getFloat((p * 4).toInt))
        else putCf(v, row, b.getFloat((p * 4).toInt).toDouble)
      case "<i8" =>
        if (ti == null) v.putLong(row, b.getLong((p * 8).toInt))
        else v.putLong(row, ZarrTime.microsOfLong(b.getLong((p * 8).toInt), ti))
      case "<M8" =>
        val raw = b.getLong((p * 8).toInt)
        if (raw == Long.MinValue) v.putNull(row) // NaT
        else v.putLong(row, ZarrTime.microsOfLong(raw, ti))
      case "<i4" =>
        if (ti == null) v.putInt(row, b.getInt((p * 4).toInt))
        else v.putLong(row, ZarrTime.microsOfLong(b.getInt((p * 4).toInt).toLong, ti))
      case "<i2" =>
        if (ti == null) v.putShort(row, b.getShort((p * 2).toInt))
        else v.putLong(row, ZarrTime.microsOfLong(b.getShort((p * 2).toInt).toLong, ti))
      case "<i1" => v.putByte(row, b.get(p.toInt))
      case "<u1" => v.putShort(row, (b.get(p.toInt) & 0xFF).toShort)
      case "<b1" => v.putBoolean(row, b.get(p.toInt) != 0)
    }
    case None => meta.dtype match { // missing chunk: fill value
      case "<f8" =>
        if (ti == null) v.putDouble(row, meta.fillValue)
        else putCf(v, row, meta.fillValue)
      case "<f4" =>
        if (ti == null) v.putFloat(row, meta.fillValue.toFloat)
        else putCf(v, row, meta.fillValue)
      case "<i8" =>
        if (ti == null) v.putLong(row, meta.fillValue.toLong)
        else v.putLong(row, ZarrTime.microsOfLong(meta.fillValue.toLong, ti))
      case "<M8" =>
        if (meta.fillValue.isNaN) v.putNull(row) // NaT fill
        else v.putLong(row, ZarrTime.microsOfLong(meta.fillValue.toLong, ti))
      case "<i4" =>
        if (ti == null) v.putInt(row, meta.fillValue.toInt)
        else v.putLong(row, ZarrTime.microsOfLong(meta.fillValue.toLong, ti))
      case "<i2" =>
        if (ti == null) v.putShort(row, meta.fillValue.toShort)
        else v.putLong(row, ZarrTime.microsOfLong(meta.fillValue.toLong, ti))
      case "<i1" => v.putByte(row, meta.fillValue.toByte)
      case "<u1" => v.putShort(row, meta.fillValue.toInt.toShort)
      case "<b1" => v.putBoolean(row, meta.fillValue != 0.0)
    }
  }

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var rows = 0
    while (rows < BatchRows && pos < chunkElems) {
      if (decodePos(pos)) {
        var f = 0
        while (f < fieldPlan.length) {
          val fp = fieldPlan(f)
          if (fp >= 0) vectors(f).putLong(rows, globals(fp))
          else putValue(vectors(f), rows, bufPos)
          f += 1
        }
        rows += 1
      }
      pos += 1
    }
    batch.setNumRows(rows)
    rows > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = batch.close()
}
