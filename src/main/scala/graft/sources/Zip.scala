package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Local zip-archive ingest — the implementable half of the reference's
  * HTTP+zip source (population_pipeline.py:16-25 downloads a zip,
  * unzips, reads the CSV inside). The HTTP half is a driver utility
  * (and this env is zero-egress); the archive→table half is engine
  * work: a `binaryFile` scan of `*.zip` followed by partition-local
  * `java.util.zip` expansion into CSV lines, parsed by the normal
  * schema'd CSV reader.
  *
  * Scale posture: a zip archive is NOT splittable (entries are
  * deflate-compressed against a central directory), so each archive is
  * one `binaryFile` row and one task — parallelism comes from the
  * NUMBER of archives, which is the natural unit at scale (the
  * reference's source publishes one zip per dataset/year). Entry
  * contents stream through the codec line-by-line; nothing beyond the
  * raw archive bytes (already the binaryFile row) is materialized.
  * `binaryFile` caps a row at `spark.sql.sources.binaryFile
  * .maxLength` (2 GB default) — archives beyond that must be split at
  * publish time, same as any non-splittable format.
  */
object Zip {

  /** CSV lines of every `*.csv` entry inside every archive matched by
    * `path`. With `header=true` the first line of EACH entry is
    * dropped (every member file carries its own header, mirroring
    * Spark's own per-file CSV header handling). Non-CSV entries and
    * directories are skipped.
    */
  def zipCsvLines(s: SparkSession, path: String, header: Boolean = true): Dataset[String] = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        // explicit two-level iterator (not continually/filter/flatMap):
        // ZipInputStream is a single sequential cursor, so the next
        // entry must never be pulled before the current entry's lines
        // are exhausted — Iterator.filter's hasNext lookahead would do
        // exactly that.
        new Iterator[String] {
          private var lines: Iterator[String] = Iterator.empty
          private def advance(): Boolean = {
            var e = zin.getNextEntry
            while (e != null && (e.isDirectory || !e.getName.toLowerCase.endsWith(".csv")))
              e = zin.getNextEntry
            if (e == null) false
            else {
              val r = new BufferedReader(new InputStreamReader(zin, StandardCharsets.UTF_8))
              lines = Iterator.continually(r.readLine()).takeWhile(_ != null)
              if (header && lines.hasNext) lines.next()
              true
            }
          }
          def hasNext: Boolean = {
            while (!lines.hasNext) if (!advance()) return false
            true
          }
          def next(): String = {
            if (!hasNext) throw new NoSuchElementException("zip exhausted")
            lines.next()
          }
        }
      }
  }

  /** Schema'd table over the CSV entries of zip archives: the
    * reference's unzip→read_csv, as one lazy plan. The schema is
    * DECLARED (SURVEY §1.4) — no inference pass over the expanded
    * lines.
    */
  def readZippedCsv(s: SparkSession, path: String, schema: StructType,
                    header: Boolean = true): DataFrame =
    s.read.schema(schema).csv(zipCsvLines(s, path, header))
}
