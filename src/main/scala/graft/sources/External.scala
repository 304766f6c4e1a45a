package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-process boundary (SURVEY §2.1 external-process sink +
  * config sink; reference: tippecanoe/mb-util subprocess calls
  * precipitation_pipeline.py:241-268 and the tileserver config write
  * :315-347). Kept OUTSIDE the relational core per SURVEY §2.11.4 —
  * tile generation is presentation, not query semantics — but the
  * engine provides the scalable plumbing:
  *
  *  - [[pipePartitions]] streams each partition's rows through an
  *    external command (RDD `pipe` — one process per partition,
  *    stdin/stdout line protocol). This is how a tippecanoe-style
  *    binary would consume GeoJSON features at scale: processes run
  *    ON THE EXECUTORS, one per partition, no driver materialization.
  *  - [[writeTileConfig]] emits the run-level JSON config (a tiny
  *    driver-side artifact listing produced layers, like the
  *    reference's tileserver-gl config).
  */
object External {

  /** Pipe every partition's rows (serialized as compact JSON lines)
    * through `cmd`; returns the command's stdout lines. */
  def pipePartitions(df: DataFrame, cmd: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(to_json(struct(col("*"))).as("line")).as[String]
      .rdd.pipe(cmd).toDF("line")
  }

  /** Compact tileserver-style config: {"styles":{},"data":{<name>:
    * {"pbf":"<dir>/<name>"}}} — the shape of the reference's config
    * write (precipitation_pipeline.py:315-347), minus server paths. */
  def writeTileConfig(layerNames: Seq[String], dataDir: String, outPath: String): Unit = {
    // JSON string escaping — unescaped quotes/backslashes/control
    // chars in a layer name or path would emit malformed JSON
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val entries = layerNames.sorted.map { n =>
      s""""${esc(n)}":{"pbf":"${esc(s"$dataDir/$n")}"}"""
    }.mkString(",")
    Files.writeString(Paths.get(outPath), s"""{"styles":{},"data":{$entries}}""")
  }

  /** Static HTML tile viewer — the presentation-tier sibling of
    * [[writeTileConfig]] (reference: `create_web_viewer`,
    * precipitation_pipeline.py:349-602, a one-shot HTML string write).
    * Original markup, same semantics: a single self-contained page
    * with period selectors, a raster layer addressed as
    * `<serverUrl>/data/<layer>/{z}/{x}/{y}.png`, an opacity toggle,
    * a legend, and a server liveness badge. Zero query semantics —
    * a driver-side artifact write, deliberately outside the
    * relational core (SURVEY §2.11.4).
    *
    * `layerTemplate` names the served layer with `{year}`/`{month}`
    * placeholders substituted client-side (the reference hardcodes
    * `precipitation_{month}_{year}_land`). All interpolated values are
    * HTML-escaped; the template and URL are additionally embedded as
    * JS string literals via JSON escaping so quotes cannot break out. */
  def writeHtmlViewer(outPath: String, title: String, serverUrl: String,
      layerTemplate: String, years: Seq[Int],
      legendLabel: String = "value",
      legendStops: Seq[String] = Seq("0", "25%", "50%", "75%", "max")): Unit = {
    require(years.nonEmpty, "writeHtmlViewer: years must be non-empty")
    def h(s: String): String = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case '\'' => "&#39;"; case c => c.toString
    }
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case '<' => "\\u003c" // defuses </script> inside the literal
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val yearOpts = years.sorted.map { y =>
      val sel = if (y == years.max) " selected" else ""
      s"""<option value="$y"$sel>$y</option>"""
    }.mkString
    val monthOpts = (1 to 12).map { m =>
      val mm = f"$m%02d"
      s"""<option value="$mm">$mm</option>"""
    }.mkString
    val stops = legendStops.map(s => s"<span>${h(s)}</span>").mkString
    val html =
      s"""<!DOCTYPE html>
         |<html lang="en"><head><meta charset="UTF-8">
         |<title>${h(title)}</title>
         |<style>
         |body{margin:0;font-family:sans-serif}
         |#panel{position:absolute;top:8px;left:8px;z-index:10;background:#fffdf7;padding:10px;border-radius:6px;box-shadow:0 1px 6px #0003}
         |#frame{position:absolute;inset:0;display:grid;place-items:center;background:#eef3f8}
         |#tile{max-width:70%;border:1px solid #ccd}
         |#legend{position:absolute;bottom:8px;right:8px;z-index:10;background:#fffdf7;padding:10px;border-radius:6px}
         |#bar{width:180px;height:14px;background:linear-gradient(to right,#fef6d8,#9cc7e8,#3f6fd1,#1b2f8a);border:1px solid #aab}
         |#stops{display:flex;justify-content:space-between;font-size:10px;color:#567}
         |#status{font-size:11px;color:#567;margin-top:6px}
         |</style></head><body>
         |<div id="panel">
         |<strong>${h(title)}</strong><br>
         |<label>Year <select id="yr">$yearOpts</select></label>
         |<label>Month <select id="mo">$monthOpts</select></label>
         |<button id="go">Show</button>
         |<button id="dim">Opacity</button>
         |<div id="status">server: <span id="alive">?</span> &middot; layer: <span id="cur">-</span></div>
         |</div>
         |<div id="frame"><img id="tile" alt="tile preview"></div>
         |<div id="legend"><div>${h(legendLabel)}</div><div id="bar"></div><div id="stops">$stops</div></div>
         |<script>
         |var SERVER=${js(serverUrl)};
         |var TEMPLATE=${js(layerTemplate)};
         |var dim=false;
         |function layerId(){
         |  return TEMPLATE.replace("{year}",document.getElementById("yr").value)
         |                 .replace("{month}",document.getElementById("mo").value);
         |}
         |function show(){
         |  var id=layerId();
         |  var img=document.getElementById("tile");
         |  img.src=SERVER+"/data/"+encodeURIComponent(id)+"/0/0/0.png";
         |  img.style.opacity=dim?0.4:0.9;
         |  document.getElementById("cur").textContent=id;
         |}
         |function ping(){
         |  fetch(SERVER).then(function(r){
         |    document.getElementById("alive").textContent=r.ok?"up":"error";
         |  }).catch(function(){
         |    document.getElementById("alive").textContent="down";
         |  });
         |}
         |document.getElementById("go").addEventListener("click",show);
         |document.getElementById("dim").addEventListener("click",function(){dim=!dim;show();});
         |show();ping();setInterval(ping,5000);
         |</script></body></html>
         |""".stripMargin
    Files.writeString(Paths.get(outPath), html)
  }
}
