package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}

/** Dense bitmask over a quantized (latCell, lonCell) grid — the
  * broadcast-side payload of the land-mask probe (SURVEY §7.4's
  * optional custom piece). One bit per grid cell, row-major from the
  * grid's min corner: a full global 1 km-quantized mask is tens of MB
  * of BITS (vs hundreds of MB as a broadcast hash relation of cell-pair
  * rows), and the probe is two subtractions, two bounds checks, one
  * word index — no hashing, no probe walk.
  */
final case class CellMask(latMin: Int, lonMin: Int, nLat: Int, nLon: Int,
    words: Array[Long]) {
  // the dense row-major index i*nLon+j is int arithmetic in contains()
  // AND in the generated code — a grid past 2^31-1 cells would truncate
  // identically on both the build and probe sides and go silently
  // wrong, so oversized extents must fail the BUILD loudly
  require(nLat.toLong * nLon <= Int.MaxValue,
    s"grid of ${nLat}x$nLon cells exceeds the dense bitmask's 2^31-1 " +
      "addressable bound; use the broadcast semi-join form for such extents")
  require(words.length == ((nLat.toLong * nLon + 63) >> 6).toInt,
    s"word count ${words.length} does not cover ${nLat}x$nLon cells")

  def contains(lat: Int, lon: Int): Boolean = {
    val i = lat - latMin
    val j = lon - lonMin
    if (i < 0 || i >= nLat || j < 0 || j >= nLon) false
    else {
      val idx = i * nLon + j
      ((words(idx >>> 6) >>> (idx & 63)) & 1L) != 0L
    }
  }
}

object CellMask {

  /** Distributed build from a two-int-column DataFrame of cells: the
    * extent is one 4-scalar aggregate, then each partition folds its
    * cells into a dense word array and the arrays OR-merge through
    * `treeReduce` — the driver never collects a single cell ROW, it
    * receives already-merged word ARRAYS (~1 bit/cell). This is what
    * lets the build scale to the reference's real mask resolution
    * (global_land_mask at ~1 km is ~5x10^8 cells: the bitmask is
    * ~64 MB and fits; a driver collect of the cell rows does not).
    * NULL cells are skipped — a null index can never probe true,
    * exactly as a null-rejecting join key drops the row in the
    * semi-join form. */
  def fromCellsDistributed(cells: org.apache.spark.sql.DataFrame): CellMask = {
    import org.apache.spark.sql.functions.{col, max, min}
    val cls = cells.columns
    require(cls.length == 2, s"expected (latCell, lonCell) columns, got ${cls.mkString(",")}")
    val ext = cells.agg(min(col(cls(0))), max(col(cls(0))),
      min(col(cls(1))), max(col(cls(1)))).head()
    require(!ext.isNullAt(0), "cannot build a CellMask from zero cells")
    val (latMin, latMax, lonMin, lonMax) =
      (ext.getInt(0), ext.getInt(1), ext.getInt(2), ext.getInt(3))
    val nLat = latMax - latMin + 1
    val nLon = lonMax - lonMin + 1
    require(nLat.toLong * nLon <= Int.MaxValue,
      s"grid of ${nLat}x$nLon cells exceeds the dense bitmask's 2^31-1 " +
        "addressable bound; use the broadcast semi-join form for such extents")
    val nWords = ((nLat.toLong * nLon + 63) >> 6).toInt
    // primitives only in the task closure (never `this`, never the df)
    val (laMin, laMax, loMin, loMax, nLonC) = (latMin, latMax, lonMin, lonMax, nLon)
    val words = cells.rdd.mapPartitions { it =>
      val arr = new Array[Long](nWords)
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val la = r.getInt(0)
          val lo = r.getInt(1)
          // this fold is the SECOND evaluation of `cells` (the extent
          // aggregate was the first): a non-deterministic source can
          // emit a cell outside the first-pass extent here, and its
          // flat index would silently set a bit in an adjacent lat row
          // — fail loudly instead of corrupting the mask
          require(la >= laMin && la <= laMax && lo >= loMin && lo <= loMax,
            s"cell ($la,$lo) outside the first-pass extent " +
              s"[$laMin..$laMax]x[$loMin..$loMax]: the cells input is " +
              "non-deterministic across evaluations")
          val idx = (la - laMin) * nLonC + (lo - loMin)
          arr(idx >>> 6) |= 1L << (idx & 63)
        }
      }
      Iterator.single(arr)
    }.treeReduce({ (a, b) =>
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }, depth = 2)
    CellMask(latMin, lonMin, nLat, nLon, words)
  }

  /** Build from the distinct land-cell set. The extent is the cells'
    * bounding box; everything outside it probes to false. */
  def fromCells(cells: Iterable[(Int, Int)]): CellMask = {
    require(cells.nonEmpty, "cannot build a CellMask from zero cells")
    val latMin = cells.iterator.map(_._1).min
    val latMax = cells.iterator.map(_._1).max
    val lonMin = cells.iterator.map(_._2).min
    val lonMax = cells.iterator.map(_._2).max
    val nLat = latMax - latMin + 1
    val nLon = lonMax - lonMin + 1
    // fail BEFORE allocating the word array (the case-class require
    // would catch it too, but only after a multi-hundred-MB allocation)
    require(nLat.toLong * nLon <= Int.MaxValue,
      s"grid of ${nLat}x$nLon cells exceeds the dense bitmask's 2^31-1 " +
        "addressable bound; use the broadcast semi-join form for such extents")
    val words = new Array[Long](((nLat.toLong * nLon + 63) >> 6).toInt)
    cells.foreach { case (la, lo) =>
      val idx = (la - latMin) * nLon + (lo - lonMin)
      words(idx >>> 6) |= 1L << (idx & 63)
    }
    CellMask(latMin, lonMin, nLat, nLon, words)
  }
}

/** Native Catalyst expression: `cell ∈ mask` as a codegen'd bit probe.
  *
  * The semi-join formulation ([[graft.operators.Climate.landMask]])
  * ships the lookup as a broadcast hash relation and pays a hash +
  * probe-walk per row; this expression embeds the same set as a literal
  * bitmask in the plan, so the per-row cost inside the scan's
  * whole-stage-codegen loop is integer arithmetic only — and the filter
  * participates in codegen'd predicate pipelines (no join operator in
  * the plan at all). Bit-identical to the semi-join on non-null cells;
  * NULL cell indices yield NULL (dropped by Filter), exactly as a
  * null-rejecting join key drops them — parity asserted in
  * CellMaskSpec, plan shape pinned in PlanSpec. The semi-join remains
  * the fallback for lookups too large or too dynamic to embed.
  */
case class CellMaskContains(latCell: Expression, lonCell: Expression,
    mask: CellMask) extends BinaryExpression {

  override def left: Expression = latCell
  override def right: Expression = lonCell

  override def checkInputDataTypes(): TypeCheckResult =
    (latCell.dataType, lonCell.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int) cell indices, " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cellmask"

  override protected def nullSafeEval(la: Any, lo: Any): Any =
    mask.contains(la.asInstanceOf[Int], lo.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) => {
      // the words array rides along as a plan reference object — the
      // grid geometry folds into the generated source as constants
      val w = ctx.addReferenceObj("cellMaskWords", mask.words, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |int $i = $la - (${mask.latMin});
         |int $j = $lo - (${mask.lonMin});
         |if ($i < 0 || $i >= ${mask.nLat} || $j < 0 || $j >= ${mask.nLon}) {
         |  ${ev.value} = false;
         |} else {
         |  int $idx = $i * ${mask.nLon} + $j;
         |  ${ev.value} = (($w[$idx >>> 6] >>> ($idx & 63)) & 1L) != 0L;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellMaskContains =
    copy(latCell = newLeft, lonCell = newRight)
}
