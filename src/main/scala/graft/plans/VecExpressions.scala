package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over `array<float>` / `array<double>` columns.
  *
  * The composable form (zip_with + aggregate) is CodegenFallback —
  * interpreted per row with array allocation — which dominates wall-clock on
  * all-pairs similarity. These expressions run one compiled loop per pair.
  *
  * Semantics are bit-identical to the higher-order form and the DuckDB
  * oracle: floats are promoted to double before multiplying, and the
  * accumulators (dot, |a|², |b|²) fold left in index order, then
  * dot / (sqrt(na) * sqrt(nb)). Inputs of unequal length compare over the
  * common prefix (embeddings are fixed-dim by contract).
  *
  * Null/NaN contract (matches the HOF form's null propagation): a NULL
  * array yields NULL; an array containing a NULL element yields NULL; a
  * zero-norm vector yields NULL cosine (the HOF form's 0/0 = NaN has no
  * cross-engine hash representation, so NULL is the declared result).
  * Element types are checked at analysis time — both sides must be
  * array<float> or both array<double>; anything else fails analysis
  * instead of silently reinterpreting bytes.
  */
object VecOps {
  // Boxed returns: null encodes "no result" (a NULL array element, or a
  // zero-norm cosine). A genuine NaN PAYLOAD still propagates as NaN —
  // exactly like the zip_with/aggregate HOF form — so the two cases are
  // not conflated (a NaN sentinel could not tell them apart).

  /** Left-fold dot product in double precision, index order (float). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Left-fold dot product, double-element arrays. */
  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Shared shape for the two vector-similarity binaries: float/double
  * element dispatch, analysis-time type checking, boxed-null result
  * mapping (NULL element / zero norm → NULL; NaN payloads stay NaN) in
  * both interpreted and generated paths.
  */
trait VecBinaryExpr extends BinaryExpression {
  /** VecOps method name for float-element arrays ("dot" / "cosine"). */
  protected def floatFn: String

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(l), Some(r)) if l == r => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double> " +
          s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  private def fn: String = left.dataType match {
    case ArrayType(DoubleType, _) => floatFn + "D"
    case _ => floatFn
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r: java.lang.Double =
      if (fn.endsWith("D"))
        if (floatFn == "dot") VecOps.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        else VecOps.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else
        if (floatFn == "dot") VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        else VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.plans.VecOps.$fn($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** Random-hyperplane LSH bucketing compiled to one pass over the vector.
  *
  * Bit j of the result is set when proj_j = Σ_i sign(i,j)·v_i > 0, with
  * sign(i,j) = +1 iff ((i+1)·2654435761 + (j+1)·40503) mod 65536 < 32768 —
  * identical arithmetic (and per-accumulator left-fold order, so
  * bit-identical doubles) to the HOF form in `Vec.rpLshBucketHof` and the
  * DuckDB oracle. The HOF form builds nBits CodegenFallback
  * zip_with/aggregate passes per row; this runs one compiled i-major loop
  * updating all nBits accumulators per element.
  */
object RpLsh {
  /** Null means: input array contained a NULL element. */
  def bucketF(v: ArrayData, nBits: Int): java.lang.Long = {
    val n = v.numElements()
    val projs = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getFloat(i).toDouble
      var j = 0
      while (j < nBits) {
        val s = if (((i + 1) * 2654435761L + (j + 1) * 40503L) % 65536L < 32768L) x else -x
        projs(j) += s
        j += 1
      }
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < nBits) { if (projs(j) > 0) b |= 1L << j; j += 1 }
    b
  }

  def bucketD(v: ArrayData, nBits: Int): java.lang.Long = {
    val n = v.numElements()
    val projs = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      var j = 0
      while (j < nBits) {
        val s = if (((i + 1) * 2654435761L + (j + 1) * 40503L) % 65536L < 32768L) x else -x
        projs(j) += s
        j += 1
      }
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < nBits) { if (projs(j) > 0) b |= 1L << j; j += 1 }
    b
  }
}

case class RpLshBucketExpr(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 63, "nBits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rp_lsh_bucket requires an array<float> or array<double> argument, " +
        s"got ${other.sql}")
  }

  private def fn: String = child.dataType match {
    case ArrayType(DoubleType, _) => "bucketD"
    case _ => "bucketF"
  }

  override protected def nullSafeEval(v: Any): Any =
    (if (fn == "bucketD") RpLsh.bucketD(v.asInstanceOf[ArrayData], nBits)
     else RpLsh.bucketF(v.asInstanceOf[ArrayData], nBits)): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.plans.RpLsh.$fn($v, $nBits);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RpLshBucketExpr =
    copy(child = newChild)
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends VecBinaryExpr {
  override protected def floatFn: String = "cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends VecBinaryExpr {
  override protected def floatFn: String = "dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** The centroid side of [[NearestCellExpr]], precomputed once per plan:
  * cell ids ascending (the tie-break order), centroid vectors, and each
  * centroid's self-dot-product (left fold in index order — the same
  * accumulation [[VecOps.dot]] would produce). Rides into generated code
  * as one reference object; its memory contract is exactly the
  * `broadcast(centroids)` it replaces (k centroid vectors on the driver
  * and every executor).
  */
final class CentroidTable(cellIds: Array[Int],
    centroids: Array[Array[Float]]) extends Serializable {
  require(cellIds.length == centroids.length,
    s"${cellIds.length} cell ids vs ${centroids.length} centroids")
  val (cells, vecs) = {
    val order = cellIds.indices.sortBy(cellIds)
    (order.map(cellIds).toArray, order.map(centroids).toArray)
  }
  val ccs: Array[Double] = vecs.map { c =>
    var a = 0.0; var i = 0
    while (i < c.length) { a += c(i).toDouble * c(i).toDouble; i += 1 }
    a
  }
}

object NearestCell {
  /** Argmin over the centroid table of
    * round(greatest(0, x·x − 2·x·c + c·c), 6), ties to the smallest cell
    * id — bit-identical to the declarative form it compiles away
    * (per-candidate dist², Spark's HALF_UP double round, Spark's double
    * ordering: −0.0 < 0.0 < NaN), because IVF assignment boundaries and
    * every k-means oracle depend on that exact arithmetic.
    *
    * Null contract mirrors the candidate-stream form: a NULL element in
    * the point or a centroid makes that candidate's dist² NULL, and
    * NULLs order FIRST in the struct-min it replaces — so the result is
    * (first such cell in ascending order, null dist²).
    */
  def assignF(v: ArrayData, t: CentroidTable): InternalRow = {
    val k = t.cells.length
    if (k == 0) return null
    val n = v.numElements()
    // x·x once per point, left fold in index order
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return new GenericInternalRow(
        Array[Any](t.cells(0), null))
      val x = v.getFloat(i).toDouble
      xx += x * x
      i += 1
    }
    var bestCell = -1
    var bestD2 = 0.0
    var c = 0
    while (c < k) {
      val cv = t.vecs(c)
      val m = math.min(n, cv.length)
      var dp = 0.0
      var j = 0
      while (j < m) { dp += v.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      val raw = (xx - 2.0 * dp) + t.ccs(c)
      // greatest(0.0, raw) under Spark's double ordering (NaN greatest,
      // -0.0 < 0.0), then Spark's Round semantics (NaN/Inf pass through,
      // else BigDecimal HALF_UP at scale 6)
      val clamped = if (java.lang.Double.compare(raw, 0.0) >= 0) raw else 0.0
      val d2 =
        if (clamped.isNaN || clamped.isInfinite) clamped
        else java.math.BigDecimal.valueOf(clamped)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (bestCell == -1 || java.lang.Double.compare(d2, bestD2) < 0) {
        bestCell = t.cells(c); bestD2 = d2
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCell, bestD2))
  }
}

/** Nearest-centroid assignment compiled to ONE k×d loop per row — the
  * map-only replacement for the broadcast-cross-join + per-point-argmin
  * candidate stream (n·k materialized rows, and an argmin whose
  * struct-typed buffer forces a sort-based aggregate). Profiled at
  * 32k vectors × 500 cells × 128 dims: one assignment pass 23.8 s as a
  * candidate stream, sub-second compiled. Output:
  * struct(cell int, dist2 double); see [[NearestCell.assignF]] for the
  * exact-arithmetic and null contracts.
  */
case class NearestCellExpr(child: Expression, table: CentroidTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist2", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires an array<float> argument, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    NearestCell.assignF(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tbl = ctx.addReferenceObj("centTable", table,
        classOf[CentroidTable].getName)
      val r = ctx.freshName("r")
      s"""
         |InternalRow $r = graft.plans.NearestCell.assignF($v, $tbl);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

/** Two-level (hierarchical IVF) centroid table: the flat cells grouped
  * under a coarse quantizer of the CENTROIDS themselves. Per-row
  * assignment probes the `nProbe` nearest super-cells and scans only
  * their member centroids — ~(kSuper + nProbe·k/kSuper) dot products
  * instead of k, the sublinear-in-k assignment path for the extreme
  * kCells regime deriveKCells documents. Members are kept in ascending
  * cell order within each super-cell and the argmin uses the exact
  * (dist2, cell) lexicographic rule, so probing EVERY super-cell
  * reproduces the flat [[NearestCell.assignF]] bit for bit.
  */
final class HierCentroidTable(cellIds: Array[Int],
    centroids: Array[Array[Float]], superOfCell: Array[Int],
    superIds: Array[Int], superCentroids: Array[Array[Float]],
    val nProbe: Int) extends Serializable {
  require(cellIds.length == centroids.length &&
    cellIds.length == superOfCell.length, "ragged centroid arrays")
  require(superIds.length == superCentroids.length, "ragged super arrays")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  /** Flat table reused for the super level (sorted ids + cached c·c) —
    * EMPTY super-cells are dropped up front: the final
    * update-then-assign k-means step can leave a super-centroid no
    * member maps to, and probing it would scan nothing (with nProbe=1
    * the assignment would come back null instead of a real cell).
    * Every member belongs to some kept super, so nothing is lost.
    */
  val superTable = {
    val bySuper = cellIds.indices.groupBy(superOfCell)
    val kept = superIds.indices.filter(i => bySuper.contains(superIds(i)))
    new CentroidTable(kept.map(superIds).toArray,
      kept.map(superCentroids).toArray)
  }

  /** Member cells / vectors / c·c per SORTED (non-empty) super position. */
  val (memberCells, memberVecs, memberCcs) = {
    val bySuper = cellIds.indices.groupBy(superOfCell)
    val flat = new CentroidTable(cellIds, centroids)
    // map original index -> sorted-flat position to reuse flat.ccs
    val posOf = cellIds.indices.sortBy(cellIds).zipWithIndex
      .map { case (orig, pos) => orig -> pos }.toMap
    val perSuper = superTable.cells.map { sid =>
      bySuper.getOrElse(sid, Seq.empty).sortBy(cellIds)
    }
    (perSuper.map(_.map(cellIds).toArray),
      perSuper.map(_.map(centroids).toArray),
      perSuper.map(_.map(i => flat.ccs(posOf(i))).toArray))
  }

  /** First cell id in ascending order — the null-contract cell. */
  val firstCell: Int =
    if (cellIds.isEmpty) -1 else new CentroidTable(cellIds, centroids).cells(0)
}

object NearestCellHier {
  private def exactD2(raw: Double): Double = {
    val clamped = if (java.lang.Double.compare(raw, 0.0) >= 0) raw else 0.0
    if (clamped.isNaN || clamped.isInfinite) clamped
    else java.math.BigDecimal.valueOf(clamped)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Two-hop assignment: rank super-cells by the SAME rounded dist²
    * (super-id tie-break), scan the members of the nProbe best, argmin
    * by (dist2, cell). Null contract mirrors [[NearestCell.assignF]]:
    * a NULL element yields (first cell ascending, null dist²).
    */
  def assignH(v: ArrayData, t: HierCentroidTable): InternalRow = {
    val kSuper = t.superTable.cells.length
    if (kSuper == 0 || t.firstCell == -1) return null
    val n = v.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return new GenericInternalRow(
        Array[Any](t.firstCell, null))
      val x = v.getFloat(i).toDouble
      xx += x * x
      i += 1
    }
    // super distances, then select nProbe best by (d2, position) —
    // positions ascend in super-id order, so the tie-break is the id
    val sd = new Array[Double](kSuper)
    var s = 0
    while (s < kSuper) {
      val cv = t.superTable.vecs(s)
      val m = math.min(n, cv.length)
      var dp = 0.0
      var j = 0
      while (j < m) { dp += v.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      sd(s) = exactD2((xx - 2.0 * dp) + t.superTable.ccs(s))
      s += 1
    }
    val probes = math.min(t.nProbe, kSuper)
    val taken = new Array[Boolean](kSuper)
    var bestCell = -1
    var bestD2 = 0.0
    var p = 0
    while (p < probes) {
      var pick = -1
      var ps = 0
      while (ps < kSuper) {
        if (!taken(ps) &&
            (pick == -1 || java.lang.Double.compare(sd(ps), sd(pick)) < 0))
          pick = ps
        ps += 1
      }
      taken(pick) = true
      val cells = t.memberCells(pick)
      val vecs = t.memberVecs(pick)
      val ccs = t.memberCcs(pick)
      var c = 0
      while (c < cells.length) {
        val cv = vecs(c)
        val m = math.min(n, cv.length)
        var dp = 0.0
        var j = 0
        while (j < m) { dp += v.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val d2 = exactD2((xx - 2.0 * dp) + ccs(c))
        val cmp = java.lang.Double.compare(d2, bestD2)
        if (bestCell == -1 || cmp < 0 || (cmp == 0 && cells(c) < bestCell)) {
          bestCell = cells(c); bestD2 = d2
        }
        c += 1
      }
      p += 1
    }
    if (bestCell == -1) null
    else new GenericInternalRow(Array[Any](bestCell, bestD2))
  }
}

/** Two-level nearest-centroid assignment compiled to one
  * (kSuper + nProbe·members)×d loop per row — see [[HierCentroidTable]].
  */
case class NearestCellHierExpr(child: Expression, table: HierCentroidTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist2", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell_hier requires an array<float> argument, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    NearestCellHier.assignH(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tbl = ctx.addReferenceObj("hierTable", table,
        classOf[HierCentroidTable].getName)
      val r = ctx.freshName("r")
      s"""
         |InternalRow $r = graft.plans.NearestCellHier.assignH($v, $tbl);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellHierExpr =
    copy(child = newChild)
}

object VecExpressions {
  /** Compiled cosine similarity between two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Compiled double-precision dot product of two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Compiled random-hyperplane LSH bucket id of an embedding column. */
  def rpLshBucket(v: Column, nBits: Int): Column =
    GraftBridge.column(RpLshBucketExpr(GraftBridge.expression(v), nBits))

  /** Compiled nearest-centroid assignment of an array<float> column
    * against a fixed centroid set: struct(cell, dist2), smallest-cell
    * tie-break, the exact rounded-dist² arithmetic of the candidate
    * stream it replaces.
    */
  def nearestCell(vec: Column, cellIds: Array[Int],
      centroids: Array[Array[Float]]): Column =
    GraftBridge.column(NearestCellExpr(GraftBridge.expression(vec),
      new CentroidTable(cellIds, centroids)))

  /** Compiled TWO-LEVEL nearest-centroid assignment: probe the nProbe
    * best super-cells, scan only their member centroids — sublinear in
    * the total cell count (see [[HierCentroidTable]]).
    */
  def nearestCellHier(vec: Column, table: HierCentroidTable): Column =
    GraftBridge.column(NearestCellHierExpr(GraftBridge.expression(vec), table))
}
