package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Standard geohash cell id as a native codegen'd expression.
  *
  * Geohash interleaves longitude and latitude bits MSB-first (longitude
  * takes the even positions) over successively halved intervals; the
  * halving recursion is equivalent to the closed form
  * `lon_id = floor((lon+180)/360 · 2^lonBits)` (resp. latitude) followed
  * by a bit interleave, which is what this kernel computes — integer bit
  * math plus two IEEE multiply/divides, NO transcendentals, so the
  * DuckDB oracle replays it bit-exactly from the same textual arithmetic
  * (see OracleSpatial.geohashCellSql, the generated mirror).
  *
  * `chars` is the geohash precision in base-32 characters (5 bits each);
  * the cell id is the raw `5·chars`-bit integer. The base-32 rendering
  * is deliberately NOT baked in: both engines derive it from the cell id
  * with the same substr arithmetic, keeping the native surface minimal.
  */
case class GeohashCell(lat: Expression, lon: Expression, chars: Int)
    extends BinaryExpression {
  require(chars >= 1 && chars <= 12, "geohash precision must be 1..12 chars")
  override def left: Expression = lat
  override def right: Expression = lon
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Geohash.cell(a.asInstanceOf[Double], b.asInstanceOf[Double], chars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.spatial.Geohash.cell($a, $b, $chars)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeohashCell =
    copy(lat = newLeft, lon = newRight)
}

object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** The 5·chars-bit geohash cell id (lon bits on even MSB-first
    * positions — the standard layout).
    */
  def cell(lat: Double, lon: Double, chars: Int): Long = {
    val bits = chars * 5
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    // Clamp the closed upper boundary (lat = 90, lon = 180): the raw id
    // would be 2^bits and its high bit would shift into the WRONG
    // interleave slot. Standard geohash puts the boundary in the last
    // cell. The kernel is SQL-registered (graft_geohash) so arbitrary
    // caller input must be safe, not just band-confined internal calls.
    val lonId = math.min((1L << lonBits) - 1,
      math.floor((lon + 180.0) / 360.0 * (1L << lonBits)).toLong)
    val latId = math.min((1L << latBits) - 1,
      math.floor((lat + 90.0) / 180.0 * (1L << latBits)).toLong)
    var out = 0L
    var li = lonBits - 1
    var ai = latBits - 1
    var p = bits - 1
    while (p >= 0) {
      if ((bits - 1 - p) % 2 == 0) { out |= ((lonId >> li) & 1L) << p; li -= 1 }
      else { out |= ((latId >> ai) & 1L) << p; ai -= 1 }
      p -= 1
    }
    out
  }

  /** Reference base-32 rendering of a cell id (test + driver use). */
  def base32(cell: Long, chars: Int): String =
    (0 until chars).map { j =>
      Alphabet.charAt(((cell >> (5 * (chars - 1 - j))) & 31L).toInt)
    }.mkString

  def cellNative(lat: Column, lon: Column, chars: Int): Column =
    ColumnBridge.column(GeohashCell(
      ColumnBridge.expression(lat), ColumnBridge.expression(lon), chars))

  /** Base-32 rendering as a column, via the SAME substr arithmetic the
    * oracle uses (`substr(alphabet, (cell >> 5j) % 32 + 1, 1)` per
    * char) — SQL-expressible on both engines, so the string column
    * needs no second native kernel.
    */
  def base32Col(cellCol: String, chars: Int): Column = {
    import org.apache.spark.sql.functions.expr
    val parts = (0 until chars).map { j =>
      val sh = 5 * (chars - 1 - j)
      s"substr('$Alphabet', cast((($cellCol >> $sh) % 32) + 1 as int), 1)"
    }
    expr(parts.mkString("concat(", ", ", ")"))
  }
}
