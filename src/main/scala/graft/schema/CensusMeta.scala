package graft.schema

import org.apache.spark.sql.types._

/** Per-column census metadata, mirroring the reference's schema dicts
  * (ref: `pandasreporter/censusreporter.py:193-253`; identical synthetic
  * schema at `test/test_basic.py:31-70`).
  *
  * Carried in Spark as `StructField.metadata` so it survives inside the
  * plan; helpers here are the single codec. NOTE: Spark drops metadata on a
  * bare `.alias(name)` — always re-attach with `as(name, metadata)` (see
  * [[CensusMeta.aliasWithMeta]]).
  *
  * @param name     raw column name from the API (`censusreporter.py:223`)
  * @param code     census variable code, e.g. `B17001007`; margins get
  *                 `<code>_m90` (`censusreporter.py:238,247`)
  * @param title    flattened hierarchical title (`censusreporter.py:237`)
  * @param indent   hierarchy depth from the API (`censusreporter.py:224`)
  * @param index    last-3-digit census line number, e.g. "042"
  *                 (`censusreporter.py:226`); empty for geoid/name
  * @param position ordinal position in the frame (`censusreporter.py:242,251`)
  */
final case class ColMeta(
    name: String,
    code: String,
    title: String,
    indent: Int,
    index: String,
    position: Int) {
  def codeTitle: String = if (title.nonEmpty) s"$code $title" else code
  def isM90: Boolean = code.endsWith("_m90")
  /** Code of the estimate this margin column belongs to. */
  def valueCode: String = if (isM90) code.stripSuffix("_m90") else code
  def m90Code: String = if (isM90) code else code + "_m90"
}

object CensusMeta {
  private val Keys = Seq("name", "code", "title", "indent", "index", "position")

  def toMetadata(m: ColMeta): Metadata =
    new MetadataBuilder()
      .putString("name", m.name)
      .putString("code", m.code)
      .putString("title", m.title)
      .putString("code_title", m.codeTitle)
      .putLong("indent", m.indent.toLong)
      .putString("index", m.index)
      .putLong("position", m.position.toLong)
      .build()

  def fromField(f: StructField): Option[ColMeta] = {
    val md = f.metadata
    if (Keys.forall(k => md.contains(k) || k == "code_title"))
      Some(ColMeta(
        name = md.getString("name"),
        code = md.getString("code"),
        title = md.getString("title"),
        indent = md.getLong("indent").toInt,
        index = md.getString("index"),
        position = md.getLong("position").toInt))
    else None
  }

  /** StructField for a census column: doubles for data, strings for
    * geoid/name lead columns.
    */
  def field(m: ColMeta, dataType: DataType = DoubleType): StructField =
    StructField(m.code, dataType, nullable = true, metadata = toMetadata(m))

  /** Schema for the standard census layout: `geoid`, `name`, then
    * interleaved (code, code_m90) double columns.
    */
  def schema(cols: Seq[ColMeta]): StructType =
    StructType(cols.zipWithIndex.map { case (m, i) =>
      val dt: DataType = if (i < 2 && (m.code == "geoid" || m.code == "name")) StringType else DoubleType
      field(m, dt)
    })
}
