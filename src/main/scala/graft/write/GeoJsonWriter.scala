package graft.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** GeoJSON sink: geometry column → FeatureCollection
  * (NewGeojsonReaderChnl, datastream.go:2488-2638 — geometry column becomes
  * `geometry`, every other column lands in `properties`).
  *
  * One FeatureCollection document per partition file (each part is valid
  * GeoJSON on its own, like parquet part files) — a single global document
  * would serialize the whole dataset through one writer, which doesn't
  * scale. Properties are marshaled columnar with `to_json(struct(...))`;
  * only the WKB decode is scalar.
  */
object GeoJsonWriter {

  /** Render each row as a GeoJSON Feature string (no I/O — reusable). */
  def features(df: DataFrame, geometryCol: String = "geometry"): DataFrame = {
    val props = df.columns.filterNot(_ == geometryCol)
    df.select(concat(
      lit("""{"type":"Feature","geometry":"""),
      coalesce(Geo.geomToGeoJson(col(geometryCol)), lit("null")),
      lit(""","properties":"""),
      to_json(struct(props.map(col).toSeq: _*)),
      lit("}")).as("feature"))
  }

  /** Read FeatureCollection documents back: one row per Feature, properties
    * flattened to columns, the geometry kept as a GeoJSON string column.
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val exploded = raw.select(explode(col("features")).as("f"))
    exploded.select(
      to_json(col("f.geometry")).as("geometry_geojson") +:
        exploded.select(col("f.properties.*")).columns.toSeq
          .map(c => col(s"f.properties.$c").as(c)): _*)
  }

  def write(df: DataFrame, path: String, geometryCol: String = "geometry"): Unit =
    features(df, geometryCol).rdd.map(_.getString(0))
      .mapPartitions { it =>
        // stream header + comma-joined features + footer without buffering
        val body = new Iterator[String] {
          private var first = true
          override def hasNext: Boolean = it.hasNext
          override def next(): String = {
            val f = it.next()
            if (first) { first = false; f } else "," + f
          }
        }
        Iterator("""{"type":"FeatureCollection","features":[""") ++ body ++
          Iterator("]}")
      }
      .saveAsTextFile(path)
}
