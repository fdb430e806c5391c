package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pillar P1 — OSM extraction operators (update-routes.js re-expressed
  * Spark-first). Input DataFrames mirror the Overpass JSON payloads so the
  * operators run offline from recorded fixtures (SURVEY §7.1 step 6):
  *
  *   relations(relation_id, members: array<struct<mtype,ref,role>>, tags)
  *   ways(way_id, name, geometry: array<struct<lon,lat>>)
  *   nodes(node_id, lon, lat, tags: map<string,string>)
  *
  * Scale posture: member explosion keeps ordinals; geometry joins broadcast
  * the (bounded, per-relation) way/node sets via plain equi-joins that AQE
  * turns into broadcast joins; the order-sensitive folds (stitching, stop
  * synthesis) run per relation via groupByKey.flatMapGroups — data-parallel
  * across relations, which is the natural unit of this workload.
  */
object Extract {

  /** J1: relation members of type 'way', joined to way geometries in member
    * order (update-routes.js:80-103). Ways with no geometry are dropped
    * (reference warns and filters).
    */
  def orderedWays(relations: DataFrame, ways: DataFrame): DataFrame =
    relations
      .select(col("relation_id"), posexplode(col("members")).as(Seq("member_idx", "m")))
      .filter(col("m.mtype") === "way")
      .select(col("relation_id"), col("member_idx"),
        col("m.ref").as("way_id"), col("m.role").as("role"))
      .join(ways, Seq("way_id"))

  /** J2/F6: relation members of type 'node' with a stop role, joined to
    * node coordinates/tags in member order (update-routes.js:159-185).
    */
  def orderedStops(relations: DataFrame, nodes: DataFrame): DataFrame =
    relations
      .select(col("relation_id"), posexplode(col("members")).as(Seq("member_idx", "m")))
      .filter(col("m.mtype") === "node" &&
        col("m.role").isin("stop", "stop_entry_only", "stop_exit_only"))
      .select(col("relation_id"), col("member_idx"),
        col("m.ref").as("node_id"), col("m.role").as("role"))
      .join(nodes, Seq("node_id"))

  /** W8: stitch each relation's member-ordered ways into one continuous
    * linestring → (relation_id, coords: array<struct<lon,lat>>).
    */
  def stitchedLines(ordered: DataFrame): DataFrame = {
    val spark = ordered.sparkSession
    import spark.implicits._
    ordered
      .select(col("relation_id").cast("long"), col("member_idx").cast("int"),
        // tuple-encoder field names (_1, _2) so the typed view lines up
        transform(col("geometry"), c =>
          struct(c.getField("lon").as("_1"), c.getField("lat").as("_2"))).as("g"))
      .as[(Long, Int, Seq[(Double, Double)])]
      .groupByKey(_._1)
      .mapGroups { (rel, it) =>
        val ways = it.toArray.sortBy(_._2).map(_._3.toIndexedSeq)
        (rel, GeoKernels.stitchWays(ways.toSeq).map(c => (c._1, c._2)))
      }
      .toDF("relation_id", "coords")
  }

  /** Full angkot stop pipeline (W10/J8/J9/W6/W7, update-routes.js:249-376)
    * for every relation at once: real stops + way-name map + stitched line
    * in, final swept stop sequence out (stop_seq is the post-sweep order).
    */
  def angkotStops(relations: DataFrame, ways: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = relations.sparkSession
    import spark.implicits._

    val lines = stitchedLines(orderedWays(relations, ways))

    // J8 coordToName: first-wins per exact coordinate in member-way order.
    val nameW = Window.partitionBy(col("relation_id"), col("lon"), col("lat"))
      .orderBy(col("member_idx"), col("coord_idx"))
    val coordNames = orderedWays(relations, ways)
      .select(col("relation_id"), col("member_idx"),
        coalesce(col("name"), lit("Jalan terdekat")).as("way_name"),
        posexplode(col("geometry")).as(Seq("coord_idx", "pt")))
      .select(col("relation_id"), col("member_idx"), col("coord_idx"),
        col("way_name"), col("pt.lon").as("lon"), col("pt.lat").as("lat"))
      .withColumn("rn", row_number().over(nameW))
      .filter(col("rn") === 1)
      .groupBy(col("relation_id"))
      .agg(collect_list(struct(col("lon"), col("lat"), col("way_name"))).as("names"))

    val realStops = orderedStops(relations, nodes)
      .select(col("relation_id"), col("member_idx"),
        col("node_id").cast("string").as("id"),
        coalesce(element_at(col("tags"), "name"), lit("Unknown")).as("name"),
        col("role"), col("lon"), col("lat"))
      .groupBy(col("relation_id"))
      .agg(sort_array(collect_list(struct(
        col("member_idx").as("_1"), col("id").as("_2"), col("name").as("_3"),
        col("role").as("_4"), col("lon").as("_5"), col("lat").as("_6"))))
        .as("stops"))

    lines
      .join(realStops, Seq("relation_id"), "left")
      .join(coordNames
          .withColumn("names", transform(col("names"), n =>
            struct(n.getField("lon").as("_1"), n.getField("lat").as("_2"),
              n.getField("way_name").as("_3")))),
        Seq("relation_id"), "left")
      .as[(Long, Seq[(Double, Double)],
           Option[Seq[(Int, String, String, String, Double, Double)]],
           Option[Seq[(Double, Double, String)]])]
      .flatMap { case (rel, coords, stopsOpt, namesOpt) =>
        val line = coords.toIndexedSeq
        val real = stopsOpt.getOrElse(Seq.empty).map { case (_, id, name, role, lon, lat) =>
          GeoKernels.Stop(id, name, role, lon, lat, isReal = true)
        }
        val names = namesOpt.getOrElse(Seq.empty)
          .map { case (lon, lat, n) => (lon, lat) -> n }.toMap
        GeoKernels.synthesizeStops(line, real, names).zipWithIndex.map {
          case (s, i) => (rel, i, s.id, s.name, s.role, s.lon, s.lat, s.isReal)
        }
      }
      .toDF("relation_id", "stop_seq", "stop_id", "stop_name", "role",
        "lon", "lat", "is_real")
  }

  /** K2 (train/bus flavor): stops.geojson for non-angkot modes with the
    * node's OSM tags spread into the feature properties
    * (update-routes.js:441-459): `{id, name, role, ...tags}` where a tag
    * key overrides the base key (JS spread-last semantics — `name` always
    * collides with `tags.name` when present, harmlessly, since the base
    * value IS that tag). Properties render as a JSON object of strings
    * (OSM tags are strings); features keep member order.
    */
  def taggedStopsGeojson(relations: DataFrame, nodes: DataFrame): DataFrame = {
    val tagsMap = coalesce(col("tags"), expr("map()").cast("map<string,string>"))
    val baseMap = map(
      lit("id"), col("node_id").cast("string"),
      lit("name"), coalesce(element_at(col("tags"), "name"), lit("Unknown")),
      lit("role"), col("role"))
    // spread-last merge without map_concat's duplicate-key exception:
    // keep a base entry only when no tag shadows it
    val props = map_concat(
      map_filter(baseMap, (k, _) => !array_contains(map_keys(tagsMap), k)),
      tagsMap)
    orderedStops(relations, nodes)
      .select(col("relation_id"), col("member_idx"),
        struct(
          lit("Feature").as("type"),
          struct(lit("Point").as("type"),
            array(col("lon"), col("lat")).as("coordinates")).as("geometry"),
          props.as("properties")).as("f"))
      .groupBy(col("relation_id"))
      .agg(collect_list(struct(col("member_idx").as("i"), col("f").as("f")))
        .as("fs"))
      .select(col("relation_id"),
        to_json(struct(
          lit("FeatureCollection").as("type"),
          transform(
            // comparator sort: structs holding maps aren't orderable, so
            // sort_array can't be used — compare the ordinal field instead
            array_sort(col("fs"), (a, b) => a.getField("i") - b.getField("i")),
            x => x.getField("f")).as("features"))).as("stops_geojson"))
  }

  /** First member way id per relation (update-routes.js:406 `ways[0]?.id`
    * — the ways.geojson feature's `id` property).
    */
  def firstWayIds(ordered: DataFrame): DataFrame =
    ordered.groupBy(col("relation_id"))
      .agg(min_by(col("way_id"), col("member_idx")).as("first_way_id"))

  /** K2: assemble per-relation GeoJSON FeatureCollections (ways + stops) as
    * JSON strings — one row per relation, writable with a text sink
    * (update-routes.js:398-417, 463-466). The ways feature carries the
    * reference's `{id, relationId}` properties (:405-408); `id` is omitted
    * when unknown, matching JSON.stringify dropping `undefined`.
    */
  def geojsonDocs(lines: DataFrame, stops: DataFrame,
                  firstWays: Option[DataFrame] = None): DataFrame = {
    val features = stops
      .groupBy(col("relation_id"))
      .agg(collect_list(struct(col("stop_seq"), col("stop_id"), col("stop_name"),
        col("role"), col("lon"), col("lat"), col("is_real"))).as("st"))
      .select(col("relation_id"), sort_array(col("st")).as("st"))
    val withWayId = firstWays.fold(
      lines.withColumn("first_way_id", lit(null).cast("long")))(fw =>
      lines.join(fw, Seq("relation_id"), "left"))
    withWayId.join(features, Seq("relation_id"), "left")
      .select(col("relation_id"),
        to_json(struct(
          lit("FeatureCollection").as("type"),
          array(struct(
            lit("Feature").as("type"),
            struct(lit("LineString").as("type"),
              transform(col("coords"), c =>
                array(c.getField("_1"), c.getField("_2"))).as("coordinates"))
              .as("geometry"),
            struct(col("first_way_id").as("id"),
              col("relation_id").cast("string").as("relationId"))
              .as("properties"))).as("features"))).as("ways_geojson"),
        to_json(struct(
          lit("FeatureCollection").as("type"),
          transform(col("st"), s => struct(
            lit("Feature").as("type"),
            struct(lit("Point").as("type"),
              array(s.getField("lon"), s.getField("lat")).as("coordinates"))
              .as("geometry"),
            struct(s.getField("stop_id").as("id"),
              s.getField("stop_name").as("name"),
              s.getField("role").as("role"),
              s.getField("is_real").as("isReal"),
              lit("bus").as("mode")).as("properties"))).as("features")))
          .as("stops_geojson"))
  }
}
