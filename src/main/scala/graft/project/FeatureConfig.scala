package graft.project

import graft.model._
import graft.sources._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Serializes a [[FeatureProject]] to the engine feature-config JSON the
  * reference client emits — exactly three sections `anchors`,
  * `derivations`, `sources` (feathr-rs/src/project.rs:374-437): each
  * anchor carries `key.sqlExpr` (the shared key aliases of its first
  * feature, project.rs:396-401), its source name, and its feature map;
  * INPUT_CONTEXT is omitted from `sources` (project.rs:428-433).
  */
object FeatureConfig {
  private val mapper = new ObjectMapper()

  private def typeNode(t: FeatureType): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "TENSOR")
    n.put("tensorCategory", t.tensorCategory match {
      case TensorCategory.DENSE => "DENSE"
      case TensorCategory.SPARSE => "SPARSE"
    })
    val dims = n.putArray("dimensionType")
    t.dimensionType.foreach(d => dims.add(d.name))
    n.put("valType", t.valType.name)
    n
  }

  private def keyArray(keys: Seq[TypedKey]): ArrayNode = {
    val arr = mapper.createArrayNode()
    keys.foreach { k =>
      val n = arr.addObject()
      n.put("key_column", k.keyColumn)
      n.put("key_column_type", k.keyColumnType.name)
      k.keyColumnAlias.foreach(n.put("key_column_alias", _))
      k.fullName.foreach(n.put("full_name", _))
      k.description.foreach(n.put("description", _))
    }
    arr
  }

  private def transformNode(t: Transformation): ObjectNode = {
    val n = mapper.createObjectNode()
    t match {
      case Transformation.Expr(e) => n.put("transform_expr", e)
      case Transformation.Udf(name) => n.put("name", name)
      case Transformation.WindowAgg(defExpr, agg, w, groupBy, filter, limit) =>
        n.put("def_expr", defExpr)
        n.put("agg_func", agg.toString)
        n.put("window", Durations.format(w))
        groupBy.foreach(n.put("group_by", _))
        filter.foreach(n.put("filter", _))
        limit.foreach(n.put("limit", _))
    }
    n
  }

  def toJson(p: FeatureProject): String = {
    val root = mapper.createObjectNode()

    val anchors = root.putObject("anchors")
    p.groups.foreach { g =>
      val a = anchors.putObject(g.name)
      val key = a.putObject("key")
      val sqlExpr = key.putArray("sqlExpr")
      g.keyAliases.foreach(sqlExpr.add)
      a.put("source", g.source.name)
      val feats = a.putObject("features")
      g.features.foreach { f =>
        val fn = feats.putObject(f.name)
        fn.set[com.fasterxml.jackson.databind.JsonNode]("type", typeNode(f.featureType))
        fn.set[com.fasterxml.jackson.databind.JsonNode]("transformation", transformNode(f.transform))
        fn.set[com.fasterxml.jackson.databind.JsonNode]("key", keyArray(f.keys))
      }
    }

    val derivations = root.putObject("derivations")
    p.derivedFeatures.foreach { d =>
      val dn = derivations.putObject(d.name)
      dn.set[com.fasterxml.jackson.databind.JsonNode]("type", typeNode(d.featureType))
      dn.put("definition", d.transformExpr)
      val inputs = dn.putObject("inputs")
      d.inputs.foreach { in =>
        val i = inputs.putObject(in.featureName)
        i.put("feature", in.featureName)
        val ka = i.putArray("key")
        in.keys.map(_.alias).foreach(ka.add)
      }
      dn.set[com.fasterxml.jackson.databind.JsonNode]("key", keyArray(d.keys))
    }

    val sources = root.putObject("sources")
    p.allSources.filterNot(_.isInputContext).foreach { s =>
      val sn = sources.putObject(s.name)
      s.location match {
        case DataLocation.Hdfs(path, _, _) =>
          sn.put("type", "hdfs"); sn.put("location", path)
        case DataLocation.Jdbc(url, table, query, _) =>
          sn.put("type", "jdbc"); sn.put("url", url)
          table.foreach(sn.put("dbtable", _))
          query.foreach(sn.put("query", _))
        case DataLocation.Kafka(brokers, topics, _) =>
          sn.put("type", "kafka")
          sn.put("brokers", brokers.mkString(","))
          sn.put("topics", topics.mkString(","))
        case DataLocation.Generic(format, mode, _, path) =>
          sn.put("type", "generic"); sn.put("format", format)
          path.foreach(sn.put("path", _))
          mode.foreach(sn.put("mode", _))
        case DataLocation.Table(t) =>
          sn.put("type", "table"); sn.put("table", t)
        case DataLocation.InputContext => // filtered above
      }
      s.timeWindow.foreach { tw =>
        sn.put("event_timestamp_column", tw.timestampColumn)
        sn.put("timestamp_format", tw.timestampColumnFormat)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
