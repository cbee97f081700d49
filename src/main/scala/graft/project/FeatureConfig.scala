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
        case DataLocation.Hdfs(path, fmt, opts) =>
          sn.put("type", "hdfs"); sn.put("location", path)
          fmt.foreach(sn.put("format", _))
          if (opts.nonEmpty) {
            val on = sn.putObject("options")
            opts.foreach { case (k, v) => on.put(k, v) }
          }
        case DataLocation.Jdbc(url, table, query, auth) =>
          sn.put("type", "jdbc"); sn.put("url", url)
          table.foreach(sn.put("dbtable", _))
          query.foreach(sn.put("query", _))
          auth match {
            case JdbcAuth.Anonymous => sn.put("auth", "anonymous")
            case JdbcAuth.UserPass(u, p2) =>
              sn.put("auth", "userpass")
              // secrets serialize as env REFERENCES, never values
              // (source.rs:513-521)
              sn.put("user", s"$${$u}"); sn.put("password", s"$${$p2}")
            case JdbcAuth.Token(t) =>
              sn.put("auth", "token"); sn.put("token", s"$${$t}")
          }
        case DataLocation.Kafka(brokers, topics, avroSchemaJson) =>
          sn.put("type", "kafka")
          // JSON arrays, not comma-joined strings: an empty list must
          // round-trip to Nil and a value may itself contain a comma
          val ba = sn.putArray("brokers"); brokers.foreach(ba.add)
          val ta = sn.putArray("topics"); topics.foreach(ta.add)
          if (avroSchemaJson.nonEmpty) sn.put("avro_schema", avroSchemaJson)
        case DataLocation.Generic(format, mode, opts, path) =>
          sn.put("type", "generic"); sn.put("format", format)
          path.foreach(sn.put("path", _))
          mode.foreach(sn.put("mode", _))
          if (opts.nonEmpty) {
            val on = sn.putObject("options")
            opts.foreach { case (k, v) => on.put(k, v) }
          }
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

  // ------------------------------------------------------------- import

  import com.fasterxml.jackson.databind.JsonNode
  import scala.jdk.CollectionConverters._

  private def fields(n: JsonNode): Seq[(String, JsonNode)] =
    if (n == null) Nil
    else n.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def parseType(n: JsonNode): FeatureType = FeatureType(
    if (optText(n, "tensorCategory").contains("SPARSE")) TensorCategory.SPARSE
    else TensorCategory.DENSE,
    Option(n.get("dimensionType")).map(_.elements.asScala.toSeq).getOrElse(Nil)
      .map(d => ValueType.parse(d.asText)),
    ValueType.parse(n.get("valType").asText))

  private def parseKeys(arr: JsonNode): Seq[TypedKey] =
    arr.elements.asScala.toSeq.map { k =>
      TypedKey(
        k.get("key_column").asText,
        ValueType.parse(k.get("key_column_type").asText),
        optText(k, "key_column_alias"),
        optText(k, "full_name"),
        optText(k, "description"))
    }

  private def parseTransform(n: JsonNode): Transformation =
    if (n.has("transform_expr")) Transformation.Expr(n.get("transform_expr").asText)
    else if (n.has("def_expr")) Transformation.WindowAgg(
      n.get("def_expr").asText,
      Aggregation.parse(n.get("agg_func").asText),
      Durations.parse(n.get("window").asText),
      optText(n, "group_by"),
      optText(n, "filter"),
      Option(n.get("limit")).filterNot(_.isNull).map(_.asInt))
    else if (n.has("name")) Transformation.Udf(n.get("name").asText)
    else throw new IllegalArgumentException(s"unparseable transformation: $n")

  /** `${NAME}` env reference → NAME (inverse of the export form). */
  private def envRef(v: String): String =
    if (v.startsWith("${") && v.endsWith("}")) v.substring(2, v.length - 1) else v

  private def parseOptions(sn: JsonNode): Map[String, String] =
    fields(sn.get("options")).map { case (k, v) => k -> v.asText }.toMap

  private def parseSource(name: String, sn: JsonNode): Source = {
    val loc = sn.get("type").asText match {
      case "hdfs" =>
        DataLocation.Hdfs(sn.get("location").asText, optText(sn, "format"),
          parseOptions(sn))
      case "jdbc" =>
        val auth = optText(sn, "auth").getOrElse("anonymous") match {
          case "userpass" => JdbcAuth.UserPass(
            envRef(sn.get("user").asText), envRef(sn.get("password").asText))
          case "token" => JdbcAuth.Token(envRef(sn.get("token").asText))
          case _ => JdbcAuth.Anonymous
        }
        DataLocation.Jdbc(sn.get("url").asText, optText(sn, "dbtable"),
          optText(sn, "query"), auth)
      case "kafka" =>
        // current form is a JSON array; pre-round-4 configs serialized
        // a comma-joined string — accept both, dropping empty tokens
        def strList(field: String): Seq[String] = Option(sn.get(field)) match {
          case Some(n) if n.isArray => n.elements.asScala.toSeq.map(_.asText)
          case Some(n) => n.asText.split(",").toSeq.filter(_.nonEmpty)
          case None => Nil
        }
        DataLocation.Kafka(strList("brokers"), strList("topics"),
          optText(sn, "avro_schema").getOrElse(""))
      case "generic" =>
        DataLocation.Generic(sn.get("format").asText, optText(sn, "mode"),
          parseOptions(sn), optText(sn, "path"))
      case "table" => DataLocation.Table(sn.get("table").asText)
      case other =>
        throw new IllegalArgumentException(s"unknown source type: $other")
    }
    val tw = optText(sn, "event_timestamp_column").map { c =>
      TimeWindowParameters(c, optText(sn, "timestamp_format").getOrElse("native"))
    }
    Source(name, loc, tw)
  }

  /** Parse a reference-emitted feature-config document (the inverse of
    * [[toJson]]; document shape project.rs:374-437) back into a live
    * [[FeatureProject]]. Preprocessing hooks are code, not config, so a
    * loaded source has none — attach one via `addSource` if needed.
    */
  def fromJson(json: String): FeatureProject = {
    val root = mapper.readTree(json)
    val p = FeatureProject(optText(root, "name").getOrElse("imported"))

    val srcByName = fields(root.get("sources")).map { case (n, sn) =>
      n -> p.addSource(parseSource(n, sn))
    }.toMap

    fields(root.get("anchors")).foreach { case (gName, a) =>
      val srcName = a.get("source").asText
      val source =
        if (srcName == Source.INPUT_CONTEXT.name) Source.INPUT_CONTEXT
        else srcByName.getOrElse(srcName,
          throw new NoSuchElementException(s"anchor $gName: unknown source $srcName"))
      val feats = fields(a.get("features")).map { case (fName, fn) =>
        AnchorFeature(fName, parseType(fn.get("type")),
          parseTransform(fn.get("transformation")), parseKeys(fn.get("key")))
      }
      p.addAnchorGroup(gName, source, feats)
    }

    // derivations may reference each other — insert in dependency order
    var pending = fields(root.get("derivations")).map { case (dName, dn) =>
      val keys = parseKeys(dn.get("key"))
      val inputs = fields(dn.get("inputs")).map { case (_, in) =>
        val fname = in.get("feature").asText
        val aliases = in.get("key").elements.asScala.toSeq.map(_.asText)
        (fname, aliases)
      }
      (dName, parseType(dn.get("type")), dn.get("definition").asText, inputs, keys)
    }
    while (pending.nonEmpty) {
      val (ready, rest) = pending.partition { case (_, _, _, inputs, _) =>
        inputs.forall { case (f, _) => p.featureExists(f) } }
      require(ready.nonEmpty,
        s"unresolvable derivation inputs: ${pending.map(_._1).mkString(", ")}")
      ready.foreach { case (dName, tpe, defn, inputs, keys) =>
        val ins = inputs.map { case (fname, aliases) =>
          // rebind the base feature's typed keys under the serialized
          // aliases (the export writes aliases only)
          val baseKeys = p.anchorFeature(fname).map(_._2.keys)
            .orElse(p.derivedFeature(fname).map(_.keys))
            .getOrElse(aliases.map(a => TypedKey(a, ValueType.UNSPECIFIED)))
          val bound =
            if (baseKeys.size == aliases.size)
              baseKeys.zip(aliases).map { case (k, a) => k.as(a) }
            else aliases.map(a => TypedKey(a, ValueType.UNSPECIFIED, Some(a)))
          InputFeature(fname, bound)
        }
        p.addDerived(DerivedFeature(dName, tpe, defn, ins, keys))
      }
      pending = rest
    }
    p
  }
}
