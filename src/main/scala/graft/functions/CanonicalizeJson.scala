package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Full-fidelity JSON canonicalization (reference P3,
  * jsonstreamer.go:58-62): Go's `json.Marshal` of a decoded
  * `interface{}` sorts object keys at EVERY nesting level and renders
  * every number as float64. The flat-schema path
  * (Transforms.canonicalJson) covers known shapes; this expression
  * handles arbitrary nesting/heterogeneous arrays — the truly
  * schemaless payloads of SURVEY §1.3.
  *
  * Malformed input → null (E1-compatible; compose with FAILFAST
  * parsing upstream for E2). Jackson is already on the Spark
  * classpath. CodegenFallback: the work is Jackson parse/serialize,
  * which generated code could not inline anyway.
  */
case class CanonicalizeJson(child: Expression,
    entries: Seq[(String, String)] = Nil) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val mapper = new ObjectMapper()

  private def canonical(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode =>
      val sorted = mapper.createObjectNode()
      obj.properties().asScala.toSeq.sortBy(_.getKey).foreach { e =>
        sorted.set[JsonNode](e.getKey, canonical(e.getValue))
      }
      sorted
    case arr: ArrayNode =>
      val out = mapper.createArrayNode()
      arr.elements().asScala.foreach(e => out.add(canonical(e)))
      out
    case n if n.isNumber =>
      // Go decodes every JSON number as float64 (SURVEY §1.2)
      mapper.getNodeFactory.numberNode(n.asDouble())
    case other => other
  }

  override def nullSafeEval(v: Any): Any = {
    try {
      val parsed = mapper.readTree(v.asInstanceOf[UTF8String].toString)
      // --add-entry enrichment before the canonical marshal, overwrite
      // on collision (jsonstreamer.go:49-56); entries only apply to
      // top-level objects — a scalar/array value passes through
      val enriched = parsed match {
        case obj: ObjectNode if entries.nonEmpty =>
          entries.foreach { case (k, value) => obj.put(k, value) }
          obj
        case other => other
      }
      UTF8String.fromString(mapper.writeValueAsString(canonical(enriched)))
    } catch {
      case _: Exception => null // malformed payload → null (E1)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CanonicalizeJson = copy(newChild)
}

object CanonicalizeJson {
  def canonicalize_json(c: Column): Column =
    GraftShim.toColumn(CanonicalizeJson(GraftShim.toExpression(c)))

  /** Canonicalize with --add-entry constants merged into top-level
    * objects (overwrite on collision) before the key-sorted marshal.
    */
  def canonicalize_json(c: Column, entries: Seq[(String, String)]): Column =
    GraftShim.toColumn(
      CanonicalizeJson(GraftShim.toExpression(c), entries))
}
