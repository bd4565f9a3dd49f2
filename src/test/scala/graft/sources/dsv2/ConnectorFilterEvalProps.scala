package graft.sources.dsv2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** The pushed-filter contract as a ScalaCheck property (VERDICT r9 #6):
  * for random JSON values × field types × pushed filters, the rows the
  * source-side [[ConnectorFilterEval]] keeps must be a SUPERSET of the
  * rows the Catalyst residual filter keeps — dropping at the source a
  * row the residual would keep changes results; the converse only wastes
  * cycles.
  *
  * The residual side is mirrored here from first principles: the row
  * value is whatever [[JsonRowConverter.convertScalar]] materializes
  * (the exact value Catalyst sees), null fails every comparison
  * (three-valued logic), strings compare as UTF8String bytes, doubles
  * with -0.0 == 0.0. Generated inputs deliberately include the seams:
  * textual numerics, fractional values against integral fields,
  * overflow-sized number strings, empty strings, non-ASCII and
  * supplementary-plane text, null and absent fields.
  */
object ConnectorFilterEvalProps extends Properties("ConnectorFilterEval.superset") {

  private val mapper = new ObjectMapper()

  private sealed trait JVal
  private case class JLong(v: Long) extends JVal
  private case class JDouble(v: Double) extends JVal
  private case class JText(v: String) extends JVal
  private case class JBool(v: Boolean) extends JVal
  private case object JNull extends JVal
  private case object JAbsent extends JVal

  private val genText: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("", "5", "2.5", "-0.0", "00042", "9223372036854775808",
      "1e3", "nan", "x", "café", "𐀀", "�"))

  private val genJVal: Gen[JVal] = Gen.frequency(
    4 -> Gen.choose(-1000L, 1000L).map(JLong),
    2 -> Gen.oneOf(Gen.choose(-10.0, 10.0).map(JDouble),
      Gen.oneOf(JDouble(-0.0), JDouble(0.0), JDouble(2.5))),
    4 -> genText.map(JText),
    1 -> Gen.oneOf(JBool(true), JBool(false)),
    1 -> Gen.const(JNull),
    1 -> Gen.const(JAbsent))

  private val genType: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, FloatType, StringType, BooleanType,
    DecimalType(10, 2))

  /** A literal of the type Catalyst would push for this field type. */
  private def genLit(dt: DataType): Gen[Any] = dt match {
    case LongType    => Gen.choose(-1000L, 1000L)
    case IntegerType => Gen.choose(-1000, 1000).map(Int.box)
    case DoubleType  => Gen.oneOf(Gen.choose(-10.0, 10.0), Gen.oneOf(0.0, -0.0, 2.5)).map(Double.box)
    case FloatType   => Gen.choose(-10.0f, 10.0f).map(Float.box)
    case StringType  => genText
    case BooleanType => Gen.oneOf(true, false).map(Boolean.box)
    case _: DecimalType =>
      Gen.choose(-100000L, 100000L).map(v => new java.math.BigDecimal(v).movePointLeft(2))
  }

  private val genOp: Gen[(String, Any) => Filter] = Gen.oneOf(
    Seq[(String, Any) => Filter](
      (a, v) => EqualTo(a, v),
      (a, v) => GreaterThan(a, v),
      (a, v) => GreaterThanOrEqual(a, v),
      (a, v) => LessThan(a, v),
      (a, v) => LessThanOrEqual(a, v),
      (a, _) => IsNotNull(a)))

  private def jsonNode(v: JVal): com.fasterxml.jackson.databind.JsonNode = {
    val obj = mapper.createObjectNode()
    v match {
      case JLong(x)   => obj.put("f", x)
      case JDouble(x) => obj.put("f", x)
      case JText(x)   => obj.put("f", x)
      case JBool(x)   => obj.put("f", x)
      case JNull      => obj.putNull("f")
      case JAbsent    => ()
    }
    obj
  }

  private def norm(d: Double): Double = if (d == 0.0d) 0.0d else d
  private def normF(f: Float): Float = if (f == 0.0f) 0.0f else f

  /** Catalyst-semantics comparison of the MATERIALIZED row value against
    * the pushed literal; None = null (comparison yields null → filter
    * drops).
    */
  private def residualCmp(rowVal: Any, lit: Any): Option[Int] = (rowVal, lit) match {
    case (null, _) => None
    case (u: UTF8String, s: String) => Some(u.compareTo(UTF8String.fromString(s)))
    case (b: java.lang.Boolean, l: java.lang.Boolean) =>
      Some(java.lang.Boolean.compare(b, l))
    case (d: java.lang.Double, l: java.lang.Double) =>
      Some(java.lang.Double.compare(norm(d), norm(l)))
    case (f: java.lang.Float, l: java.lang.Float) =>
      Some(java.lang.Float.compare(normF(f), normF(l)))
    case (dec: org.apache.spark.sql.types.Decimal, l: java.math.BigDecimal) =>
      Some(dec.toJavaBigDecimal.compareTo(l))
    case (i: java.lang.Long, l: java.lang.Long) => Some(java.lang.Long.compare(i, l))
    case (i: java.lang.Integer, l: java.lang.Integer) =>
      Some(java.lang.Integer.compare(i, l))
    case other => sys.error(s"unexpected residual pairing: $other")
  }

  private def residualKeeps(f: Filter, rowVal: Any): Boolean = f match {
    case IsNotNull(_) => rowVal != null
    case EqualTo(_, v)            => residualCmp(rowVal, v).exists(_ == 0)
    case GreaterThan(_, v)        => residualCmp(rowVal, v).exists(_ > 0)
    case GreaterThanOrEqual(_, v) => residualCmp(rowVal, v).exists(_ >= 0)
    case LessThan(_, v)           => residualCmp(rowVal, v).exists(_ < 0)
    case LessThanOrEqual(_, v)    => residualCmp(rowVal, v).exists(_ <= 0)
    case other                    => sys.error(s"unexpected filter: $other")
  }

  private val genCase: Gen[(DataType, JVal, Filter)] = for {
    dt  <- genType
    v   <- genJVal
    lit <- genLit(dt)
    op  <- genOp
  } yield (dt, v, op("f", lit))

  property("source-kept ⊇ residual-kept for every generated (type, value, filter)") =
    Prop.forAll(genCase) { case (dt, v, filter) =>
      val schema = StructType(Seq(StructField("f", dt)))
      val node = jsonNode(v)
      val sourceKeeps = ConnectorFilterEval.eval(schema)(filter, node)
      // The residual sees the materialized row value. A conversion that
      // THROWS fails the whole scan task (no row reaches the residual),
      // so such cases constrain nothing here.
      val materialized =
        try Some(JsonRowConverter.convertScalar(node.get("f"), dt))
        catch { case _: Exception => None }
      materialized match {
        case None => Prop.passed
        case Some(rowVal) =>
          val keep = residualKeeps(filter, rowVal)
          (!keep || sourceKeeps) :|
            s"residual keeps but source drops: dt=$dt value=$v filter=$filter rowVal=$rowVal"
      }
    }

  property("filters claimed unsupported are never evaluated to a drop") =
    Prop.forAll(genType, genJVal) { case (dt, v) =>
      val schema = StructType(Seq(StructField("f", dt)))
      // shapes `supported` rejects must keep everything if they ever
      // reached eval (defense in depth — the driver never sends them)
      val node = jsonNode(v)
      ConnectorFilterEval.eval(schema)(In("f", Array(1L, 2L)), node) &&
      ConnectorFilterEval.eval(schema)(
        StringStartsWith("f", "x"), node)
    }
}
