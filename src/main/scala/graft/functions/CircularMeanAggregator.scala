package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed circular-mean aggregator (the reusable `Aggregator[IN, BUF, OUT]`
  * form of [[GeoFunctions.circularMeanDeg]], SURVEY §2.9): accumulates the
  * weighted sin/cos vector and finishes with `degrees(atan2)` normalized to
  * [0,360). Use with `Dataset[DirW]` via `.toColumn`; the expression-combo
  * version stays the choice for untyped DataFrames (codegen-friendly).
  */
object CircularMeanAggregator {

  final case class DirW(dir: Double, weight: Double)
  final case class SinCos(s: Double, c: Double)

  val agg: Aggregator[DirW, SinCos, Double] = new Aggregator[DirW, SinCos, Double] {
    override def zero: SinCos = SinCos(0.0, 0.0)

    override def reduce(b: SinCos, a: DirW): SinCos = {
      val r = math.toRadians(a.dir)
      SinCos(b.s + math.sin(r) * a.weight, b.c + math.cos(r) * a.weight)
    }

    override def merge(x: SinCos, y: SinCos): SinCos = SinCos(x.s + y.s, x.c + y.c)

    override def finish(b: SinCos): Double = {
      val d = math.toDegrees(math.atan2(b.s, b.c))
      if (d < 0) d + 360 else if (d >= 360) d - 360 else d
    }

    override def bufferEncoder: Encoder[SinCos] = Encoders.product[SinCos]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
