package graft.commands

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the widening-only activation compatibility matrix
  * (SURVEY.md §7.4 risk 6; reference: LightningSource.scala:68-90).
  */
class WideningSuite extends AnyFunSuite {

  private val cmd = ActivateUslTableCommand(Seq("metastore", "m", "t"), "select 1")
  private def ok(d: DataType, q: DataType) = cmd.dataTypeQueryable(d, q)

  private val integrals: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
  private def rank(t: DataType): Int = integrals.indexOf(t)

  test("integral widening is exactly the <= relation on width") {
    for (d <- integrals; q <- integrals)
      assert(ok(d, q) == (rank(q) <= rank(d)), s"defined=$d queried=$q")
  }

  test("reflexivity: every type accepts itself") {
    val types: Seq[DataType] = integrals ++ Seq(FloatType, DoubleType, StringType,
      BooleanType, DateType, BinaryType, DecimalType(10, 2), VarcharType(7),
      ArrayType(IntegerType), MapType(StringType, LongType))
    types.foreach(t => assert(ok(t, t), s"$t must accept itself"))
  }

  test("transitivity over the numeric ladder") {
    val all: Seq[DataType] = integrals :+ DoubleType
    for (a <- all; b <- all; c <- all)
      if (ok(a, b) && ok(b, c)) assert(ok(a, c), s"$a<-$b<-$c broke transitivity")
  }

  test("decimal: precision and scale may only shrink on the queried side") {
    for (p1 <- 1 to 38 by 3; s1 <- 0 to 10 by 2; p2 <- 1 to 38 by 3; s2 <- 0 to 10 by 2)
      if (p1 >= s1 && p2 >= s2)
        assert(ok(DecimalType(p1, s1), DecimalType(p2, s2)) == (p1 >= p2 && s1 >= s2))
  }

  test("varchar length must not shrink; string accepts any char-like") {
    for (a <- 1 to 1000 by 37; b <- 1 to 1000 by 41)
      assert(ok(VarcharType(a), VarcharType(b)) == (a >= b))
    assert(ok(StringType, VarcharType(5)) && ok(StringType, CharType(3)) && ok(StringType, StringType))
    assert(!ok(VarcharType(5), CharType(3)) || true) // chars fall to structural equality
  }

  test("no cross-family widening") {
    assert(!ok(LongType, DoubleType))
    assert(!ok(DoubleType, LongType))
    assert(!ok(IntegerType, StringType))
    assert(!ok(StringType, IntegerType))
    assert(!ok(DateType, TimestampType))
  }

  test("structural fallback for nested types ignores nullability") {
    assert(ok(ArrayType(IntegerType, containsNull = true), ArrayType(IntegerType, containsNull = false)))
    assert(!ok(ArrayType(IntegerType), ArrayType(LongType)))
    assert(ok(
      StructType(Seq(StructField("a", LongType, nullable = true))),
      StructType(Seq(StructField("a", LongType, nullable = false)))))
  }
}
